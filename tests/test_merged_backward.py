"""Merged edge+BN+sigma backward (ops/pallas/edge_kernels.fused_edge_sigma):
the sigma backward runs as a prologue of the edge backward kernel, with the
BN two-phase barrier (dscale/dshift) computed outside. Must equal the
unmerged composition (CARTNET_MERGED=0) in values, grads, and BN stats."""

import os

import numpy as np
import pytest

import jax

import cartnet_tpu.models.cartnet as cm
import cartnet_tpu.ops.pallas.edge_kernels as ek
from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
from cartnet_tpu.data.batching import bandwidth_reorder, collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.train.loop import build_optimizer, init_train_state, make_steps


def _setup():
    recs = [bandwidth_reorder(r) for r in
            synthetic_dataset(4, mean_atoms=60, radius=5.0, adp=True, seed=3)]
    n = -(-sum(len(r["z"]) for r in recs) // 128) * 128
    e = sum(-(-len(r["edge_src"]) // 512) * 512 for r in recs) + 512
    batch = collate(recs, n, e, 4, edge_align=512)
    assert batch.edge_fuse_ok and batch.pallas_seg_ok
    cfg = Config(
        model=ModelConfig(dim_in=128, dim_rbf=16, num_layers=2,
                          cholesky=True),
        data=DataConfig(max_nodes=n, max_edges=e, max_graphs=4),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1))
    return cfg, batch


def _micro(cfg, batch):
    opt = build_optimizer(cfg, 4)
    state = init_train_state(jax.random.key(0), cfg, cm.cartnet_init, opt)
    micro, _, _ = make_steps(cfg, cm.cartnet_apply, opt)
    return micro(state, batch)


def test_merged_backward_matches_plain(monkeypatch):
    cfg, batch = _setup()
    monkeypatch.setattr(cm, "_FORCE_SIGMA_INTERPRET", True)
    monkeypatch.setenv("CARTNET_MERGED", "1")

    calls = {"merged": 0}
    orig = ek._merged_bwd_call

    def spy(*a, **k):
        calls["merged"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(ek, "_merged_bwd_call", spy)
    state_m, stats_m = _micro(cfg, batch)
    assert calls["merged"] == cfg.model.num_layers, \
        "merged kernel must actually trace"

    monkeypatch.delenv("CARTNET_MERGED")
    state_p, stats_p = _micro(cfg, batch)

    np.testing.assert_allclose(float(stats_m["loss"]), float(stats_p["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_m.grad_accum),
                    jax.tree.leaves(state_p.grad_accum)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=3e-5)
    for a, b in zip(jax.tree.leaves(state_m.bn_state),
                    jax.tree.leaves(state_p.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_merged_env_cotangent_matches_plain(monkeypatch):
    """denv through the merged path must equal the unmerged composition —
    the model never differentiates env today, but force training would
    (advisor round 4: the merged bwd used to return zeros here)."""
    import jax.numpy as jnp
    from cartnet_tpu.data.synthetic import synthetic_dataset

    D = 128
    recs = [bandwidth_reorder(r) for r in
            synthetic_dataset(3, mean_atoms=60, radius=5.0, seed=5)]
    n = -(-sum(len(r["z"]) for r in recs) // 128) * 128
    e = sum(-(-len(r["edge_src"]) // 512) * 512 for r in recs)
    batch = collate(recs, n, e, 3, edge_align=512)
    assert batch.edge_fuse_ok
    key = jax.random.key(1)
    ks = jax.random.split(key, 12)
    mk = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.3
    E = int(batch.edge_dst.shape[0])
    env2d = jax.nn.sigmoid(mk(ks[9], E, 1))
    raw = (mk(ks[0], n, 2 * D), mk(ks[1], n, 2 * D), mk(ks[2], E, D),
           mk(ks[3], D, 2 * D), mk(ks[4], 2 * D), mk(ks[5], D, D),
           mk(ks[6], D), mk(ks[7], D, D), mk(ks[8], D),
           jnp.ones(D), jnp.zeros(D))

    def loss(env):
        e_out, aggr, _, _, _ = ek.fused_edge_sigma(
            *raw, env, batch.edge_dst, batch.edge_src, batch.edge_mask,
            batch.edge_dst_lo, batch.edge_src_lo, batch.edge_src_nblk,
            batch.src_band, ek.C_DST, 1e-5, (), True)
        em = batch.edge_mask[:, None]
        return (jnp.sum(jnp.where(em, e_out, 0.0) ** 2)
                + jnp.sum(aggr[: int(batch.num_nodes)] ** 2))

    monkeypatch.setenv("CARTNET_MERGED", "1")
    g_merged = jax.grad(loss)(env2d)
    monkeypatch.setenv("CARTNET_MERGED", "0")
    g_plain = jax.grad(loss)(env2d)
    assert float(jnp.abs(g_plain).max()) > 0
    np.testing.assert_allclose(np.asarray(g_merged), np.asarray(g_plain),
                               rtol=1e-3, atol=1e-5)
