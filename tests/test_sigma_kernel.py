"""Fused sigma-chain + segment-sum kernel (interpret mode): forward and
custom-VJP must match the unfused BN-normalize/sigmoid/envelope/mult/segsum
composition, including the train-mode BN gradient coupling through stats."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.ops.pallas.segment_kernels import T_EDGES, sigma_segsum

D, N = 128, 512


@pytest.fixture(scope="module")
def setup():
    recs = synthetic_dataset(3, mean_atoms=60, radius=5.0, adp=False, seed=5)
    e_real = sum(len(r["edge_src"]) for r in recs)
    E = -(-e_real // T_EDGES) * T_EDGES
    batch = collate(recs, N, E, 3)
    key = jax.random.key(1)
    ks = jax.random.split(key, 6)
    mk = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.5
    return (batch, dict(gate=mk(ks[0], E, D), sender=mk(ks[1], E, D),
                        scale=1.0 + 0.1 * mk(ks[2], D), shift=mk(ks[3], D),
                        env=jax.nn.sigmoid(mk(ks[4], E, 1)),
                        e_in=mk(ks[5], E, D)))


def _ids_lo(batch):
    m = jnp.asarray(batch.edge_mask)
    ids_eff = jnp.where(m, jnp.asarray(batch.edge_dst), N).astype(jnp.int32)
    lo = ((ids_eff[::T_EDGES] // 8) * 8).astype(jnp.int32)
    return ids_eff, lo


def _ref(a, batch):
    sig = jax.nn.sigmoid(a["gate"] * a["scale"] + a["shift"]) * a["env"]
    m = jnp.asarray(batch.edge_mask).astype(jnp.float32)[:, None]
    aggr = jax.ops.segment_sum(sig * a["sender"] * m,
                               jnp.asarray(batch.edge_dst),
                               num_segments=N, indices_are_sorted=True)
    return a["e_in"] + sig, aggr


def test_sigma_forward_matches(setup):
    batch, a = setup
    ids_eff, lo = _ids_lo(batch)
    eout_k, aggr_k = sigma_segsum(a["gate"], a["scale"], a["shift"], a["env"],
                                  a["sender"], a["e_in"], ids_eff, lo, N,
                                  256, True)
    eout_r, aggr_r = _ref(a, batch)
    m = np.asarray(batch.edge_mask)
    np.testing.assert_allclose(np.asarray(eout_k)[m], np.asarray(eout_r)[m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aggr_k), np.asarray(aggr_r),
                               rtol=1e-4, atol=1e-5)


def test_sigma_vjp_matches(setup):
    batch, a = setup
    ids_eff, lo = _ids_lo(batch)
    E = a["gate"].shape[0]
    key = jax.random.key(9)
    mask = jnp.asarray(batch.edge_mask)
    c_sig = jax.random.normal(key, (E, D)) * mask[:, None]
    c_agg = jax.random.normal(jax.random.split(key)[0], (N, D))
    names = ["gate", "scale", "shift", "env", "sender", "e_in"]

    def loss_k(*vals):
        aa = dict(zip(names, vals))
        s, g = sigma_segsum(aa["gate"], aa["scale"], aa["shift"], aa["env"],
                            aa["sender"], aa["e_in"], ids_eff, lo, N,
                            256, True)
        return jnp.sum(s * c_sig) + jnp.sum(g * c_agg)

    def loss_r(*vals):
        aa = dict(zip(names, vals))
        s, g = _ref(aa, batch)
        return jnp.sum(s * c_sig) + jnp.sum(g * c_agg)

    vals = [a[k] for k in names]
    gk = jax.grad(loss_k, argnums=tuple(range(6)))(*vals)
    gr = jax.grad(loss_r, argnums=tuple(range(6)))(*vals)
    m = np.asarray(batch.edge_mask)
    for name, k_, r_ in zip(names, gk, gr):
        kk, rr = np.asarray(k_), np.asarray(r_)
        if kk.ndim == 2 and kk.shape[0] == E and name != "e_in":
            kk, rr = kk[m], rr[m]  # pad-row cotangents may differ (masked)
        np.testing.assert_allclose(kk, rr, rtol=2e-4, atol=2e-4,
                                   err_msg=name)


def test_model_sigma_fused_matches_unfused():
    """Full CartNet loss + grads with the fused sigma path (interpret)."""
    from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
    from cartnet_tpu.models import cartnet as M
    from cartnet_tpu.train.loop import loss_fn
    recs = synthetic_dataset(3, mean_atoms=60, radius=5.0, adp=True, seed=21)
    e_real = sum(len(r["edge_src"]) for r in recs)
    E = -(-e_real // T_EDGES) * T_EDGES
    batch = collate(recs, N, E, 3)
    assert batch.pallas_seg_ok
    cfg = Config(model=ModelConfig(dim_in=D, dim_rbf=16, num_layers=2,
                                   cholesky=True),
                 data=DataConfig(max_nodes=N, max_edges=E, max_graphs=3),
                 optim=OptimConfig(lr=1e-3))
    params, bn = M.cartnet_init(jax.random.key(6), cfg.model)

    def loss_of(p, b):
        return loss_fn(p, bn, b, M.cartnet_apply, cfg, True)[0]

    M._FORCE_SIGMA_INTERPRET = True
    try:
        lf, gf = jax.value_and_grad(loss_of)(params, batch)
    finally:
        M._FORCE_SIGMA_INTERPRET = False
    lu, gu = jax.value_and_grad(loss_of)(params, batch)
    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-5)
    for (kp, x), (_, y) in zip(jax.tree_util.tree_leaves_with_path(gf),
                               jax.tree_util.tree_leaves_with_path(gu)):
        # atol covers f32 reduction-order noise on O(1e3)-magnitude grads
        # (windowed vs segment_sum accumulation; block-decomposed src dots)
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=5e-4,
                                   atol=2e-4, err_msg=str(kp))

    # BN running stats advance identically under the fused path
    M._FORCE_SIGMA_INTERPRET = True
    try:
        _, (_, _, bn_f, _, _) = loss_fn(params, bn, batch, M.cartnet_apply,
                                        cfg, True)
    finally:
        M._FORCE_SIGMA_INTERPRET = False
    _, (_, _, bn_u, _, _) = loss_fn(params, bn, batch, M.cartnet_apply,
                                    cfg, True)
    for x, y in zip(jax.tree.leaves(bn_f), jax.tree.leaves(bn_u)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5,
                                   atol=1e-7)
