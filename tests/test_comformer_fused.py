"""ComformerConv fused path (edge-phase window kernel + sigma_segsum,
interpret mode) must match the unfused _split3/BN/sigmoid/segsum composition
in both values and gradients — the same guarantee the CartNet layer has
(test_edge_kernel / test_sigma_kernel), extended to the conv that reuses
those kernels (VERDICT r3 next #7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartnet_tpu.config import ModelConfig
from cartnet_tpu.data.batching import bandwidth_reorder, collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models import cartnet as cartnet_mod
from cartnet_tpu.models.comformer import conv_apply, conv_init
from cartnet_tpu.ops.pallas.edge_kernels import T_EDGES

D = 128


@pytest.fixture(scope="module")
def setup():
    # large enough for the kernel gates: nodes >= C_DST (128), dim % 128 == 0
    recs = [bandwidth_reorder(r) for r in
            synthetic_dataset(4, mean_atoms=60, radius=5.0, adp=False, seed=3)]
    n = sum(len(r["z"]) for r in recs)
    e = sum(-(-len(r["edge_src"]) // T_EDGES) * T_EDGES for r in recs)
    batch = collate(recs, -(-n // 128) * 128, e + T_EDGES, 4,
                    edge_align=T_EDGES)
    assert batch.edge_fuse_ok and batch.pallas_seg_ok, \
        "fixture must exercise the fused path"
    cfg = ModelConfig(dim_in=D, dim_rbf=16, num_layers=1)
    params, state = conv_init(jax.random.key(0), D, jnp.float32)
    key = jax.random.key(1)
    x = jax.random.normal(jax.random.split(key)[0],
                          (batch.num_nodes, D), jnp.float32) * 0.5
    e_attr = jax.random.normal(jax.random.split(key)[1],
                               (batch.num_edges, D), jnp.float32) * 0.5
    return batch, cfg, params, state, x, e_attr


def _run(batch, cfg, params, state, x, e_attr, fused: bool):
    b = batch if fused else batch.replace(edge_fuse_ok=False,
                                          pallas_seg_ok=False)
    old = cartnet_mod._FORCE_SIGMA_INTERPRET
    cartnet_mod._FORCE_SIGMA_INTERPRET = fused
    try:
        def f(params, x, e_attr):
            out, new_s = conv_apply(params, state, x, e_attr, b, cfg,
                                    training=True)
            mask = jnp.asarray(b.node_mask)[:, None]
            return jnp.sum(jnp.where(mask, out, 0.0) ** 2), (out, new_s)

        (loss, (out, new_s)), grads = jax.value_and_grad(f, has_aux=True)(
            params, x, e_attr)
    finally:
        cartnet_mod._FORCE_SIGMA_INTERPRET = old
    return loss, out, new_s, grads


def test_conv_fused_matches_unfused(setup):
    batch, cfg, params, state, x, e_attr = setup
    loss_f, out_f, st_f, g_f = _run(batch, cfg, params, state, x, e_attr, True)
    loss_u, out_u, st_u, g_u = _run(batch, cfg, params, state, x, e_attr, False)

    m = np.asarray(batch.node_mask)
    np.testing.assert_allclose(np.asarray(out_f)[m], np.asarray(out_u)[m],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(loss_f), float(loss_u), rtol=2e-4)
    # BN running stats must agree (fused path reuses masked moments)
    for a, b in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_f),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g_u),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4,
                                   err_msg=f"grad mismatch at {ka}")
