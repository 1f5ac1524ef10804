"""Halo overlap x fused-kernel coexistence (VERDICT r3 next #6).

to_halo reorders each member's windows interior-first and the layer runs the
fused edge kernel as TWO calls — interior windows against a zeros-recv table
(overlappable with the boundary all_to_all) and boundary windows after the
exchange. This must reproduce the single-device step exactly: loss, grads,
and BN stats, on a genuinely split crystal (nonzero halo, interior_nt > 0),
at a width where the fused plans are valid (dim 128).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
from cartnet_tpu.data.batching import bandwidth_reorder, collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
from cartnet_tpu.parallel.halo import to_halo
from cartnet_tpu.parallel.mesh import make_mesh
from cartnet_tpu.parallel.step import make_parallel_steps, stack_for_shards
from cartnet_tpu.train.loop import build_optimizer, init_train_state, make_steps

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4 virtual devices")

DP, EP = 2, 2
N, E = 384, 16384


def _cfg():
    return Config(
        model=ModelConfig(dim_in=128, dim_rbf=16, num_layers=2,
                          cholesky=True),
        data=DataConfig(max_nodes=N, max_edges=E, max_graphs=2),
        optim=OptimConfig(lr=1e-3, max_epoch=2, batch_accumulation=1))


def test_halo_fused_split_matches_single_device():
    cfg = _cfg()
    recs = [bandwidth_reorder(r) for r in
            synthetic_dataset(DP, mean_atoms=300, radius=5.0, adp=True,
                              seed=2)]
    slices = [collate([recs[i]], N, E, 2, edge_align=512) for i in range(DP)]
    halos = [to_halo(s, EP, h_max=192) for s in slices]
    for h in halos:
        assert h.edge_fuse_ok and not h.halo_empty, \
            "fixture must exercise the fused halo path with a real halo"
    stacked = stack_for_shards(halos, ep=EP)
    assert stacked.halo_interior_nt > 0, \
        "fixture must exercise the interior/boundary split"
    merged = collate(recs, DP * N, DP * E, DP * 2, edge_align=512)

    mesh = make_mesh(DP, EP)
    opt = build_optimizer(cfg, 4)
    state_p = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    state_s = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)

    pmicro, _, _ = make_parallel_steps(cfg, cartnet_apply, opt, mesh,
                                       halo=True)
    smicro, _, _ = make_steps(cfg, cartnet_apply, opt)

    state_p, stats_p = pmicro(state_p, stacked)
    state_s, stats_s = smicro(state_s, merged)

    np.testing.assert_allclose(float(stats_p["loss"]), float(stats_s["loss"]),
                               rtol=1e-4)
    for gp, gs in zip(jax.tree.leaves(state_p.grad_accum),
                      jax.tree.leaves(state_s.grad_accum)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   rtol=1e-2, atol=2e-5)
    for bp, bs in zip(jax.tree.leaves(state_p.bn_state),
                      jax.tree.leaves(state_s.bn_state)):
        np.testing.assert_allclose(np.asarray(bp), np.asarray(bs),
                                   rtol=1e-4, atol=1e-6)
