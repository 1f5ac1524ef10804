"""Pallas kernels inside the SHARDED step (VERDICT r2 #1).

Round 2 stripped the kernel plans in every dp/ep/halo path and fell back to
plain XLA gathers/scatters. These tests pin the round-3 wiring: collate's
window plans ride through stack_for_shards/to_halo, the static flags stay on,
and the sharded fused step is grad-equal to the single-device fused step on
the 8-virtual-CPU mesh.

On the CPU mesh the sharded kernels dispatch to their jnp twins
(ops/pallas/reference.py — Pallas interpret mode cannot type-check under
shard_map vma), while the single-device side runs the REAL kernels in
interpret mode; agreement therefore pins kernel-vs-twin math AND the
sharding/vma plumbing in one shot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cartnet_tpu.models.cartnet as cartnet_mod
from cartnet_tpu.config import (Config, DataConfig, ModelConfig, OptimConfig,
                                ParallelConfig)
from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
from cartnet_tpu.parallel.halo import to_halo
from cartnet_tpu.parallel.mesh import make_mesh
from cartnet_tpu.parallel.step import make_parallel_steps, stack_for_shards
from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                    make_steps)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

D = 128  # kernels require dim % 128 == 0


@pytest.fixture(autouse=True)
def _force_sigma():
    cartnet_mod._FORCE_SIGMA_INTERPRET = True
    yield
    cartnet_mod._FORCE_SIGMA_INTERPRET = False


def _cfg(dp, ep, halo, cholesky=False, max_nodes=256, max_edges=6144):
    return Config(
        model=ModelConfig(dim_in=D, dim_rbf=16, num_layers=2,
                          cholesky=cholesky),
        data=DataConfig(max_nodes=max_nodes, max_edges=max_edges,
                        max_graphs=4),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1),
        parallel=ParallelConfig(dp=dp, ep=ep, halo=halo))


def _grads_close(sp, ss, rtol=2e-2, atol=3e-4):
    for gp, gs in zip(jax.tree.leaves(sp.grad_accum),
                      jax.tree.leaves(ss.grad_accum)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   rtol=rtol, atol=atol)
    for bp, bs in zip(jax.tree.leaves(sp.bn_state),
                      jax.tree.leaves(ss.bn_state)):
        np.testing.assert_allclose(np.asarray(bp), np.asarray(bs),
                                   rtol=1e-3, atol=1e-5)


def test_dp_ep_step_runs_fused_kernels():
    """Non-halo (dp=2, ep=2): plans survive stacking, flags stay on, and the
    sharded fused step matches the single-device fused step."""
    dp, ep = 2, 2
    cfg = _cfg(dp, ep, halo=False)
    recs = synthetic_dataset(dp * 4, mean_atoms=40, adp=False, seed=11)
    slices = [collate(recs[i * 4:(i + 1) * 4], 256, 6144, 4)
              for i in range(dp)]
    assert all(s.edge_fuse_ok and s.pallas_seg_ok for s in slices), \
        "fixture must produce kernel-eligible batches"
    stacked = stack_for_shards(slices, ep=ep)
    assert stacked.edge_fuse_ok and stacked.pallas_seg_ok
    assert stacked.edge_dst_lo.shape[0] == dp * 6144 // 512
    merged = collate(recs, dp * 256, dp * 6144, dp * 4)
    assert merged.edge_fuse_ok and merged.pallas_seg_ok

    mesh = make_mesh(dp, ep)
    opt = build_optimizer(cfg, 4)
    sp = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    ss = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    pmicro, _, _ = make_parallel_steps(cfg, cartnet_apply, opt, mesh)
    smicro, _, _ = make_steps(cfg, cartnet_apply, opt)

    sp, stats_p = pmicro(sp, stacked)
    ss, stats_s = smicro(ss, merged)
    np.testing.assert_allclose(float(stats_p["loss"]),
                               float(stats_s["loss"]), rtol=1e-3)
    _grads_close(sp, ss)


def test_halo_step_runs_fused_kernels():
    """Halo (dp=2, ep=2): to_halo emits per-member plans, flags stay on, and
    the halo fused step matches the single-device fused step."""
    dp, ep = 2, 2
    cfg = _cfg(dp, ep, halo=True)
    recs = synthetic_dataset(dp * 4, mean_atoms=40, adp=False, seed=13)
    slices = [collate(recs[i * 4:(i + 1) * 4], 256, 6144, 4)
              for i in range(dp)]
    halos = [to_halo(s, ep) for s in slices]
    assert all(h.pallas_seg_ok for h in halos), "member dst windows must plan"
    assert all(h.edge_fuse_ok for h in halos), "member src bands must plan"
    stacked = stack_for_shards(halos, ep=ep)
    assert stacked.edge_fuse_ok and stacked.pallas_seg_ok
    merged = collate(recs, dp * 256, dp * 6144, dp * 4)

    mesh = make_mesh(dp, ep)
    opt = build_optimizer(cfg, 4)
    sp = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    ss = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    pmicro, _, _ = make_parallel_steps(cfg, cartnet_apply, opt, mesh,
                                       halo=True)
    smicro, _, _ = make_steps(cfg, cartnet_apply, opt)

    sp, stats_p = pmicro(sp, stacked)
    ss, stats_s = smicro(ss, merged)
    np.testing.assert_allclose(float(stats_p["loss"]),
                               float(stats_s["loss"]), rtol=1e-3)
    _grads_close(sp, ss)


def test_kernel_vs_jnp_twin_single_device():
    """Directly pin the Pallas kernels (interpret mode, empty vma) against
    their jnp twins on identical inputs — the transitivity link the sharded
    tests rely on."""
    from cartnet_tpu.ops.pallas import edge_kernels as ek
    from cartnet_tpu.ops.pallas import reference as ref
    from cartnet_tpu.ops.pallas.segment_kernels import (
        T_EDGES, _sigma_fwd_call)

    rng = np.random.RandomState(3)
    E, d, N = 2 * T_EDGES, 128, 256
    gate = jnp.asarray(rng.randn(E, d), jnp.float32)
    scale = jnp.asarray(rng.rand(d) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(d) * 0.1, jnp.float32)
    env = jnp.asarray(rng.rand(E, 1), jnp.float32)
    sender = jnp.asarray(rng.randn(E, d), jnp.float32)
    e_in = jnp.asarray(rng.randn(E, d), jnp.float32)
    ids = jnp.asarray(np.sort(rng.randint(0, N, E)).astype(np.int32))
    lo = ((ids[::T_EDGES] // 8) * 8).astype(jnp.int32)

    eo_k, ag_k = _sigma_fwd_call(gate, scale, shift, env, sender, e_in,
                                 ids, lo, N, 256, interpret=True)
    eo_r, ag_r = ref.sigma_fwd_ref(gate, scale, shift, env, sender, e_in,
                                   ids, N)
    np.testing.assert_allclose(np.asarray(eo_k), np.asarray(eo_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ag_k), np.asarray(ag_r),
                               rtol=1e-4, atol=1e-5)

    # edge phase: table must hold a full C_SRC band (n >= 384)
    n = 512
    xi = jnp.asarray(rng.randn(n, 2 * d), jnp.float32)
    xj = jnp.asarray(rng.randn(n, 2 * d), jnp.float32)
    e = jnp.asarray(rng.randn(E, d), jnp.float32)
    we = jnp.asarray(rng.randn(d, 2 * d) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(2 * d) * 0.05, jnp.float32)
    w1g = jnp.asarray(rng.randn(d, d) * 0.05, jnp.float32)
    b1g = jnp.asarray(rng.randn(d) * 0.05, jnp.float32)
    w1a = jnp.asarray(rng.randn(d, d) * 0.05, jnp.float32)
    b1a = jnp.asarray(rng.randn(d) * 0.05, jnp.float32)
    # dst spans must stay under C_DST per 512-edge window; src is free (the
    # C_SRC=384 band clamps to cover all 256 rows)
    dst = jnp.asarray(np.sort(rng.randint(0, 100, E)).astype(np.int32))
    src = jnp.asarray(np.sort(rng.randint(0, 300, E)).astype(np.int32))
    mask = np.ones(E, bool)
    ok, dlo, slo, nblk = ek.edge_windows_ok(np.asarray(dst),
                                            np.asarray(src), mask, n)
    assert ok
    emask = jnp.asarray(mask)
    g_k, s_k, _, s1_k, m2_k = ek.edge_phase_fwd(
        xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask,
        jnp.asarray(dlo), jnp.asarray(slo), jnp.asarray(nblk),
        interpret=True)
    g_r, s_r, _, s1_r, m2_r = ref.edge_phase_fwd_ref(
        xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1_k), np.asarray(s1_r),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m2_k), np.asarray(m2_r),
                               rtol=1e-4, atol=1e-3)
