"""Chunked single-device execution (parallel/chunk.py) — VERDICT r2 #3.

The window kernels anti-scale with batch node count (VMEM-resident node
tables); chunked execution re-lays the batch into K member-major chunks
(to_halo with graph-snapped cuts) and vmaps the member-local forward with
axis_name="chunk". These tests pin: the chunked step's loss/grads/BN equal
the flat single-device step, for scalar AND ADP targets, with the kernels
active on the chunked side.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cartnet_tpu.models.cartnet as cartnet_mod
from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
from cartnet_tpu.parallel.chunk import make_chunked_steps, to_chunked
from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                    make_steps)

D = 128
K = 2


def _cfg(cholesky, max_nodes, max_edges):
    return Config(
        model=ModelConfig(dim_in=D, dim_rbf=16, num_layers=2,
                          cholesky=cholesky),
        data=DataConfig(max_nodes=max_nodes, max_edges=max_edges,
                        max_graphs=8),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1))


@pytest.mark.parametrize("cholesky", [False, True])
def test_chunked_step_matches_flat(cholesky):
    cartnet_mod._FORCE_SIGMA_INTERPRET = True
    try:
        recs = synthetic_dataset(8, mean_atoms=40, adp=cholesky, seed=31)
        N, E = 512, 8192
        cfg = _cfg(cholesky, N, E)
        flat = collate(recs, N, E, 8)
        chunked = to_chunked(flat, K)
        assert chunked.halo_empty, "graph-snapped chunks must be zero-halo"
        assert chunked.pallas_seg_ok and chunked.edge_fuse_ok
        assert chunked.z.shape == (K, N // K)
        chunked = jax.tree.map(jnp.asarray, chunked)

        opt = build_optimizer(cfg, 4)
        sc = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
        sf = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
        cmicro, cupdate, cevals = make_chunked_steps(cfg, cartnet_apply, opt)
        fmicro, fupdate, fevals = make_steps(cfg, cartnet_apply, opt)

        sc, stats_c = cmicro(sc, chunked)
        sf, stats_f = fmicro(sf, flat)
        np.testing.assert_allclose(float(stats_c["loss"]),
                                   float(stats_f["loss"]), rtol=1e-4)
        for gc, gf in zip(jax.tree.leaves(sc.grad_accum),
                          jax.tree.leaves(sf.grad_accum)):
            np.testing.assert_allclose(np.asarray(gc), np.asarray(gf),
                                       rtol=2e-2, atol=3e-4)
        for bc, bf in zip(jax.tree.leaves(sc.bn_state),
                          jax.tree.leaves(sf.bn_state)):
            np.testing.assert_allclose(np.asarray(bc), np.asarray(bf),
                                       rtol=1e-3, atol=1e-5)

        # eval: same masked predictions (member-major reorder for ADP)
        pred_c, mask_c, _ = cevals(sc.params, sc.bn_state, chunked)
        pred_f, mask_f, estats_f = fevals(sf.params, sf.bn_state, flat)
        if cholesky:
            pc = np.asarray(pred_c)[np.asarray(mask_c)]
            pf = np.asarray(pred_f)[np.asarray(mask_f)]
            # chunk re-layout preserves node order within the batch
            np.testing.assert_allclose(pc, pf, rtol=2e-3, atol=2e-4)
        else:
            np.testing.assert_allclose(
                np.asarray(pred_c)[np.asarray(mask_c)],
                np.asarray(pred_f)[np.asarray(mask_f)],
                rtol=2e-3, atol=2e-4)
    finally:
        cartnet_mod._FORCE_SIGMA_INTERPRET = False


def test_chunked_split_graph_uses_halo_exchange():
    """A graph that cannot snap to chunk boundaries produces a non-empty
    halo; the vmapped all_to_all path must still match the flat step."""
    cartnet_mod._FORCE_SIGMA_INTERPRET = True
    try:
        from tests.test_halo import _chain_graph
        # ONE long chain crystal: the cut cannot snap to a graph boundary,
        # so the chunk layout genuinely exchanges boundary rows
        recs = [_chain_graph(False, n=100)]
        N, E = 128, 1024
        cfg = _cfg(False, N, E)
        flat = collate(recs, N, E, 8)
        chunked = to_chunked(flat, K, h_max=16)
        assert not chunked.halo_empty
        # this test pins the vmapped all_to_all exchange; compare both sides
        # on the XLA path (the chunked side's kernel gates fail at n_per=64
        # anyway, and kernel-vs-XLA matmul noise would drown the comparison)
        flat = flat.replace(edge_fuse_ok=False)
        chunked = chunked.replace(edge_fuse_ok=False)
        chunked = jax.tree.map(jnp.asarray, chunked)
        opt = build_optimizer(cfg, 4)
        sc = init_train_state(jax.random.key(1), cfg, cartnet_init, opt)
        sf = init_train_state(jax.random.key(1), cfg, cartnet_init, opt)
        cmicro, _, _ = make_chunked_steps(cfg, cartnet_apply, opt)
        fmicro, _, _ = make_steps(cfg, cartnet_apply, opt)
        sc, stats_c = cmicro(sc, chunked)
        sf, stats_f = fmicro(sf, flat)
        np.testing.assert_allclose(float(stats_c["loss"]),
                                   float(stats_f["loss"]), rtol=1e-4)
        for gc, gf in zip(jax.tree.leaves(sc.grad_accum),
                          jax.tree.leaves(sf.grad_accum)):
            np.testing.assert_allclose(np.asarray(gc), np.asarray(gf),
                                       rtol=2e-2, atol=3e-4)
    finally:
        cartnet_mod._FORCE_SIGMA_INTERPRET = False
