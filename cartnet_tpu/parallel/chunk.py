"""Chunked single-device execution: bounded-VMEM kernels at any batch size.

The window kernels keep node-sized buffers VMEM-resident, so their cost (and
feasibility) degrades as the batch's node count grows — round 2 measured
graphs=16 at 3.7M and graphs=32 at 2.0M edges/s vs 6.4M at graphs=4
(PERF_NOTES.md), exactly the batch-64 regime the jarvis/megnet configs need
(reference scripts/train_cartnet_jarvis.sh). This module fixes the
anti-scaling WITHOUT new kernels:

  * the batch is re-laid into K member-major chunks by parallel/halo.to_halo
    (graph-snapped cuts -> almost always a ZERO-halo layout with chunk-local
    indices and per-chunk kernel window plans);
  * the step vmaps the member-local forward over the chunk axis with
    ``axis_name="chunk"`` — each vmapped kernel instance sees an N/K-node
    table (VMEM bounded), while BN moments, losses, and per-graph reductions
    psum over the vmap axis, so the semantics are bit-comparable to the flat
    single-device step (same global BN statistics, same loss);
  * parameter gradients come out exact because vmap sums the cotangents of
    broadcast (in_axes=None) inputs.

This is the same math as the halo shard_map step (parallel/step.py) with the
mesh axis replaced by a vmap axis; tests/test_chunked.py pins equality
against the flat step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from cartnet_tpu.config import Config
from cartnet_tpu.data.schema import CrystalBatch
from cartnet_tpu.parallel.halo import to_halo
from cartnet_tpu.parallel.step import _build_forward_loss
from cartnet_tpu.train.state import TrainState


def to_chunked(batch: CrystalBatch, k: int,
               h_max=None) -> CrystalBatch:
    """Member-major re-layout + leading chunk axis on node/edge leaves.

    Graph-level arrays (cell/temperature/graph_mask, scalar y) keep their
    global layout and are broadcast to every chunk by the step's vmap;
    graph_id stays global so per-graph reductions can psum over chunks.

    ``h_max`` sizes the recv block of the per-chunk [local ‖ recv] src
    table; the fused edge kernel keeps that table VMEM-resident, so a big
    allowance silently fails its VMEM gate and drops the whole point of
    chunking. Default: try small allowances first (graph-snapped chunk cuts
    need ZERO halo rows) and only grow when graphs genuinely split.
    """
    from cartnet_tpu.parallel.halo import HaloInfeasible
    if h_max is None:
        n_per = batch.z.shape[0] // k
        last_err = None
        for cand in (16, 64, 256, n_per):
            if cand > n_per:
                continue
            try:
                hb = to_halo(batch, k, h_max=cand)
                break
            except HaloInfeasible as err:
                last_err = err
        else:
            raise last_err
    else:
        hb = to_halo(batch, k, h_max=h_max)
    n, e = hb.z.shape[0], hb.edge_src.shape[0]
    nt = hb.edge_dst_lo.shape[0]

    def reshape(a, total):
        import numpy as np
        return np.asarray(a).reshape((k, total // k) + np.shape(a)[1:])

    return hb.replace(
        z=reshape(hb.z, n), pos=reshape(hb.pos, n),
        graph_id=reshape(hb.graph_id, n),
        node_mask=reshape(hb.node_mask, n),
        non_h_mask=reshape(hb.non_h_mask, n),
        y=reshape(hb.y, n) if hb.adp_targets else hb.y,
        edge_src=reshape(hb.edge_src, e), edge_dst=reshape(hb.edge_dst, e),
        cart_dir=reshape(hb.cart_dir, e), cart_dist=reshape(hb.cart_dist, e),
        edge_mask=reshape(hb.edge_mask, e),
        edge_dst_lo=reshape(hb.edge_dst_lo, nt),
        edge_src_lo=reshape(hb.edge_src_lo, nt),
        edge_src_nblk=reshape(hb.edge_src_nblk, nt))


def _chunk_in_axes(batch: CrystalBatch):
    """vmap in_axes tree: chunked leaves map over axis 0, graph-level leaves
    broadcast. halo_send_idx/mask are member-major on their leading axis."""
    ax = lambda a, mapped: (0 if mapped else None) if a is not None else None
    return CrystalBatch(
        z=0, pos=0, graph_id=0, node_mask=0, non_h_mask=0,
        edge_src=0, edge_dst=0, cart_dir=0, cart_dist=0, edge_mask=0,
        cell=None, temperature=None, graph_mask=None,
        # chunked node-aligned y is [K, n_per, 3, 3] (ndim 4); scalar y stays
        # the global [G] — NB adp_targets (ndim==3) is wrong on chunked y
        y=0 if batch.y.ndim >= 2 else None,
        edge_src_perm=ax(batch.edge_src_perm, True),
        edge_src_sorted=ax(batch.edge_src_sorted, True),
        edge_dst_lo=0, edge_src_lo=0,
        edge_src_nblk=ax(batch.edge_src_nblk, True),
        halo_send_idx=0, halo_send_mask=0,
        edge_fuse_ok=batch.edge_fuse_ok,
        pallas_seg_ok=batch.pallas_seg_ok,
        src_band=batch.src_band,
        halo_empty=batch.halo_empty)


def make_chunked_steps(cfg: Config, model_apply, optimizer):
    """(micro_step, update_step, eval_step) over to_chunked batches."""
    if cfg.model.name != "cartnet":
        raise ValueError("chunked execution supports model 'cartnet' only "
                         "(the chunk re-layout is the halo layout)")
    fl = _build_forward_loss(cfg, model_apply, halo=True, axes=("chunk",),
                             ep_axis="chunk")

    def _forward(params, bn_state, batch: CrystalBatch, training: bool):
        def per_chunk(b):
            return fl(params, bn_state, b, training)

        loss_k, (stats_k, bn_k, pred_k, mask_k) = jax.vmap(
            per_chunk, in_axes=(_chunk_in_axes(batch),),
            axis_name="chunk")(batch)
        # psum'd scalars are identical on every chunk; BN stats likewise
        first = lambda t: jax.tree.map(lambda a: a[0], t)
        return (loss_k[0], first(stats_k), first(bn_k), pred_k, mask_k)

    def _loss_for_grad(params, bn_state, batch):
        loss, stats, new_bn, _, _ = _forward(params, bn_state, batch, True)
        return loss, (stats, new_bn)

    @functools.lru_cache(maxsize=None)
    def _micro_for(fuse: bool, seg: bool, hempty: bool):
        del fuse, seg, hempty  # static flags live in the batch treedef

        @functools.partial(jax.jit, donate_argnums=0)
        def micro(state: TrainState, batch: CrystalBatch):
            (loss, (stats, new_bn)), grads = jax.value_and_grad(
                _loss_for_grad, has_aux=True)(state.params, state.bn_state,
                                              batch)
            ok = jnp.asarray(True)
            if cfg.guard.enabled:
                from cartnet_tpu.train.guard import guard_contribution
                ok, grads, new_bn = guard_contribution(loss, grads, new_bn,
                                                       state.bn_state)
            acc = jax.tree.map(jnp.add, state.grad_accum, grads)
            state = state.replace(
                bn_state=new_bn, grad_accum=acc,
                accum_count=state.accum_count + ok.astype(jnp.int32),
                bad_steps=state.bad_steps + (1 - ok.astype(jnp.int32)))
            return state, stats

        return micro

    @functools.lru_cache(maxsize=None)
    def _eval_for(fuse: bool, seg: bool, hempty: bool):
        del fuse, seg, hempty

        @jax.jit
        def evals(params, bn_state, batch: CrystalBatch):
            _, stats, _, pred, mask = _forward(params, bn_state, batch,
                                               False)
            if cfg.model.cholesky:
                # node-aligned [K, n_per, 3, 3] -> flat member-major [N, ...]
                # like the halo layout, so eval consumers mask uniformly
                flat = lambda a: a.reshape((-1,) + a.shape[2:])
                return flat(pred), flat(mask), stats
            # scalar targets: per-graph predictions are already psum'd over
            # chunks and identical on each — take chunk 0's copy
            return pred[0], mask[0], stats

        return evals

    def micro_step(state, batch):
        return _micro_for(batch.edge_fuse_ok, batch.pallas_seg_ok,
                          batch.halo_empty)(state, batch)

    def eval_step(params, bn_state, batch):
        return _eval_for(batch.edge_fuse_ok, batch.pallas_seg_ok,
                         batch.halo_empty)(params, bn_state, batch)
    # NB: src_band rides the treedef, so the jit caches retrace per band

    @functools.partial(jax.jit, donate_argnums=0)
    def update_step(state: TrainState):
        updates, opt_state = optimizer.update(state.grad_accum,
                                              state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        zeros = jax.tree.map(jnp.zeros_like, state.grad_accum)
        return state.replace(params=params, opt_state=opt_state,
                             grad_accum=zeros,
                             accum_count=jnp.zeros((), jnp.int32),
                             step=state.step + 1)

    return micro_step, update_step, eval_step
