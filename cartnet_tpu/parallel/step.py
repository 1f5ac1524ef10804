"""shard_map training/eval steps: DP x edge-parallel with sync BN.

Layout (see parallel/mesh.py): each ``dp`` slice owns a disjoint stack of
crystals; within a slice the dst-sorted edge list is partitioned over ``ep``
while node arrays are replicated. Per layer, each device computes messages for
its local edges only and the [N, d] partial node aggregates are psum'd over
``ep`` — the GNN analogue of tensor-parallel all-reduce, riding ICI.

Loss partitioning: every ep member sees identical (replicated) predictions, so
the loss mask is deterministically partitioned across ep (element i goes to
member i mod ep). Losses are then *disjoint* functions and psum'ing their
gradients over ('dp','ep') yields exactly the single-device gradient — no
double counting through the replicated node compute.

Batches are built per-dp-slice with LOCAL node indices and concatenated on the
leading axis (stack_for_shards); shard_map hands each device its own block, so
gathers stay device-local and only the aggregate all-reduce touches the
interconnect.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from cartnet_tpu.config import Config
from cartnet_tpu.data.schema import CrystalBatch
from cartnet_tpu.parallel.mesh import batch_pspecs
from cartnet_tpu.train.state import TrainState

EDGE_FIELDS = ("edge_src", "edge_dst", "cart_dir", "cart_dist", "edge_mask")


def stack_for_shards(batches: List[CrystalBatch],
                     ep: int = 1) -> CrystalBatch:
    """Concatenate per-dp-slice batches on axis 0, keeping LOCAL indices.

    The Pallas kernel plans ride along so the sharded step can run the fused
    kernels (VERDICT r2 #1):

      * ``edge_dst_lo``/``edge_src_lo`` ([nt] per slice) concatenate like any
        edge-aligned field; with the pipeline padding E to a multiple of
        ep*T_EDGES, the (dp, ep) edge split hands each member whole windows
        and the matching slice of the plan.
      * static flags AND over slices — a traced program commits to one plan.
      * ``edge_src_perm``/``edge_src_sorted`` permute a full slice-local edge
        axis, so they survive only when the edge axis is NOT further split
        (ep == 1); for ep > 1 they are dropped and the layers use plain
        gathers or the fused kernel.
    """
    from cartnet_tpu.ops.pallas.segment_kernels import T_EDGES
    fuse = all(b.edge_fuse_ok for b in batches)
    seg = all(b.pallas_seg_ok for b in batches)
    ep = max(ep, 1)
    if batches[0].num_edges % (ep * T_EDGES) != 0:
        # members would receive partial windows — plans are unusable; swap in
        # ep-divisible dummies so the (dp, ep) plan sharding stays legal
        fuse, seg = False, False
        zeros = jnp.zeros(ep, jnp.int32)
        batches = [b.replace(edge_dst_lo=zeros, edge_src_lo=zeros,
                             edge_src_nblk=zeros)
                   for b in batches]
    if ep > 1:
        batches = [b.replace(edge_src_perm=None, edge_src_sorted=None,
                             edge_mask_src_sorted=None, src_degree=None)
                   for b in batches]
    hempty = all(b.halo_empty for b in batches)
    from cartnet_tpu.data.batching import upgrade_src_band
    band = max(b.src_band for b in batches)
    batches = [upgrade_src_band(b, band) for b in batches]
    # interior-first split point must agree across dp slices (one traced
    # program): take the min — extra interior windows on other slices just
    # run in the boundary call, which is always correct
    hint = min(b.halo_interior_nt for b in batches)
    batches = [b.replace(edge_fuse_ok=fuse, pallas_seg_ok=seg,
                         halo_empty=hempty, halo_interior_nt=hint)
               for b in batches]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *batches)


def _partition_mask(mask, axis: str):
    """Disjoint deterministic split of a boolean mask across a mesh axis."""
    size = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    lane = jnp.arange(mask.shape[0]) % size
    return mask & (lane == idx)


def _masked_sums(pred, true, mask):
    m = mask.astype(pred.dtype)
    m = m.reshape(m.shape + (1,) * (pred.ndim - m.ndim))
    diff = (pred - true) * m
    elems = float(np.prod(pred.shape[mask.ndim:])) if pred.ndim > mask.ndim else 1.0
    return (jnp.sum(jnp.abs(diff)), jnp.sum(diff * diff), jnp.sum(m) * elems)


def _build_forward_loss(cfg: Config, model_apply, halo: bool,
                        axes=("dp", "ep"), ep_axis: str = "ep",
                        node_axes=None):
    """Member-local forward + psum'd masked loss/stats (shared by the
    per-batch micro/eval steps, the fused-scan chunk, and the single-device
    chunked vmap steps in parallel/chunk.py)."""
    node_targets = cfg.model.cholesky
    if node_axes is None:
        node_axes = axes if halo else tuple(a for a in axes if a != ep_axis)

    def _forward_loss(params, bn_state, batch: CrystalBatch, training: bool):
        pred, mask, new_bn = model_apply(
            params, bn_state, batch, cfg.model, training=training,
            ep_axis=ep_axis, edge_stat_axes=axes, node_stat_axes=node_axes)
        lmask = (mask if halo and node_targets
                 else _partition_mask(mask, ep_axis))
        sa, sq, cnt = _masked_sums(pred, batch.y, lmask)
        sa = jax.lax.psum(sa, axes)
        sq = jax.lax.psum(sq, axes)
        cnt = jnp.maximum(jax.lax.psum(cnt, axes), 1.0)
        mae, mse = sa / cnt, sq / cnt
        loss = mae if cfg.optim.loss == "MAE" else mse
        stats = {"loss": loss, "MAE": mae, "MSE": mse}
        if cfg.model.cholesky:
            # per-epoch ADP metrics (reference train/metrics.py:183-238),
            # disjointly partitioned over ep like the loss, psum'd to the
            # exact global masked means
            from cartnet_tpu.train.metrics import adp_stat_sums
            vol, sim, n = adp_stat_sums(jax.lax.stop_gradient(pred), batch.y,
                                        lmask)
            n = jnp.maximum(jax.lax.psum(n, axes), 1.0)
            stats["volume_percentage_error"] = jax.lax.psum(vol, axes) / n
            stats["similarity_index"] = jax.lax.psum(sim, axes) / n
        return loss, (stats, new_bn, pred, mask)

    return _forward_loss


def make_parallel_steps(cfg: Config, model_apply, optimizer, mesh: Mesh,
                        halo: bool = False):
    """Build (micro_step, update_step, eval_step) over a (dp, ep) mesh.

    halo=False: nodes replicated over ep, per-layer psum of aggregates.
    halo=True: nodes sharded over ep too (parallel/halo.py to_halo batches);
    the only per-layer collective is the boundary all_to_all. Node-level BN
    stats then reduce over BOTH axes, and node-aligned losses need no ep lane
    partitioning (ownership already makes them disjoint).
    """
    node_targets = cfg.model.cholesky
    ep = int(mesh.shape["ep"])
    with_perm = (ep == 1) and not halo
    bspecs = batch_pspecs(halo, node_targets, with_perm=with_perm)
    _forward_loss = _build_forward_loss(cfg, model_apply, halo)

    def _micro(state: TrainState, batch: CrystalBatch):
        def lossfn(p, s, b):
            loss, aux = _forward_loss(p, s, b, True)
            return loss, aux

        (loss, (stats, new_bn, _, _)), grads = jax.value_and_grad(
            lossfn, has_aux=True)(state.params, state.bn_state, batch)
        # NB: no explicit psum of grads — the loss is already psum-replicated,
        # and shard_map AD transposes those psums so each member ends up with
        # the complete global gradient (an extra psum would multiply by the
        # device count; verified by tests/test_parallel.py).
        acc = jax.tree.map(jnp.add, state.grad_accum, grads)
        state = state.replace(bn_state=new_bn, grad_accum=acc,
                              accum_count=state.accum_count + 1)
        return state, stats

    def _eval(params, bn_state, batch: CrystalBatch):
        _, (stats, _, pred, mask) = _forward_loss(params, bn_state,
                                                  batch, False)
        return pred, mask, stats

    rep = P()
    pred_spec = P(("dp", "ep")) if halo and node_targets else P("dp")

    # CrystalBatch carries STATIC kernel flags in its treedef, and shard_map
    # in_specs must match the input's treedef exactly — so the shard_map (and
    # its jit) is instantiated per flag combination (≤4 per run, typically 1)
    @functools.lru_cache(maxsize=None)
    def _micro_for(fuse: bool, seg: bool, hempty: bool, band: int,
                   hint: int):
        specs = bspecs.replace(edge_fuse_ok=fuse, pallas_seg_ok=seg,
                               halo_empty=hempty, src_band=band,
                               halo_interior_nt=hint)
        sm = jax.shard_map(_micro, mesh=mesh,
                          in_specs=(rep, specs), out_specs=(rep, rep))
        return jax.jit(sm, donate_argnums=0)

    @functools.lru_cache(maxsize=None)
    def _eval_for(fuse: bool, seg: bool, hempty: bool, band: int,
                  hint: int):
        specs = bspecs.replace(edge_fuse_ok=fuse, pallas_seg_ok=seg,
                               halo_empty=hempty, src_band=band,
                               halo_interior_nt=hint)
        sm = jax.shard_map(_eval, mesh=mesh,
                          in_specs=(rep, rep, specs),
                          out_specs=(pred_spec, pred_spec, rep))
        return jax.jit(sm)

    def micro_step(state, batch):
        return _micro_for(batch.edge_fuse_ok, batch.pallas_seg_ok,
                          batch.halo_empty, batch.src_band,
                          batch.halo_interior_nt)(state, batch)

    def eval_step(params, bn_state, batch):
        return _eval_for(batch.edge_fuse_ok, batch.pallas_seg_ok,
                         batch.halo_empty, batch.src_band,
                         batch.halo_interior_nt)(params, bn_state, batch)

    @functools.partial(jax.jit, donate_argnums=0)
    def update_step(state: TrainState):
        updates, opt_state = optimizer.update(state.grad_accum, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        zeros = jax.tree.map(jnp.zeros_like, state.grad_accum)
        return state.replace(params=params, opt_state=opt_state,
                             grad_accum=zeros,
                             accum_count=jnp.zeros((), jnp.int32),
                             step=state.step + 1)

    return micro_step, update_step, eval_step


def make_parallel_fused_chunk(cfg: Config, model_apply, optimizer,
                              num_steps: int, mesh: Mesh,
                              halo: bool = False):
    """lax.scan of ``num_steps`` sharded micro-steps in ONE device launch.

    The single-device fused epoch (train/loop.py::make_fused_chunk) removes
    the ~25 ms/call dispatch latency of remote-tunnel runtimes; round 2 lost
    that exactly when dp*ep > 1 (VERDICT r2 missing #3). Here the scan lives
    INSIDE shard_map: stacked super-batches carry a leading K axis on every
    leaf, sharded P(None, <field spec>), so each member scans its own K local
    shards with the same psum'd loss/BN semantics as the per-batch step.
    Reference cadence preserved: grads accumulate per VALID micro-batch and
    the optimizer steps every ``cfg.optim.batch_accumulation`` of them
    (/root/reference/train/train.py:183-189); fully-masked dummy tail slices
    are no-ops.
    """
    import jax.lax as lax

    node_targets = cfg.model.cholesky
    ep = int(mesh.shape["ep"])
    with_perm = (ep == 1) and not halo
    bspecs = batch_pspecs(halo, node_targets, with_perm=with_perm)
    scan_specs = jax.tree.map(
        lambda p: P(*((None,) + tuple(p))), bspecs,
        is_leaf=lambda x: isinstance(x, P))
    _forward_loss = _build_forward_loss(cfg, model_apply, halo)
    accum = cfg.optim.batch_accumulation

    def apply_update(state: TrainState):
        updates, opt_state = optimizer.update(state.grad_accum,
                                              state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        zeros = jax.tree.map(jnp.zeros_like, state.grad_accum)
        return state.replace(params=params, opt_state=opt_state,
                             grad_accum=zeros,
                             accum_count=jnp.zeros((), jnp.int32),
                             step=state.step + 1)

    def one(state: TrainState, batch: CrystalBatch):
        # a dummy (ragged-tail) super-batch is fully masked on EVERY member
        # (graph arrays vary over dp only — promote before the 2-axis psum)
        any_local = jax.lax.pcast(
            jnp.any(batch.graph_mask).astype(jnp.int32), ("ep",),
            to="varying")
        valid = jax.lax.psum(any_local, ("dp", "ep")) > 0

        def lossfn(p, s, b):
            loss, (stats, new_bn, _, _) = _forward_loss(p, s, b, True)
            return loss, (stats, new_bn)

        (loss, (stats, new_bn)), grads = jax.value_and_grad(
            lossfn, has_aux=True)(state.params, state.bn_state, batch)
        bad = jnp.asarray(False)
        if cfg.guard.enabled:
            from cartnet_tpu.train.guard import guard_contribution
            ok, grads, new_bn = guard_contribution(loss, grads, new_bn,
                                                   state.bn_state)
            bad = valid & ~ok
            valid = valid & ok
        grads = jax.tree.map(
            lambda g: jnp.where(valid, g, jnp.zeros_like(g)), grads)
        new_bn = jax.tree.map(lambda a, b: jnp.where(valid, a, b),
                              new_bn, state.bn_state)
        acc = jax.tree.map(jnp.add, state.grad_accum, grads)
        state = state.replace(bn_state=new_bn, grad_accum=acc,
                              accum_count=state.accum_count
                              + valid.astype(jnp.int32),
                              bad_steps=state.bad_steps
                              + bad.astype(jnp.int32))
        state = lax.cond(state.accum_count >= accum, apply_update,
                         lambda s: s, state)
        v = valid.astype(jnp.float32)
        return state, {"loss": loss * v, "MAE": stats["MAE"] * v,
                       "MSE": stats["MSE"] * v, "valid": v}

    def _chunk(state: TrainState, stacked: CrystalBatch):
        return lax.scan(one, state, stacked, length=num_steps)

    rep = P()

    @functools.lru_cache(maxsize=None)
    def _chunk_for(fuse: bool, seg: bool, hempty: bool, band: int,
                   hint: int):
        specs = scan_specs.replace(edge_fuse_ok=fuse, pallas_seg_ok=seg,
                                   halo_empty=hempty, src_band=band,
                                   halo_interior_nt=hint)
        sm = jax.shard_map(_chunk, mesh=mesh,
                           in_specs=(rep, specs), out_specs=(rep, rep))
        return jax.jit(sm, donate_argnums=0)

    def chunk(state, stacked):
        return _chunk_for(stacked.edge_fuse_ok, stacked.pallas_seg_ok,
                          stacked.halo_empty, stacked.src_band,
                          stacked.halo_interior_nt)(state, stacked)

    return chunk
