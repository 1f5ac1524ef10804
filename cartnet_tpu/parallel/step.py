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


def stack_for_shards(batches: List[CrystalBatch]) -> CrystalBatch:
    """Concatenate per-dp-slice batches on axis 0, keeping LOCAL indices.

    edge_src_perm is dropped: it permutes a full collated batch, which is
    meaningless once the edge axis is re-split over ep shards — the layers
    fall back to plain gathers inside shard_map.
    """
    batches = [b.replace(edge_src_perm=None, pallas_seg_ok=False,
                         edge_dst_lo=None, edge_src_lo=None,
                         edge_fuse_ok=False, edge_src_sorted=None)
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
    bspecs = batch_pspecs(halo, node_targets)
    axes = ("dp", "ep")
    node_axes = axes if halo else ("dp",)

    def _forward_loss(params, bn_state, batch: CrystalBatch, training: bool):
        pred, mask, new_bn = model_apply(
            params, bn_state, batch, cfg.model, training=training,
            ep_axis="ep", edge_stat_axes=axes, node_stat_axes=node_axes)
        lmask = (mask if halo and node_targets
                 else _partition_mask(mask, "ep"))
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
    micro_sm = jax.shard_map(_micro, mesh=mesh,
                             in_specs=(rep, bspecs), out_specs=(rep, rep))
    eval_sm = jax.shard_map(_eval, mesh=mesh,
                            in_specs=(rep, rep, bspecs),
                            out_specs=(pred_spec, pred_spec, rep))

    micro_step = jax.jit(micro_sm, donate_argnums=0)
    eval_step = jax.jit(eval_sm)

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
