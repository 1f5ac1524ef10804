"""Training/eval steps and the epoch loop.

Mirrors the reference loop semantics (/root/reference/train/train.py):
  * per micro-batch: forward, loss (MAE or MSE), backward (grads SUMMED into
    an accumulator — PyTorch accumulates, never averages: :183-189);
  * optimizer+scheduler step every ``batch_accumulation`` micro-batches or at
    epoch end;
  * BN running stats advance every train micro-batch;
  * best-epoch tracking by val MAE, checkpoint on improvement (:75,91-102),
    final test eval with the best params (:114-117).

Everything device-side is jitted with donated state; the host loop only feeds
batches and logs.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from cartnet_tpu.config import Config
from cartnet_tpu.data.schema import CrystalBatch
from cartnet_tpu.train.metrics import (adp_stat_sums, masked_iou_sum,
                                       masked_mae_mse)
from cartnet_tpu.train.schedule import make_optimizer, reference_total_steps
from cartnet_tpu.train.state import TrainState


def loss_fn(params, bn_state, batch: CrystalBatch, model_apply, cfg: Config,
            training: bool):
    pred, mask, new_bn = model_apply(params, bn_state, batch, cfg.model,
                                     training=training)
    mae, mse = masked_mae_mse(pred, batch.y, mask)
    loss = mae if cfg.optim.loss == "MAE" else mse
    return loss, (mae, mse, new_bn, pred, mask)


def _stats_with_adp(cfg: Config, base, pred, y, mask):
    """Per-epoch ADP metrics the reference logs every train/val epoch
    (volume_percentage_error + similarity_index,
    /root/reference/train/metrics.py:183-238); no-op for scalar targets."""
    if not cfg.model.cholesky:
        return base
    vol, sim, n = adp_stat_sums(jax.lax.stop_gradient(pred), y, mask)
    n = jnp.maximum(n, 1.0)
    return {**base, "volume_percentage_error": vol / n,
            "similarity_index": sim / n}


def _logged_dim(batch) -> int:
    """Model width for the kernel-gate mirror — cached on first use by the
    epoch drivers (they have no cfg in scope for eval pipelines)."""
    return _logged_dim.value


_logged_dim.value = 0
_logged_mesh = (1, 1)


def set_logged_dim(dim: int, dp: int = 1, ep: int = 1):
    global _logged_mesh
    _logged_dim.value = int(dim)
    _logged_mesh = (max(int(dp), 1), max(int(ep), 1))


def target_weight(batch: CrystalBatch) -> float:
    """Reference logger weighting: batch_size == true.shape[0] — non-H atoms
    for ADP targets, graphs for scalar targets (logger/logger.py:72-80)."""
    import numpy as np
    mask = batch.non_h_mask if batch.y.ndim >= 3 else batch.graph_mask
    return float(np.sum(np.asarray(mask)))  # chunked [K, n_per] sums fine


def make_iou_fn(chunk: int = 128, num_points: int = 64):
    """Jitted masked-mean 3D IoU over a padded [N,3,3] prediction stack;
    test-time only (reference train/metrics.py:201-214)."""

    @jax.jit
    def iou_mean(pred, y, mask):
        s, n = masked_iou_sum(pred, y, mask, chunk=chunk,
                              num_points=num_points)
        return s / jnp.maximum(n, 1.0)

    return iou_mean


def init_train_state(key, cfg: Config, model_init, optimizer) -> TrainState:
    pkey, rkey = jax.random.split(key)
    params, bn_state = model_init(pkey, cfg.model)
    opt_state = optimizer.init(params)
    zeros = jax.tree.map(jnp.zeros_like, params)
    return TrainState(params=params, bn_state=bn_state, opt_state=opt_state,
                      grad_accum=zeros, accum_count=jnp.zeros((), jnp.int32),
                      step=jnp.zeros((), jnp.int32), rng=rkey,
                      bad_steps=jnp.zeros((), jnp.int32))


def make_steps(cfg: Config, model_apply, optimizer):
    """Build jitted (micro_step, update_step, eval_step)."""

    @functools.partial(jax.jit, donate_argnums=0)
    def micro_step(state: TrainState, batch: CrystalBatch):
        (loss, (mae, mse, new_bn, pred, mask)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.bn_state, batch,
                                   model_apply, cfg, True)
        ok = jnp.asarray(True)
        if cfg.guard.enabled:
            # non-finite steps contribute nothing and don't advance the
            # accumulation cadence (train/guard.py)
            from cartnet_tpu.train.guard import guard_contribution
            ok, grads, new_bn = guard_contribution(loss, grads, new_bn,
                                                   state.bn_state)
        acc = jax.tree.map(jnp.add, state.grad_accum, grads)
        state = state.replace(bn_state=new_bn, grad_accum=acc,
                              accum_count=state.accum_count
                              + ok.astype(jnp.int32),
                              bad_steps=state.bad_steps
                              + (1 - ok.astype(jnp.int32)))
        stats = _stats_with_adp(cfg, {"loss": loss, "MAE": mae, "MSE": mse},
                                pred, batch.y, mask)
        return state, stats

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

    @jax.jit
    def eval_step(params, bn_state, batch: CrystalBatch):
        pred, mask, _ = model_apply(params, bn_state, batch, cfg.model,
                                    training=False)
        mae, mse = masked_mae_mse(pred, batch.y, mask)
        loss = mae if cfg.optim.loss == "MAE" else mse
        stats = _stats_with_adp(cfg, {"loss": loss, "MAE": mae, "MSE": mse},
                                pred, batch.y, mask)
        return pred, mask, stats

    return micro_step, update_step, eval_step


def train_epoch(state: TrainState, batches: Iterable[CrystalBatch], micro_step,
                update_step, batch_accumulation: int, logger=None,
                lr_fn: Optional[Callable] = None):
    """One epoch; steps optimizer every N micro-batches and at epoch end.

    Fully async on the device side: no per-batch host<->device syncs (batch
    weights come from the host-resident masks, the optimizer-step count is
    tracked host-side for the LR readout, and stats stay device scalars until
    the logger's epoch write). One sync at epoch end closes the timing.
    """
    import numpy as np
    t_epoch = time.time()
    micro_count = 0
    opt_steps_before = None
    opt_steps = 0
    for i, batch in enumerate(batches):
        state, stats = micro_step(state, batch)
        micro_count += 1
        if (i + 1) % batch_accumulation == 0:
            state = update_step(state)
            opt_steps += 1
        if logger is not None:
            if opt_steps_before is None:
                # one-time sync: resume-aware base for the host step counter
                opt_steps_before = int(state.step) - opt_steps
            lr = (float(lr_fn(opt_steps_before + opt_steps))
                  if lr_fn is not None else 0.0)
            from cartnet_tpu.models.cartnet import kernels_active
            logger.update(stats, weight=target_weight(batch),
                          lr=lr,
                          edges=float(np.sum(np.asarray(batch.edge_mask))),
                          fused=kernels_active(batch, _logged_dim(batch),
                                               dp=_logged_mesh[0],
                                               ep=_logged_mesh[1]))
    if micro_count % batch_accumulation != 0:  # epoch-end flush (train/train.py:186)
        state = update_step(state)
    jax.block_until_ready(state.params)
    # remote-tunnel runtimes may not block without a prior d2h transfer;
    # a scalar pull guarantees the epoch is really finished before timing
    np.asarray(state.step)
    if logger is not None:
        logger.note_time(time.time() - t_epoch)
    return state


def eval_epoch(state: TrainState, batches: Iterable[CrystalBatch], eval_step,
               logger=None, collect=False, iou_fn=None):
    """Eval pass; feeds masked pred/true to the logger for r2/spearman
    (reference logger/logger.py:51-58).

    All steps are dispatched first; device->host transfers of predictions
    happen in one pass afterwards so they overlap the remaining compute
    instead of blocking each batch.

    ``iou_fn``: optional jitted masked-IoU mean (make_iou_fn) — pass at final
    test on ADP targets to reproduce the reference's test-only ``iou`` stat
    (train/metrics.py:201-214).
    """
    import numpy as np

    def _flat_y(batch):
        # chunked batches carry node-aligned y as [K, n_per, 3, 3]; the
        # chunked eval returns member-major FLAT predictions/masks, so align
        y = batch.y
        if getattr(y, "ndim", 0) == 4:
            return y.reshape((-1,) + y.shape[2:])
        return y

    preds = []
    pending = []
    t0 = time.time()
    for batch in batches:
        pred, mask, stats = eval_step(state.params, state.bn_state, batch)
        if iou_fn is not None:
            stats = {**stats, "iou": iou_fn(pred, _flat_y(batch), mask)}
        if logger is not None:
            from cartnet_tpu.models.cartnet import kernels_active
            pending.append((stats, target_weight(batch),
                            pred, mask, _flat_y(batch),
                            float(np.sum(np.asarray(batch.edge_mask))),
                            kernels_active(batch, _logged_dim(batch),
                                           dp=_logged_mesh[0],
                                           ep=_logged_mesh[1])))
        if collect:
            preds.append((pred, mask, batch))
    for stats, w, pred, mask, y, edges, fused in pending:
        m = np.asarray(mask)
        logger.update(stats, weight=w, true=np.asarray(y)[m],
                      pred=np.asarray(pred)[m], edges=edges, fused=fused)
    if logger is not None:
        logger.note_time(time.time() - t0)
    return preds


def make_fused_chunk(cfg: Config, model_apply, optimizer, num_steps: int):
    """One jitted launch executing ``num_steps`` micro-steps with FULL
    reference semantics: grads accumulate per micro-batch and the optimizer
    steps every ``cfg.optim.batch_accumulation`` VALID micro-batches
    (train/train.py:183-189). Fully-masked dummy batches (ragged-tail pads)
    contribute zero grads/stats and do not advance the accumulation cadence.

    Exists because per-batch dispatch costs ~25 ms through a remote-tunnel
    runtime (PERF_NOTES.md) — an ADP epoch is ~40k micro-batches. One launch
    per chunk removes all of it.
    """
    import jax.lax as lax
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
        valid = jnp.any(batch.graph_mask)
        (loss, (mae, mse, new_bn, _, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.bn_state, batch,
                                   model_apply, cfg, True)
        bad = jnp.asarray(False)
        if cfg.guard.enabled:
            from cartnet_tpu.train.guard import guard_contribution
            ok, grads, new_bn = guard_contribution(loss, grads, new_bn,
                                                   state.bn_state)
            bad = valid & ~ok   # dummy tail pads are not failures
            valid = valid & ok
        v = valid.astype(jnp.float32)
        # where, not multiply: non-finite grads * 0.0 would write NaN into
        # the accumulator (see train/guard.py::guard_contribution)
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
        return state, {"loss": loss * v, "MAE": mae * v, "MSE": mse * v,
                       "valid": v}

    def one_nocond(state: TrainState, batch: CrystalBatch):
        # nested-accumulation inner body: no per-micro-step lax.cond around
        # the optimizer (the outer scan applies it unconditionally every
        # ``accum`` iterations — the reference's own cadence counts
        # ITERATIONS, not valid micro-batches: train/train.py:186)
        valid = jnp.any(batch.graph_mask)
        (loss, (mae, mse, new_bn, _, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.bn_state, batch,
                                   model_apply, cfg, True)
        bad = jnp.asarray(False)
        if cfg.guard.enabled:
            from cartnet_tpu.train.guard import guard_contribution
            ok, grads, new_bn = guard_contribution(loss, grads, new_bn,
                                                   state.bn_state)
            bad = valid & ~ok
            valid = valid & ok
        v = valid.astype(jnp.float32)
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
        return state, {"loss": loss * v, "MAE": mae * v, "MSE": mse * v,
                       "valid": v}

    @functools.partial(jax.jit, donate_argnums=0)
    def chunk(state: TrainState, stacked_batches: CrystalBatch):
        # scan unrolling reduces while-loop bookkeeping (~45 us/step self
        # time at bench shapes) and lets XLA overlap adjacent micro-steps
        import os
        unroll = int(os.environ.get("CARTNET_SCAN_UNROLL", "1"))
        nested = (os.environ.get("CARTNET_NESTED_ACCUM", "0") == "1"
                  and accum > 1 and num_steps % accum == 0)
        if nested:
            def outer(state, group):
                state, stats = lax.scan(one_nocond, state, group,
                                        length=accum)
                # match the default path's valid-only cadence: a group of
                # all guard-rejected / dummy-tail micro-batches must not
                # fire a zero-grad Adam step (moment decay + step count)
                state = lax.cond(state.accum_count > 0, apply_update,
                                 lambda s: s, state)
                return state, stats

            grouped = jax.tree.map(
                lambda a: a.reshape((num_steps // accum, accum)
                                    + a.shape[1:]),
                stacked_batches)
            state, stats = lax.scan(outer, state, grouped,
                                    length=num_steps // accum)
            stats = jax.tree.map(
                lambda a: a.reshape((num_steps,) + a.shape[2:]), stats)
            return state, stats
        return lax.scan(one, state, stacked_batches, length=num_steps,
                        unroll=unroll)

    return chunk


def train_epoch_fused(state: TrainState, batches, chunk_fn, chunk_size: int,
                      update_step, logger=None, lr_fn=None,
                      batch_accumulation: int = 1):
    """Epoch driver for make_fused_chunk: stacks ``chunk_size`` host batches
    per device launch; ragged tails are padded with fully-masked dummies.
    ``update_step`` applies the epoch-end flush of a partial accumulation
    cycle (train/train.py:186). ``batch_accumulation`` mirrors the chunk's
    optimizer cadence so the host can stamp each micro-batch with its true
    per-step LR (the device advances one optimizer step per
    ``batch_accumulation`` VALID micro-batches)."""
    import numpy as np
    t_epoch = time.time()
    # one sync before dispatch: the base optimizer step for LR stamping
    step0 = int(jax.device_get(state.step))
    pending = []
    weights, edges = [], []
    group: list = []

    def flush_chunk(group):
        nonlocal state
        kreal = len(group)
        if kreal < chunk_size:
            dummy = jax.tree.map(jnp.zeros_like, group[-1])
            dummy = dummy.replace(pallas_seg_ok=group[-1].pallas_seg_ok,
                                  edge_fuse_ok=group[-1].edge_fuse_ok)
            group = group + [dummy] * (chunk_size - kreal)
        stacked = stack_batches(group)
        state, stats = chunk_fn(state, stacked)
        pending.append((stats, kreal))

    fused_flags = []
    for batch in batches:
        if group and (batch.z.shape != group[0].z.shape
                      or batch.edge_src.shape != group[0].edge_src.shape):
            # bucket boundary (per-bucket pad shapes): close the chunk
            flush_chunk(group)
            group = []
        group.append(batch)
        weights.append(target_weight(batch))
        edges.append(float(np.sum(np.asarray(batch.edge_mask))))
        from cartnet_tpu.models.cartnet import kernels_active
        fused_flags.append(kernels_active(batch, _logged_dim(batch),
                                          dp=_logged_mesh[0],
                                          ep=_logged_mesh[1]))
        if len(group) == chunk_size:
            flush_chunk(group)
            group = []
    if group:
        flush_chunk(group)
    # epoch-end flush of a partial accumulation cycle (train/train.py:186)
    if int(jax.device_get(state.accum_count)) > 0:
        state = update_step(state)
    if logger is not None:
        i = 0
        valid_seen = 0
        for stats, kreal in pending:
            host = {k: np.asarray(v) for k, v in stats.items()}
            for j in range(kreal):
                row = {k: float(host[k][j]) for k in ("loss", "MAE", "MSE")}
                # per-step LR curve, exactly like the unfused path: the
                # optimizer has stepped floor(valid_so_far / accum) times
                # after this micro-batch ("valid" excludes guarded-bad and
                # dummy batches, matching the device-side cadence)
                valid_seen += int(host.get("valid", np.ones(chunk_size))[j])
                lr = (float(lr_fn(step0 + valid_seen
                                  // max(batch_accumulation, 1)))
                      if lr_fn else 0.0)
                logger.update(row, weight=weights[i], lr=lr, edges=edges[i],
                              fused=fused_flags[i])
                i += 1
        logger.note_time(time.time() - t_epoch)
    return state


def make_fused_steps(cfg: Config, model_apply, optimizer, num_steps: int):
    """One jitted function executing ``num_steps`` micro+update train steps
    via lax.scan over a stacked batch pytree ([K, ...] leaves).

    Removes ALL host/dispatch latency from the inner loop — one launch per K
    steps. Use for throughput-critical training (and benchmarking: through a
    remote-tunnel runtime, per-call dispatch costs can exceed the actual chip
    time by an order of magnitude). Applies the optimizer every micro step
    (batch_accumulation=1 semantics).
    """
    import jax.lax as lax

    def one(state: TrainState, batch: CrystalBatch):
        (loss, (mae, mse, new_bn, _, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.bn_state, batch,
                                   model_apply, cfg, True)

        def apply(state):
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(params=params, opt_state=opt_state,
                                 step=state.step + 1)

        if cfg.guard.enabled:
            from cartnet_tpu.train.guard import guard_contribution
            ok, grads, new_bn = guard_contribution(loss, grads, new_bn,
                                                   state.bn_state)
            # per-leaf select instead of lax.cond: the identity branch of a
            # cond must COPY the whole params+opt pytree (~30 MB at flagship
            # scale) every micro step, while a select fuses into the Adam
            # update's elementwise writes (grads are already zeroed when !ok,
            # so the taken values are finite either way)
            new_state = apply(state)
            state = jax.tree.map(lambda n, o: jnp.where(ok, n, o),
                                 new_state, state)
            state = state.replace(bad_steps=state.bad_steps
                                  + (1 - ok.astype(jnp.int32)))
        else:
            state = apply(state)
        state = state.replace(bn_state=new_bn)
        return state, {"loss": loss, "MAE": mae}

    @functools.partial(jax.jit, donate_argnums=0)
    def fused(state: TrainState, stacked_batches: CrystalBatch):
        import os
        unroll = int(os.environ.get("CARTNET_SCAN_UNROLL", "1"))
        return lax.scan(one, state, stacked_batches, length=num_steps,
                        unroll=unroll)

    return fused


def stack_batches(batches):
    """Stack a list of same-shape batches into a [K, ...] pytree for scan.

    Static kernel flags are AND-normalized first: a scan body is traced once,
    so every stacked batch must satisfy the plan the trace commits to. The
    src band upgrades to the stack's max (upgrade_src_band re-clamps plans)."""
    from cartnet_tpu.data.batching import upgrade_src_band
    fuse = all(b.edge_fuse_ok for b in batches)
    seg = all(b.pallas_seg_ok for b in batches)
    band = max(b.src_band for b in batches)
    batches = [upgrade_src_band(b, band) for b in batches]
    batches = [b.replace(edge_fuse_ok=fuse, pallas_seg_ok=seg)
               for b in batches]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *batches)


def build_optimizer(cfg: Config, steps_per_epoch: int):
    total = reference_total_steps(cfg.optim.max_epoch, steps_per_epoch,
                                  cfg.optim.batch_accumulation)
    return make_optimizer(cfg.optim.lr, total, cfg.optim.warmup,
                          cfg.optim.div_factor, cfg.optim.final_div_factor,
                          cfg.optim.cycle_momentum, cfg.optim.base_momentum,
                          cfg.optim.max_momentum, cfg.optim.grad_clip)


def build_lr_fn(cfg: Config, steps_per_epoch: int) -> Callable:
    from cartnet_tpu.train.schedule import onecycle_lr
    total = reference_total_steps(cfg.optim.max_epoch, steps_per_epoch,
                                  cfg.optim.batch_accumulation)
    return onecycle_lr(cfg.optim.lr, total, cfg.optim.warmup,
                       cfg.optim.div_factor, cfg.optim.final_div_factor)
