"""OneCycle LR/momentum schedule with exact PyTorch-semantics parity.

The reference trains with ``torch.optim.lr_scheduler.OneCycleLR`` constructed
as ``OneCycleLR(opt, max_lr=cfg.lr, total_steps=max_epoch*len(loader)//accum
+ max_epoch, pct_start=cfg.warmup)`` (/root/reference/train/train.py:59).
PyTorch defaults mirrored here:

  * two-phase cosine anneal (three_phase=False),
  * initial_lr = max_lr/div_factor (25), min_lr = initial_lr/final_div_factor (1e4),
  * cycle_momentum=True: Adam's beta1 anneals max_momentum(0.95) ->
    base_momentum(0.85) during warmup and back afterwards.

The quirky ``+ max_epoch`` term in total_steps is reproduced by
``reference_total_steps`` — off-by-one here shifts the whole LR curve
(SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax


def reference_total_steps(max_epoch: int, steps_per_epoch: int,
                          batch_accumulation: int) -> int:
    """total_steps exactly as the reference computes it (train/train.py:59)."""
    return max_epoch * steps_per_epoch // batch_accumulation + max_epoch


def _cos_anneal(start: float, end: float, pct):
    return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))


def onecycle_lr(max_lr: float, total_steps: int, pct_start: float = 0.01,
                div_factor: float = 25.0, final_div_factor: float = 1e4
                ) -> Callable:
    """Returns optax-style schedule fn: step count -> lr."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    phase1_end = float(pct_start * total_steps) - 1.0
    phase2_end = float(total_steps) - 1.0

    def schedule(count):
        t = jnp.asarray(count, jnp.float32)
        t = jnp.minimum(t, phase2_end)
        pct1 = t / jnp.maximum(phase1_end, 1e-8)
        pct2 = (t - phase1_end) / jnp.maximum(phase2_end - phase1_end, 1e-8)
        up = _cos_anneal(initial_lr, max_lr, jnp.clip(pct1, 0.0, 1.0))
        down = _cos_anneal(max_lr, min_lr, jnp.clip(pct2, 0.0, 1.0))
        return jnp.where(t <= phase1_end, up, down)

    return schedule


def onecycle_beta1(total_steps: int, pct_start: float = 0.01,
                   base_momentum: float = 0.85, max_momentum: float = 0.95
                   ) -> Callable:
    """Adam beta1 cycling (PyTorch cycle_momentum=True default)."""
    phase1_end = float(pct_start * total_steps) - 1.0
    phase2_end = float(total_steps) - 1.0

    def schedule(count):
        t = jnp.asarray(count, jnp.float32)
        t = jnp.minimum(t, phase2_end)
        pct1 = t / jnp.maximum(phase1_end, 1e-8)
        pct2 = (t - phase1_end) / jnp.maximum(phase2_end - phase1_end, 1e-8)
        down = _cos_anneal(max_momentum, base_momentum, jnp.clip(pct1, 0.0, 1.0))
        up = _cos_anneal(base_momentum, max_momentum, jnp.clip(pct2, 0.0, 1.0))
        return jnp.where(t <= phase1_end, down, up)

    return schedule


def make_optimizer(max_lr: float, total_steps: int, pct_start: float = 0.01,
                   div_factor: float = 25.0, final_div_factor: float = 1e4,
                   cycle_momentum: bool = True, base_momentum: float = 0.85,
                   max_momentum: float = 0.95,
                   grad_clip=None) -> optax.GradientTransformation:
    """Adam + OneCycle, matching reference train/train.py:59 + main.py:208."""
    lr = onecycle_lr(max_lr, total_steps, pct_start, div_factor, final_div_factor)
    if cycle_momentum:
        b1 = onecycle_beta1(total_steps, pct_start, base_momentum, max_momentum)
        opt = optax.inject_hyperparams(
            lambda learning_rate, b1: optax.adam(learning_rate, b1=b1))(
                learning_rate=lr, b1=b1)
    else:
        opt = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    if grad_clip is not None:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt
