"""Train state pytree: params, BN running stats, optimizer state, step, RNG.

Unlike the reference checkpoint (model+optimizer only, no scheduler/epoch/RNG
— /root/reference/train/train.py:92-100, no mid-run resume), this state is the
complete resumable description of a run.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Any
    bn_state: Any
    opt_state: Any
    grad_accum: Any          # summed micro-batch gradients (reference semantics:
                             # loss.backward() per iter, step every N iters —
                             # train/train.py:183-189 — sums, never averages)
    accum_count: jnp.ndarray  # [] int32 micro-batches accumulated
    step: jnp.ndarray         # [] int32 optimizer updates applied
    rng: jnp.ndarray          # jax PRNG key (for augmentation etc.)
    bad_steps: jnp.ndarray = 0  # [] int32 non-finite micro-steps skipped by
                                # the device-side guard (train/guard.py)
