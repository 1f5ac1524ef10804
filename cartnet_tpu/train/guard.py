"""Failure detection and elastic recovery (SURVEY.md §5).

The reference has no failure handling at all: a single NaN loss poisons the
optimizer state and the remaining epochs silently train garbage
(/root/reference/train/train.py:183-189 applies every step unconditionally).
For long multi-chip TPU runs this subsystem provides three layers:

1. **Device-side step guard** (zero host syncs): every micro-step checks
   loss/grad finiteness ON DEVICE; a non-finite step contributes zero
   gradient, leaves BN running stats untouched, does not advance the
   accumulation cadence, and increments ``TrainState.bad_steps``. The train
   loop stays a single fused launch — the guard is a few scalar ops fused
   into the step.
2. **Host-side divergence recovery**: after each epoch the runner inspects
   the epoch's bad-step delta and the val metric; a non-finite val MAE or a
   bad-step fraction above ``GuardConfig.max_bad_fraction`` triggers a
   rollback to the last good checkpoint with a freshly folded RNG (so the
   retry sees different shuffles/augmentations), up to
   ``GuardConfig.max_retries`` times per run.
3. **Heartbeat**: an atomic JSON file (tmp+rename) updated from the epoch
   loop with {time, epoch, step, status}; an external supervisor detects a
   hung process with ``is_stale`` without touching the training process.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- device side

def tree_all_finite(tree) -> jnp.ndarray:
    """Scalar bool: every element of every float leaf is finite."""
    leaves = [l for l in jax.tree.leaves(tree)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    oks = [jnp.all(jnp.isfinite(l)) for l in leaves]
    return jnp.stack(oks).all()


def guard_contribution(loss, grads, new_bn, old_bn):
    """Gate one micro-step's contribution on finiteness.

    Returns (ok, grads', bn') where a non-finite (loss or grads) step yields
    zero grads and the PREVIOUS BN running stats — the step becomes a no-op
    apart from the bad_steps counter.
    """
    ok = jnp.isfinite(loss) & tree_all_finite(grads)
    # select, NOT multiply: IEEE NaN/Inf * 0.0 = NaN, so a multiplicative mask
    # would write NaN into the grad accumulator exactly when the gradients
    # themselves are non-finite (the canonical bf16-overflow divergence this
    # guard exists for)
    grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
    bn = jax.tree.map(lambda a, b: jnp.where(ok, a, b), new_bn, old_bn)
    return ok, grads, bn


# ---------------------------------------------------------------- heartbeat

class Heartbeat:
    """Atomic heartbeat file writer with an optional background pulse.

    ``beat(**fields)`` writes immediately; ``start()`` additionally re-writes
    the last payload every ``interval`` seconds (bumping only ``time``) so a
    supervisor can distinguish "between epochs" from "hung inside a step"
    even when epochs are long.
    """

    def __init__(self, path: Optional[str], interval: float = 30.0):
        self.path = path
        self.interval = interval
        self._payload: Dict[str, Any] = {}
        self._lock = threading.Lock()  # beat() vs pulse-thread copy
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def beat(self, **fields):
        if not self.path:
            return
        with self._lock:
            self._payload = {**self._payload, **fields}  # atomic swap
        self._write()

    def _write(self):
        with self._lock:
            payload = {**self._payload, "time": time.time(),
                       "pid": os.getpid()}
        tmp = f"{self.path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self.path)  # atomic on POSIX

    def start(self):
        if not self.path or self._thread is not None:
            return
        self._stop.clear()

        def pulse():
            while not self._stop.wait(self.interval):
                try:
                    self._write()
                except Exception:  # a dead pulse = falsely-stale heartbeat
                    import logging
                    logging.exception("heartbeat pulse write failed")

        self._thread = threading.Thread(target=pulse, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None
        if self.path:
            self.beat(status="stopped")


def read_heartbeat(path: str) -> Optional[Dict[str, Any]]:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def is_stale(path: str, timeout: float, now: Optional[float] = None) -> bool:
    """True if the heartbeat is missing or older than ``timeout`` seconds."""
    hb = read_heartbeat(path)
    if hb is None or "time" not in hb:
        return True
    return ((now if now is not None else time.time()) - hb["time"]) > timeout


# ---------------------------------------------------------------- host side

class GuardMonitor:
    """Host-side divergence policy for the epoch loop.

    Call ``epoch_report`` once per epoch with the device counters; it returns
    True when the runner should roll back to the last good checkpoint. The
    monitor caps total rollbacks at ``max_retries`` — beyond that it raises,
    because endlessly retrying a diverging run burns chips.
    """

    def __init__(self, max_bad_fraction: float = 0.5, max_retries: int = 2,
                 initial_bad_steps: int = 0):
        # ``initial_bad_steps``: the restored TrainState.bad_steps on --resume;
        # without it the first epoch's bad delta would include the prior run's
        # cumulative count and could trigger a spurious rollback.
        self.max_bad_fraction = max_bad_fraction
        self.max_retries = max_retries
        self.retries = 0
        self._last_bad = int(initial_bad_steps)

    def epoch_report(self, bad_steps_total: int, micro_steps: int,
                     val_metric: float) -> bool:
        import math
        bad_delta = bad_steps_total - self._last_bad
        self._last_bad = bad_steps_total
        frac = bad_delta / max(micro_steps, 1)
        diverged = (not math.isfinite(val_metric)) or (
            frac > self.max_bad_fraction)
        if not diverged:
            return False
        if self.retries >= self.max_retries:
            raise RuntimeError(
                f"training diverged (bad-step fraction {frac:.2f}, val "
                f"{val_metric}) and retry budget ({self.max_retries}) is "
                "exhausted")
        self.retries += 1
        return True

    def note_rollback(self, bad_steps_total_after: int):
        """Re-base the bad-step delta after the state was restored."""
        self._last_bad = bad_steps_total_after
