"""Observability utilities: step timing, throughput counters, profiler traces.

The reference has no profiling beyond wall-clock epoch timers (SURVEY.md §5).
Here: a StepTimer that tracks edges/nodes/graphs-per-second (the BASELINE
primary metric is edges/sec/chip) and a jax.profiler trace context for xprof.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

import numpy as np


class StepTimer:
    """Rolling throughput counters for the train loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._edges: list = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, real_edges: int):
        if self._t0 is None:
            return
        self._times.append(time.perf_counter() - self._t0)
        self._edges.append(real_edges)
        if len(self._times) > self.window:
            self._times.pop(0)
            self._edges.pop(0)
        self._t0 = None

    @property
    def edges_per_sec(self) -> float:
        t = sum(self._times)
        return sum(self._edges) / t if t > 0 else 0.0

    @property
    def step_ms(self) -> float:
        return 1e3 * float(np.mean(self._times)) if self._times else 0.0

    def stats(self) -> Dict[str, float]:
        return {"edges_per_sec": self.edges_per_sec, "step_ms": self.step_ms}


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
    logging.info("profiler trace written to %s", log_dir)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host (DCN) initialization.

    Single-controller ``jax.distributed.initialize`` per host; afterwards
    ``jax.devices()`` spans the pod slice and the (dp, ep) mesh in
    parallel/mesh.py lays collectives out over ICI within a slice and DCN
    across slices. No-op when no coordinator is configured (single host).
    """
    if coordinator is None:
        return
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    logging.info("jax.distributed initialized: %d processes, %d devices",
                 jax.process_count(), len(jax.devices()))
