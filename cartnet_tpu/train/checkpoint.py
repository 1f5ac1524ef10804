"""Orbax checkpointing with true mid-training resume.

The reference saves only {model_state, optimizer_state} for the best epoch and
cannot resume a run (no scheduler/epoch/RNG state —
/root/reference/train/train.py:92-100, SURVEY.md §5). Here the full TrainState
(params, BN stats, optimizer state incl. schedule step, grad accumulator, RNG)
plus epoch/best-val metadata round-trips losslessly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from cartnet_tpu.train.state import TrainState


def save_checkpoint(path: str, state: TrainState, meta: Optional[Dict] = None):
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(int(state.step),
                 args=ocp.args.Composite(
                     state=ocp.args.StandardSave(state),
                     meta=ocp.args.JsonSave(meta or {})),
                 force=True)
        mgr.wait_until_finished()


def restore_checkpoint(path: str, template: TrainState
                       ) -> Tuple[TrainState, Dict]:
    """Restore the latest step; template provides structure/shapes/shardings.

    Checkpoints written before ``TrainState`` grew new leaves (e.g.
    ``bad_steps``) restore against a pruned template and the missing leaves
    are backfilled from ``template`` — old run dirs stay resumable.
    """
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        try:
            restored = mgr.restore(
                step, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(template),
                    meta=ocp.args.JsonRestore()))
            return restored["state"], restored["meta"] or {}
        except (ValueError, KeyError):
            # legacy layout: restore the raw pytree, overlay onto template
            restored = mgr.restore(
                step, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(),
                    meta=ocp.args.JsonRestore()))
    raw = restored["state"]
    fields = {k: jax.tree.map(lambda x: x, raw[k])
              for k in raw if hasattr(template, k)}
    return template.replace(**fields), restored["meta"] or {}


def latest_step(path: str) -> Optional[int]:
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    with ocp.CheckpointManager(path) as mgr:
        return mgr.latest_step()
