"""Failure detection / elastic recovery (train/guard.py).

The reference has no failure handling (train/train.py applies every step
unconditionally); these tests pin the TPU build's guard semantics: non-finite
micro-steps are skipped device-side without poisoning params/BN/optimizer,
the heartbeat file is atomic and staleness-checkable, and the divergence
monitor rolls back a bounded number of times.
"""

import json
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartnet_tpu.config import (Config, DataConfig, GuardConfig, ModelConfig,
                                OptimConfig)
from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
from cartnet_tpu.train.guard import (GuardMonitor, Heartbeat, is_stale,
                                     read_heartbeat, tree_all_finite)
from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                    make_fused_steps, make_steps)

D, N, E, G = 128, 256, 4096, 3


def _cfg(**guard_kw):
    return Config(
        model=ModelConfig(dim_in=D, dim_rbf=16, num_layers=2, cholesky=False),
        data=DataConfig(max_nodes=N, max_edges=E, max_graphs=G),
        optim=OptimConfig(lr=1e-3, batch_accumulation=2),
        guard=GuardConfig(**guard_kw))


def _batches():
    recs = synthetic_dataset(G, mean_atoms=40, radius=5.0, adp=False, seed=3)
    good = collate(recs, N, E, G)
    bad_recs = [dict(r) for r in recs]
    bad_recs[1]["y"] = float("nan")  # poisons the loss of that micro-batch
    bad = collate(bad_recs, N, E, G)
    return jax.tree.map(jnp.asarray, good), jax.tree.map(jnp.asarray, bad)


def test_tree_all_finite():
    assert bool(tree_all_finite({"a": jnp.ones(3), "b": jnp.zeros(2)}))
    assert not bool(tree_all_finite({"a": jnp.array([1.0, jnp.nan])}))
    assert not bool(tree_all_finite({"a": jnp.array([jnp.inf])}))
    assert bool(tree_all_finite({"i": jnp.arange(3)}))  # ints ignored


def test_guard_contribution_nonfinite_grads():
    """Non-finite GRADIENTS (not just loss) must gate to exact zeros — a
    multiplicative mask would produce NaN (NaN*0=NaN) and permanently poison
    the accumulator (ADVICE r2, high)."""
    from cartnet_tpu.train.guard import guard_contribution
    grads = {"w": jnp.array([jnp.inf, 1.0]), "b": jnp.array([jnp.nan])}
    bn_new, bn_old = {"m": jnp.ones(2)}, {"m": jnp.zeros(2)}
    ok, g, bn = guard_contribution(jnp.asarray(0.5), grads, bn_new, bn_old)
    assert not bool(ok)
    np.testing.assert_array_equal(np.asarray(g["w"]), np.zeros(2))
    np.testing.assert_array_equal(np.asarray(g["b"]), np.zeros(1))
    np.testing.assert_array_equal(np.asarray(bn["m"]), np.zeros(2))
    # finite grads with a NaN loss are also gated
    ok2, g2, _ = guard_contribution(jnp.asarray(jnp.nan),
                                    {"w": jnp.ones(2)}, bn_new, bn_old)
    assert not bool(ok2)
    np.testing.assert_array_equal(np.asarray(g2["w"]), np.zeros(2))
    # a fully healthy step passes through untouched
    ok3, g3, bn3 = guard_contribution(jnp.asarray(0.1),
                                      {"w": jnp.ones(2)}, bn_new, bn_old)
    assert bool(ok3)
    np.testing.assert_array_equal(np.asarray(g3["w"]), np.ones(2))
    np.testing.assert_array_equal(np.asarray(bn3["m"]), np.ones(2))


def test_monitor_resume_baseline():
    """A resumed run's historic bad_steps must not count against the first
    epoch's bad fraction (ADVICE r2, medium)."""
    m = GuardMonitor(max_bad_fraction=0.5, max_retries=2,
                     initial_bad_steps=90)
    # healthy resumed epoch: 90 historic + 1 new bad out of 10 steps
    assert not m.epoch_report(bad_steps_total=91, micro_steps=10,
                              val_metric=1.0)


def test_micro_step_skips_nonfinite():
    cfg = _cfg(enabled=True)
    good, bad = _batches()
    opt = build_optimizer(cfg, 10)
    state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    micro, update, _ = make_steps(cfg, cartnet_apply, opt)

    state, _ = micro(state, good)
    accum_after_good = jax.tree.map(np.asarray, jax.device_get(
        state.grad_accum))
    bn_after_good = jax.device_get(state.bn_state)
    assert int(state.accum_count) == 1 and int(state.bad_steps) == 0

    state, stats = micro(state, bad)
    # the bad step contributed NOTHING: accumulator unchanged, BN unchanged,
    # cadence not advanced, bad counter bumped
    assert int(state.accum_count) == 1
    assert int(state.bad_steps) == 1
    for a, b in zip(jax.tree.leaves(accum_after_good),
                    jax.tree.leaves(jax.device_get(state.grad_accum))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(bn_after_good),
                    jax.tree.leaves(jax.device_get(state.bn_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the update after one more GOOD step produces finite params
    state, _ = micro(state, good)
    assert int(state.accum_count) == 2
    state = update(state)
    assert bool(tree_all_finite(state.params))


def test_fused_steps_guard_skips_nonfinite():
    cfg = _cfg(enabled=True)
    good, bad = _batches()
    opt = build_optimizer(cfg, 10)
    state = init_train_state(jax.random.key(1), cfg, cartnet_init, opt)
    fused = make_fused_steps(cfg, cartnet_apply, opt, 4)
    from cartnet_tpu.train.loop import stack_batches
    stacked = stack_batches([good, bad, good, bad])
    state, _ = fused(state, stacked)
    assert int(state.step) == 2          # only the good steps updated
    assert int(state.bad_steps) == 2
    assert bool(tree_all_finite(state.params))
    assert bool(tree_all_finite(state.bn_state))


def test_heartbeat_roundtrip(tmp_path):
    path = str(tmp_path / "hb.json")
    hb = Heartbeat(path, interval=999.0)
    hb.beat(status="training", epoch=3)
    data = read_heartbeat(path)
    assert data["status"] == "training" and data["epoch"] == 3
    assert not is_stale(path, timeout=60.0)
    assert is_stale(path, timeout=60.0, now=data["time"] + 61.0)
    assert is_stale(str(tmp_path / "missing.json"), timeout=60.0)
    hb.stop()
    assert read_heartbeat(path)["status"] == "stopped"


def test_monitor_rollback_policy():
    m = GuardMonitor(max_bad_fraction=0.5, max_retries=2)
    # healthy epoch
    assert not m.epoch_report(bad_steps_total=0, micro_steps=10,
                              val_metric=1.0)
    # NaN val -> rollback
    assert m.epoch_report(0, 10, float("nan"))
    m.note_rollback(0)
    # bad-step fraction above threshold -> rollback
    assert m.epoch_report(8, 10, 1.0)
    m.note_rollback(0)
    # retry budget exhausted -> raises
    with pytest.raises(RuntimeError):
        m.epoch_report(9, 10, float("inf"))


def test_train_run_recovers_from_poison_batch(tmp_path):
    """End-to-end: an epoch containing a NaN-target record completes with
    finite params and a nonzero bad_steps counter, and the heartbeat file
    reflects progress."""
    from cartnet_tpu.runner import train as run_train
    from cartnet_tpu.train.loop import make_steps as _
    recs = synthetic_dataset(6, mean_atoms=40, radius=5.0, adp=False, seed=7)
    recs[2]["y"] = float("nan")
    hb_path = str(tmp_path / "hb.json")
    cfg = Config(
        model=ModelConfig(dim_in=D, dim_rbf=16, num_layers=2, cholesky=False),
        data=DataConfig(name="synthetic", batch_size=3, max_nodes=N,
                        max_edges=E, max_graphs=3),
        optim=OptimConfig(lr=1e-3, max_epoch=2, batch_accumulation=2),
        guard=GuardConfig(enabled=True, heartbeat_path=hb_path,
                          max_bad_fraction=0.9),
        run_dir=str(tmp_path / "run"))
    from cartnet_tpu.runner import _pipelines
    # val/test use the clean tail (the poison record lives in train only)
    pipes = _pipelines(cfg, (recs, recs[3:], recs[3:]))
    from cartnet_tpu.models.factory import create_model
    model_init, model_apply = create_model(cfg.model)
    opt = build_optimizer(cfg, len(pipes[0]))
    state = init_train_state(jax.random.key(0), cfg, model_init, opt)
    state, test_stats = run_train(cfg, state, model_apply, opt, pipes)
    assert int(state.bad_steps) >= 1       # the poison batch was skipped
    assert bool(tree_all_finite(state.params))
    hb = read_heartbeat(hb_path)
    assert hb["status"] == "stopped"
