"""Comformer-family multi-chip parity (8 virtual CPU devices): the
(dp x ep) replicated-node edge-partitioned shard_map step must reproduce the
single-device forward/backward for eComformer (incl. the equivariant block's
ep mean recomputation) and iComformer (incl. the lattice edge features and
the edge-update layer) — VERDICT r4 weak #4."""

import numpy as np
import pytest

import jax

from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models.comformer import (ecomformer_apply, ecomformer_init,
                                          icomformer_apply, icomformer_init)
from cartnet_tpu.parallel.mesh import make_mesh
from cartnet_tpu.parallel.step import make_parallel_steps, stack_for_shards
from cartnet_tpu.train.loop import build_optimizer, init_train_state, make_steps

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

N_PER, E_PER, G_PER = 64, 1024, 2

MODELS = {"ecomformer": (ecomformer_init, ecomformer_apply),
          "icomformer": (icomformer_init, icomformer_apply)}


def _cfg(name):
    return Config(
        model=ModelConfig(name=name, dim_in=16, dim_rbf=8, num_layers=2,
                          cholesky=True),
        data=DataConfig(max_nodes=N_PER, max_edges=E_PER, max_graphs=G_PER),
        optim=OptimConfig(lr=1e-3, max_epoch=2, batch_accumulation=1))


def _data(dp, seed=0):
    recs = synthetic_dataset(dp * G_PER, mean_atoms=10, adp=True, seed=seed,
                             max_neighbors=14)
    shards = [collate(recs[i * G_PER:(i + 1) * G_PER], N_PER, E_PER, G_PER)
              for i in range(dp)]
    merged = collate(recs, dp * N_PER, dp * E_PER, dp * G_PER)
    return shards, merged


@pytest.mark.parametrize("name", list(MODELS))
@pytest.mark.parametrize("dp,ep", [(8, 1), (2, 4)])
def test_comformer_parallel_micro_matches_single_device(name, dp, ep):
    init_fn, apply_fn = MODELS[name]
    cfg = _cfg(name)
    shards, merged = _data(dp)
    stacked = stack_for_shards(shards, ep=ep)
    mesh = make_mesh(dp, ep)
    opt = build_optimizer(cfg, 4)

    state_p = init_train_state(jax.random.key(0), cfg, init_fn, opt)
    state_s = init_train_state(jax.random.key(0), cfg, init_fn, opt)

    pmicro, pupdate, _ = make_parallel_steps(cfg, apply_fn, opt, mesh)
    smicro, supdate, _ = make_steps(cfg, apply_fn, opt)

    state_p, stats_p = pmicro(state_p, stacked)
    state_s, stats_s = smicro(state_s, merged)

    np.testing.assert_allclose(float(stats_p["loss"]), float(stats_s["loss"]),
                               rtol=1e-4)
    # untrained Comformers emit O(100)-scale predictions (softplus residual
    # chains), so the f32 noise floor of the single-device reference
    # (masked_mae_mse computes in f32 by design) scales with the loss —
    # verified exact in f64: the sharded MAE matches a float64 hand
    # computation bit-for-bit while the single-device value carries the
    # f32 rounding. Absolute tolerances therefore scale with the loss.
    scale = max(1.0, float(stats_s["loss"]))
    for gp, gs in zip(jax.tree.leaves(state_p.grad_accum),
                      jax.tree.leaves(state_s.grad_accum)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   rtol=1e-2, atol=2e-5 * scale)
    for bp, bs in zip(jax.tree.leaves(state_p.bn_state),
                      jax.tree.leaves(state_s.bn_state)):
        np.testing.assert_allclose(np.asarray(bp), np.asarray(bs),
                                   rtol=1e-4, atol=1e-6 * scale)

    state_p = pupdate(state_p)
    state_s = supdate(state_s)
    # Adam normalizes by |g|: entries whose true gradient sits at the f32
    # noise floor (2e-5 * loss scale here) can step in OPPOSITE directions
    # on the two sides — up to two full lr-sized steps apart. Correctness is
    # pinned by the raw-gradient check above; this bound only guards against
    # systematic (device-count-scaled) errors.
    lr = cfg.optim.lr
    for pp, ps in zip(jax.tree.leaves(state_p.params),
                      jax.tree.leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(pp), np.asarray(ps),
                                   rtol=2e-2, atol=2.1 * lr)


@pytest.mark.parametrize("name", list(MODELS))
def test_comformer_parallel_eval_matches_single_device(name):
    init_fn, apply_fn = MODELS[name]
    cfg = _cfg(name)
    shards, merged = _data(2, seed=1)
    stacked = stack_for_shards(shards, ep=4)
    mesh = make_mesh(2, 4)
    opt = build_optimizer(cfg, 4)
    state = init_train_state(jax.random.key(0), cfg, init_fn, opt)
    _, _, peval = make_parallel_steps(cfg, apply_fn, opt, mesh)
    _, _, seval = make_steps(cfg, apply_fn, opt)

    pred_p, mask_p, stats_p = peval(state.params, state.bn_state, stacked)
    pred_s, mask_s, stats_s = seval(state.params, state.bn_state, merged)
    np.testing.assert_allclose(float(stats_p["MAE"]), float(stats_s["MAE"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pred_p)[np.asarray(mask_p)],
                               np.asarray(pred_s)[np.asarray(mask_s)],
                               rtol=1e-4, atol=1e-6)
