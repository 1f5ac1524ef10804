"""Multi-chip (8 virtual CPU devices) parity: sharded step == single-device.

The edge-partitioned shard_map step with sync BN must reproduce the
single-device forward/backward on the same crystals to float tolerance
(SURVEY.md §4.3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
from cartnet_tpu.parallel.mesh import make_mesh
from cartnet_tpu.parallel.step import make_parallel_steps, stack_for_shards
from cartnet_tpu.train.loop import build_optimizer, init_train_state, make_steps

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

DP, EP = 2, 4
N_PER, E_PER, G_PER = 64, 1024, 2


def _cfg(cholesky=False):
    return Config(
        model=ModelConfig(dim_in=16, dim_rbf=8, num_layers=2, cholesky=cholesky),
        data=DataConfig(max_nodes=N_PER, max_edges=E_PER, max_graphs=G_PER),
        optim=OptimConfig(lr=1e-3, max_epoch=2, batch_accumulation=1))


def _data(cholesky, seed=0):
    recs = synthetic_dataset(DP * G_PER, mean_atoms=10, adp=cholesky, seed=seed)
    shards = [collate(recs[i * G_PER:(i + 1) * G_PER], N_PER, E_PER, G_PER)
              for i in range(DP)]
    stacked = stack_for_shards(shards, ep=EP)
    merged = collate(recs, DP * N_PER, DP * E_PER, DP * G_PER)
    return stacked, merged


@pytest.mark.parametrize("cholesky", [False, True])
def test_parallel_micro_step_matches_single_device(cholesky):
    cfg = _cfg(cholesky)
    stacked, merged = _data(cholesky)
    mesh = make_mesh(DP, EP)
    opt = build_optimizer(cfg, 4)

    state_p = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    state_s = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)

    pmicro, pupdate, peval = make_parallel_steps(cfg, cartnet_apply, opt, mesh)
    smicro, supdate, seval = make_steps(cfg, cartnet_apply, opt)

    state_p, stats_p = pmicro(state_p, stacked)
    state_s, stats_s = smicro(state_s, merged)

    np.testing.assert_allclose(float(stats_p["loss"]), float(stats_s["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(stats_p["MAE"]), float(stats_s["MAE"]),
                               rtol=1e-4)
    # gradients must agree (f32 reduction-order noise across shards allowed)
    for gp, gs in zip(jax.tree.leaves(state_p.grad_accum),
                      jax.tree.leaves(state_s.grad_accum)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   rtol=1e-2, atol=2e-5)
    # BN running stats must agree (sync BN == one big batch)
    for bp, bs in zip(jax.tree.leaves(state_p.bn_state),
                      jax.tree.leaves(state_s.bn_state)):
        np.testing.assert_allclose(np.asarray(bp), np.asarray(bs),
                                   rtol=1e-4, atol=1e-6)

    # after one optimizer update, params still agree
    state_p = pupdate(state_p)
    state_s = supdate(state_s)
    # Adam normalizes by |g|, so reduction-order noise on near-zero grads
    # shows up at the lr=1e-3 update scale; bound by a fraction of one update.
    for pp, ps in zip(jax.tree.leaves(state_p.params),
                      jax.tree.leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(pp), np.asarray(ps),
                                   rtol=2e-2, atol=2e-4)


def test_parallel_eval_matches_single_device():
    cfg = _cfg(False)
    stacked, merged = _data(False, seed=1)
    mesh = make_mesh(DP, EP)
    opt = build_optimizer(cfg, 4)
    state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    _, _, peval = make_parallel_steps(cfg, cartnet_apply, opt, mesh)
    _, _, seval = make_steps(cfg, cartnet_apply, opt)

    pred_p, mask_p, stats_p = peval(state.params, state.bn_state, stacked)
    pred_s, mask_s, stats_s = seval(state.params, state.bn_state, merged)
    np.testing.assert_allclose(float(stats_p["MAE"]), float(stats_s["MAE"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pred_p)[np.asarray(mask_p)],
                               np.asarray(pred_s)[np.asarray(mask_s)],
                               rtol=1e-4, atol=1e-6)
