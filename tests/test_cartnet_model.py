"""CartNet model behavior: shapes, padding invariance, ablation switches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartnet_tpu.config import ModelConfig
from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init


def _make_batch(adp=True, max_nodes=96, max_edges=2048, max_graphs=4, seed=0):
    recs = synthetic_dataset(3, mean_atoms=16, radius=5.0, adp=adp, seed=seed)
    return collate(recs, max_nodes, max_edges, max_graphs), recs


@pytest.mark.parametrize("cholesky", [True, False])
def test_forward_shapes(cholesky):
    cfg = ModelConfig(dim_in=32, dim_rbf=8, num_layers=2, cholesky=cholesky)
    batch, _ = _make_batch(adp=cholesky)
    params, state = cartnet_init(jax.random.key(0), cfg)
    pred, mask, new_state = cartnet_apply(params, state, batch, cfg, training=False)
    if cholesky:
        assert pred.shape == (96, 3, 3)
        assert mask.shape == (96,)
    else:
        assert pred.shape == (4,)
        assert mask.shape == (4,)
    assert np.isfinite(np.asarray(pred)[np.asarray(mask)]).all()


@pytest.mark.parametrize("training", [False, True])
def test_padding_invariance(training):
    """Growing the pad region must not change real outputs (masked BN works)."""
    cfg = ModelConfig(dim_in=32, dim_rbf=8, num_layers=2, cholesky=True)
    recs = synthetic_dataset(3, mean_atoms=16, radius=5.0, adp=True, seed=1)
    small = collate(recs, 96, 2048, 4)
    big = collate(recs, 160, 4096, 8)
    params, state = cartnet_init(jax.random.key(0), cfg)
    p1, m1, s1 = cartnet_apply(params, state, small, cfg, training=training)
    p2, m2, s2 = cartnet_apply(params, state, big, cfg, training=training)
    r1 = np.asarray(p1)[np.asarray(m1)]
    r2 = np.asarray(p2)[np.asarray(m2)]
    np.testing.assert_allclose(r1, r2, rtol=2e-4, atol=1e-5)
    if training:  # BN batch stats must also be pad-independent
        for k in s1:
            np.testing.assert_allclose(np.asarray(s1[k]["bn"]["mean"]),
                                       np.asarray(s2[k]["bn"]["mean"]),
                                       rtol=2e-4, atol=1e-6)


def test_batch_order_invariance():
    """Permuting graphs in the batch must permute outputs only."""
    cfg = ModelConfig(dim_in=32, dim_rbf=8, num_layers=2, cholesky=False)
    recs = synthetic_dataset(3, mean_atoms=12, radius=5.0, adp=False, seed=2)
    b1 = collate(recs, 96, 2048, 4)
    b2 = collate(recs[::-1], 96, 2048, 4)
    params, state = cartnet_init(jax.random.key(0), cfg)
    p1, _, _ = cartnet_apply(params, state, b1, cfg, training=False)
    p2, _, _ = cartnet_apply(params, state, b2, cfg, training=False)
    np.testing.assert_allclose(np.asarray(p1)[:3], np.asarray(p2)[:3][::-1],
                               rtol=2e-4, atol=1e-5)


def test_invariant_mode_ignores_directions():
    cfg = ModelConfig(dim_in=32, dim_rbf=8, num_layers=2, cholesky=False,
                      invariant=True)
    batch, _ = _make_batch(adp=False, seed=3)
    params, state = cartnet_init(jax.random.key(0), cfg)
    p1, _, _ = cartnet_apply(params, state, batch, cfg, training=False)
    rot = batch.replace(cart_dir=batch.cart_dir @ jnp.asarray(
        np.linalg.qr(np.random.default_rng(0).normal(size=(3, 3)))[0],
        dtype=jnp.float32))
    p2, _, _ = cartnet_apply(params, state, rot, cfg, training=False)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-6)


def test_direction_sensitivity_when_not_invariant():
    """Directions feed the (non-invariant) edge encoder, so a generic linear
    map applied to cart_dir must change per-node features."""
    cfg = ModelConfig(dim_in=32, dim_rbf=8, num_layers=1, cholesky=True)
    batch, _ = _make_batch(adp=True, seed=4)
    params, state = cartnet_init(jax.random.key(0), cfg)
    p1, m, _ = cartnet_apply(params, state, batch, cfg, training=False)
    skew = jnp.asarray(np.array([[0.8, 0.6, 0.0], [-0.6, 0.8, 0.0],
                                 [0.0, 0.0, 1.0]], np.float32))
    p2, _, _ = cartnet_apply(params, state,
                             batch.replace(cart_dir=batch.cart_dir @ skew),
                             cfg, training=False)
    d = np.abs(np.asarray(p1)[np.asarray(m)] - np.asarray(p2)[np.asarray(m)])
    assert d.max() > 1e-4, d.max()


def test_ablation_switches_run():
    batch, _ = _make_batch(adp=False, seed=5)
    for kw in [dict(use_temperature=False), dict(use_atom_types=False),
               dict(use_temperature=False, use_atom_types=False),
               dict(use_envelope=False)]:
        cfg = ModelConfig(dim_in=16, dim_rbf=8, num_layers=1, cholesky=False, **kw)
        params, state = cartnet_init(jax.random.key(0), cfg)
        pred, mask, _ = cartnet_apply(params, state, batch, cfg, training=False)
        assert np.isfinite(np.asarray(pred)[np.asarray(mask)]).all()


def test_cholesky_predictions_are_spd():
    cfg = ModelConfig(dim_in=32, dim_rbf=8, num_layers=2, cholesky=True)
    batch, _ = _make_batch(adp=True, seed=6)
    params, state = cartnet_init(jax.random.key(0), cfg)
    pred, mask, _ = cartnet_apply(params, state, batch, cfg, training=False)
    u = np.asarray(pred)[np.asarray(mask)]
    np.testing.assert_allclose(u, u.transpose(0, 2, 1), atol=1e-5)
    assert (np.linalg.eigvalsh(u) > -1e-6).all()


def test_param_count_adp_config_matches_reference_scale():
    """Reference reports 2.5M params for ADP CartNet (README.md:182-186)."""
    cfg = ModelConfig(dim_in=256, dim_rbf=64, num_layers=4, cholesky=True)
    params, _ = cartnet_init(jax.random.key(0), cfg)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # rbf means/betas are buffers in the reference; subtract for comparison
    n -= 2 * cfg.dim_rbf
    assert 2.3e6 < n < 2.7e6, n
