"""e/iComformer + equivariant block behavior tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartnet_tpu.config import ModelConfig
from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models.comformer import (ecomformer_apply, ecomformer_init,
                                          icomformer_apply, icomformer_init)
from cartnet_tpu.ops.rotations import random_rotation
from cartnet_tpu.ops.sh import spherical_harmonics_l012


def _cfg(**kw):
    return ModelConfig(name="ecomformer", dim_in=32, dim_rbf=8, num_layers=2,
                       cholesky=True, **kw)


def _batch(max_nodes=96, max_edges=2048, max_graphs=4, seed=0, adp=True):
    recs = synthetic_dataset(3, mean_atoms=12, radius=5.0, adp=adp, seed=seed,
                             max_neighbors=12)
    return collate(recs, max_nodes, max_edges, max_graphs)


@pytest.mark.parametrize("init,apply", [(ecomformer_init, ecomformer_apply),
                                        (icomformer_init, icomformer_apply)])
def test_forward_shapes_and_finite(init, apply):
    cfg = _cfg()
    batch = _batch()
    params, state = init(jax.random.key(0), cfg)
    pred, mask, _ = apply(params, state, batch, cfg, training=False)
    assert pred.shape == (96, 3, 3)
    u = np.asarray(pred)[np.asarray(mask)]
    assert np.isfinite(u).all()
    np.testing.assert_allclose(u, u.transpose(0, 2, 1), atol=1e-5)  # SPD head


@pytest.mark.parametrize("init,apply", [(ecomformer_init, ecomformer_apply),
                                        (icomformer_init, icomformer_apply)])
@pytest.mark.parametrize("training", [False, True])
def test_padding_invariance(init, apply, training):
    cfg = _cfg()
    recs = synthetic_dataset(3, mean_atoms=12, radius=5.0, adp=True, seed=1,
                             max_neighbors=12)
    small = collate(recs, 96, 2048, 4)
    big = collate(recs, 160, 4096, 8)
    params, state = init(jax.random.key(0), cfg)
    p1, m1, _ = apply(params, state, small, cfg, training=training)
    p2, m2, _ = apply(params, state, big, cfg, training=training)
    np.testing.assert_allclose(np.asarray(p1)[np.asarray(m1)],
                               np.asarray(p2)[np.asarray(m2)],
                               rtol=5e-4, atol=1e-5)


def test_spherical_harmonics_rotation_equivariance():
    """y1 rotates by R itself; y2 by an orthogonal D2; y0 invariant."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=(50, 3)).astype(np.float64)
    R = np.asarray(random_rotation(jax.random.key(3)), np.float64)
    y0a, y1a, y2a = spherical_harmonics_l012(jnp.asarray(v @ R))
    y0b, y1b, y2b = spherical_harmonics_l012(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(y0a), np.asarray(y0b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y1a), np.asarray(y1b) @ R, atol=1e-5)
    # l=2: invariance of the norm and of pairwise dots (D2 orthogonal)
    na = np.linalg.norm(np.asarray(y2a), axis=1)
    nb = np.linalg.norm(np.asarray(y2b), axis=1)
    np.testing.assert_allclose(na, nb, rtol=1e-6)
    dots_a = np.asarray(y2a) @ np.asarray(y2a).T
    dots_b = np.asarray(y2b) @ np.asarray(y2b).T
    np.testing.assert_allclose(dots_a, dots_b, rtol=1e-5, atol=1e-6)


def test_ecomformer_rotation_invariance():
    """All eComformer features are invariant contractions -> rotating
    cart_dir (+cell) must leave predictions unchanged."""
    cfg = _cfg()
    batch = _batch(seed=2)
    params, state = ecomformer_init(jax.random.key(0), cfg)
    p1, m1, _ = ecomformer_apply(params, state, batch, cfg, training=False)
    R = jnp.asarray(np.asarray(random_rotation(jax.random.key(7)), np.float32))
    rot = batch.replace(cart_dir=batch.cart_dir @ R, cell=batch.cell @ R)
    p2, m2, _ = ecomformer_apply(params, state, rot, cfg, training=False)
    np.testing.assert_allclose(np.asarray(p1)[np.asarray(m1)],
                               np.asarray(p2)[np.asarray(m2)],
                               rtol=1e-3, atol=1e-5)


def test_icomformer_rotation_invariance():
    cfg = _cfg()
    batch = _batch(seed=3)
    params, state = icomformer_init(jax.random.key(0), cfg)
    p1, m1, _ = icomformer_apply(params, state, batch, cfg, training=False)
    R = jnp.asarray(np.asarray(random_rotation(jax.random.key(9)), np.float32))
    rot = batch.replace(cart_dir=batch.cart_dir @ R, cell=batch.cell @ R)
    p2, m2, _ = icomformer_apply(params, state, rot, cfg, training=False)
    np.testing.assert_allclose(np.asarray(p1)[np.asarray(m1)],
                               np.asarray(p2)[np.asarray(m2)],
                               rtol=1e-3, atol=1e-5)


def test_param_counts_reference_scale():
    """Reference reports 5.55M (eComformer) / 4.9M (iComformer) at dim 256
    (README.md:182-186). Ours omit the reference's dead params (lemb,
    lin_edge_len in conv_edge) so iComformer runs ~33k lighter."""
    cfg = ModelConfig(name="ecomformer", dim_in=256, cholesky=True)
    pe, _ = ecomformer_init(jax.random.key(0), cfg)
    ne = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(pe))
    assert 5.0e6 < ne < 6.1e6, ne
    pi, _ = icomformer_init(jax.random.key(0), cfg)
    ni = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(pi))
    assert 4.4e6 < ni < 5.4e6, ni
