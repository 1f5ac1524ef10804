"""Unit tests for core ops: RBF/cutoff, masked BN, segment ops, 3x3 linalg.

Oracles are independent torch/numpy implementations of the reference formulas
(cited per test), NOT imports of the reference code.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cartnet_tpu.nn.norm import batch_norm_init, masked_batch_norm
from cartnet_tpu.ops import linalg3, rbf, segment
from cartnet_tpu.ops.rotations import random_rotation, rotate_adp_targets


def test_cosine_cutoff_values():
    # reference formula: 0.5*(cos(d*pi/r)+1) * (d < r)  (models/utils.py:88-91)
    d = np.array([0.0, 1.25, 2.5, 4.9999, 5.0, 7.0], np.float32)
    got = np.asarray(rbf.cosine_cutoff(jnp.asarray(d), 5.0))
    want = 0.5 * (np.cos(d * math.pi / 5.0) + 1.0) * (d < 5.0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got[-1] == 0.0 and got[-2] == 0.0


def test_exp_normal_smearing_matches_physnet_formula():
    # reference: models/utils.py:36-61 with trainable=False, lower=0, upper=r
    r, num_rbf = 5.0, 64
    d = np.linspace(0, 6, 37).astype(np.float32)
    means, betas = rbf.exp_normal_params(0.0, r, num_rbf)
    got = np.asarray(rbf.exp_normal_smearing(jnp.asarray(d), means, betas, r))

    start = math.exp(-r)
    means_np = np.linspace(start, 1, num_rbf)
    beta = (2 / num_rbf * (1 - start)) ** -2
    alpha = 5.0 / r
    env = 0.5 * (np.cos(d * math.pi / r) + 1.0) * (d < r)
    want = env[:, None] * np.exp(-beta * (np.exp(-alpha * d[:, None]) - means_np) ** 2)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-6)  # f32 vs f64 oracle


def test_rbf_expansion_gamma_is_reciprocal_lengthscale():
    # reference default branch gamma = 1/lengthscale (models/utils.py:118-119)
    centers, gamma = rbf.rbf_expansion_params(-4.0, 0.0, 17)
    ls = 4.0 / 16
    assert abs(gamma - 1.0 / ls) < 1e-6
    x = np.array([-3.3, -0.1], np.float32)
    got = np.asarray(rbf.rbf_expansion(jnp.asarray(x), centers, gamma))
    want = np.exp(-gamma * (x[:, None] - np.asarray(centers)) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("training", [True, False])
def test_masked_batch_norm_matches_torch(training):
    rng = np.random.default_rng(0)
    n_real, n_pad, d = 37, 27, 16
    x_real = rng.normal(size=(n_real, d)).astype(np.float32)
    x = np.concatenate([x_real, rng.normal(size=(n_pad, d)).astype(np.float32) * 50])
    mask = np.zeros(n_real + n_pad, bool)
    mask[:n_real] = True

    params, state = batch_norm_init(d)
    # advance running stats once so eval isn't trivially identity
    warm = rng.normal(size=(n_real, d)).astype(np.float32) * 2 + 1
    warm_pad = np.concatenate([warm, np.zeros((n_pad, d), np.float32)])
    _, state = masked_batch_norm(params, state, jnp.asarray(warm_pad),
                                 jnp.asarray(mask), training=True)

    tbn = torch.nn.BatchNorm1d(d)
    tbn.train()
    tbn(torch.tensor(warm))  # same warmup
    tbn.train(training)
    want = tbn(torch.tensor(x_real)).detach().numpy()

    y, new_state = masked_batch_norm(params, state, jnp.asarray(x),
                                     jnp.asarray(mask), training=training)
    np.testing.assert_allclose(np.asarray(y)[:n_real], want, rtol=2e-4, atol=2e-5)
    if training:
        np.testing.assert_allclose(np.asarray(new_state["mean"]),
                                   tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_state["var"]),
                                   tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_masked_segment_ops():
    vals = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    ids = jnp.asarray([0, 0, 1, 2, 2, 0])  # last row is padding with junk id
    mask = jnp.asarray([True, True, True, True, True, False])
    s = np.asarray(segment.masked_segment_sum(vals, ids, mask, 4))
    np.testing.assert_allclose(s[0], [0 + 2, 1 + 3])
    np.testing.assert_allclose(s[1], [4, 5])
    np.testing.assert_allclose(s[2], [6 + 8, 7 + 9])
    np.testing.assert_allclose(s[3], [0, 0])
    m = np.asarray(segment.masked_segment_mean(vals, ids, mask, 4))
    np.testing.assert_allclose(m[2], [7, 8])
    np.testing.assert_allclose(m[3], [0, 0])  # empty segment pad-safe


def test_linalg3_det_inv_norm():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(11, 3, 3)).astype(np.float64)
    a = m @ m.transpose(0, 2, 1) + 0.5 * np.eye(3)
    np.testing.assert_allclose(np.asarray(linalg3.det3(jnp.asarray(a))),
                               np.linalg.det(a), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(linalg3.inv3(jnp.asarray(a))),
                               np.linalg.inv(a), rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(linalg3.frobenius3(jnp.asarray(a))),
                               np.linalg.norm(a, axis=(1, 2)), rtol=1e-6)


def test_cholesky_assembly_spd():
    rng = np.random.default_rng(2)
    diag = jnp.asarray(np.abs(rng.normal(size=(9, 3))).astype(np.float32) + 0.1)
    off = jnp.asarray(rng.normal(size=(9, 3)).astype(np.float32))
    u = np.asarray(linalg3.assemble_cholesky_upper(diag, off))
    np.testing.assert_allclose(u, u.transpose(0, 2, 1), atol=1e-6)  # symmetric
    assert (np.linalg.eigvalsh(u) > 0).all()  # positive definite
    # parity with explicit torch construction (models/cartnet.py:298-303)
    L = torch.zeros(9, 3, 3)
    L[:, [0, 1, 2], [0, 1, 2]] = torch.tensor(np.asarray(diag))
    L[:, [0, 0, 1], [1, 2, 2]] = torch.tensor(np.asarray(off))
    want = torch.bmm(L.transpose(1, 2), L).numpy()
    np.testing.assert_allclose(u, want, rtol=1e-5, atol=1e-6)


def test_random_rotation_is_orthonormal_and_uniformish():
    R = np.asarray(random_rotation(jax.random.key(0), (256,)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (256, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(256), atol=1e-5)
    # mean of a uniformly rotated fixed vector ~ 0
    v = R @ np.array([1.0, 0, 0])
    assert np.abs(v.mean(0)).max() < 0.15


def test_rotate_adp_targets_conjugation():
    rng = np.random.default_rng(3)
    y = rng.normal(size=(5, 3, 3)).astype(np.float32)
    R = np.asarray(random_rotation(jax.random.key(1)))
    got = np.asarray(rotate_adp_targets(jnp.asarray(y), jnp.asarray(R)))
    want = np.einsum("ji,njk,kl->nil", R, y, R)  # RᵀUR (main.py:97)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
