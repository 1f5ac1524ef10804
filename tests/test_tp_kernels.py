"""Fused TP-contraction Pallas kernels vs the jnp reference path.

The kernels compute the eComformer equivariant block's per-edge weight
generation + strided contraction (models/equivariant.py, re-designing
/root/reference/models/comformer_conv.py:197-280) without materializing the
[E, 5120] weights; these tests pin fwd and VJP against the straightforward
einsum formulation in interpret mode (CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartnet_tpu.ops.pallas.tp_kernels import (T_TP, tp_contract_l1,
                                               tp_contract_l2)


def _ref_l1(h, a, W, b):
    w = h @ W + b
    w0 = w[:, :4096].reshape(-1, 64, 64)
    w1 = w[:, 4096:4608].reshape(-1, 64, 8)
    w2 = w[:, 4608:].reshape(-1, 64, 8)
    bvm = lambda s, ww: jnp.einsum("eu,euv->ev", s, ww)
    return bvm(a, w0), bvm(a, w1), bvm(a, w2)


def _ref_l2(h, a0, a1, a2, W, b):
    w = h @ W + b
    w0 = w[:, :4096].reshape(-1, 64, 64)
    w1 = w[:, 4096:4608].reshape(-1, 8, 64)
    w2 = w[:, 4608:].reshape(-1, 8, 64)
    bvm = lambda s, ww: jnp.einsum("eu,euv->ev", s, ww)
    return bvm(a0, w0) + bvm(a1, w1) + bvm(a2, w2)


@pytest.fixture(scope="module")
def data():
    k = jax.random.split(jax.random.key(7), 6)
    E, C = 2 * T_TP, 128
    h = jax.random.normal(k[0], (E, C), jnp.float32)
    a0 = jax.random.normal(k[1], (E, 64), jnp.float32)
    a1 = jax.random.normal(k[2], (E, 8), jnp.float32)
    a2 = jax.random.normal(k[3], (E, 8), jnp.float32)
    W = jax.random.normal(k[4], (C, 5120), jnp.float32) * 0.05
    b = jax.random.normal(k[5], (5120,), jnp.float32) * 0.05
    return h, a0, a1, a2, W, b


def test_l1_forward(data):
    h, a0, _, _, W, b = data
    got = tp_contract_l1(h, a0, W, b, True)
    want = _ref_l1(h, a0, W, b)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)


def test_l1_grad(data):
    h, a0, _, _, W, b = data

    def loss_k(h, a, W, b):
        c0, c1, c2 = tp_contract_l1(h, a, W, b, True)
        return (jnp.sum(c0 * c0) + jnp.sum(jnp.sin(c1)) + jnp.sum(c2)) / 100

    def loss_r(h, a, W, b):
        c0, c1, c2 = _ref_l1(h, a, W, b)
        return (jnp.sum(c0 * c0) + jnp.sum(jnp.sin(c1)) + jnp.sum(c2)) / 100

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(h, a0, W, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(h, a0, W, b)
    for a, e in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-3, atol=2e-3)


def test_l2_forward(data):
    h, a0, a1, a2, W, b = data
    got = tp_contract_l2(h, a0, a1, a2, W, b, True)
    want = _ref_l2(h, a0, a1, a2, W, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_l2_grad(data):
    h, a0, a1, a2, W, b = data

    def loss(f):
        def inner(h, a0, a1, a2, W, b):
            out = f(h, a0, a1, a2, W, b)
            return jnp.sum(out * jnp.cos(out)) / 100
        return inner

    fk = loss(lambda *args: tp_contract_l2(*args, True))
    fr = loss(_ref_l2)
    gk = jax.grad(fk, argnums=tuple(range(6)))(h, a0, a1, a2, W, b)
    gr = jax.grad(fr, argnums=tuple(range(6)))(h, a0, a1, a2, W, b)
    for a, e in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-3, atol=2e-3)
