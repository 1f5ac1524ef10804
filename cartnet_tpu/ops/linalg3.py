"""Closed-form batched 3x3 linear algebra for ADP metric math.

Replaces torch.linalg.{det,inv,matrix_norm} on tiny matrices
(/root/reference/train/metrics.py:40,92-93,139,164) with vectorized closed
forms — no LAPACK, fully fusible by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def det3(a):
    """Determinant of [..., 3, 3]."""
    return (a[..., 0, 0] * (a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1])
            - a[..., 0, 1] * (a[..., 1, 0] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 0])
            + a[..., 0, 2] * (a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]))


def inv3(a):
    """Inverse of [..., 3, 3] via adjugate."""
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c02 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c10 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c20 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c21 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    adj = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c10, c11, c12], axis=-1),
        jnp.stack([c20, c21, c22], axis=-1),
    ], axis=-2)
    return adj / det3(a)[..., None, None]


def frobenius3(a):
    """Frobenius norm of [..., 3, 3] (torch.linalg.matrix_norm default)."""
    return jnp.sqrt(jnp.sum(a * a, axis=(-2, -1)))


def assemble_cholesky_upper(diag, offdiag):
    """Build upper-triangular L from head outputs; U = Lᵀ L is SPD.

    Mirrors the Cholesky head assembly (/root/reference/models/cartnet.py:296-303):
    L[0,0],L[1,1],L[2,2]=softplus(diag); L[0,1],L[0,2],L[1,2]=offdiag.
    """
    n = diag.shape[0]
    L = jnp.zeros((n, 3, 3), diag.dtype)
    L = L.at[:, 0, 0].set(diag[:, 0])
    L = L.at[:, 1, 1].set(diag[:, 1])
    L = L.at[:, 2, 2].set(diag[:, 2])
    L = L.at[:, 0, 1].set(offdiag[:, 0])
    L = L.at[:, 0, 2].set(offdiag[:, 1])
    L = L.at[:, 1, 2].set(offdiag[:, 2])
    return jnp.einsum("nji,njk->nik", L, L)  # LᵀL
