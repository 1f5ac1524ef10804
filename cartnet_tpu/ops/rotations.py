"""Uniform SO(3) sampling with jax.random.

Replaces ``roma.utils.random_rotmat`` (/root/reference/main.py:94,
dataset/datasetADP.py:34) with quaternion-based uniform rotations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_matrix(q):
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(q.shape[:-1] + (3, 3))


def random_rotation(key, shape=()):
    """Haar-uniform rotation matrices of shape ``shape + (3, 3)``."""
    q = jax.random.normal(key, shape + (4,))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quat_to_matrix(q)


def rotate_adp_targets(y, R):
    """U -> Rᵀ U R (the SO(3) equivariance contract, /root/reference/main.py:97)."""
    return jnp.einsum("ji,njk,kl->nil", R, y, R)
