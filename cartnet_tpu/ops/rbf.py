"""Radial basis and cutoff primitives (pure jnp, parity with reference math).

Reference behavior:
  * ExpNormalSmearing (PhysNet-style): /root/reference/models/utils.py:10-61,
    used with trainable=False by CartNet (/root/reference/models/cartnet.py:138).
  * CosineCutoff: /root/reference/models/utils.py:63-91 (cutoff_lower=0 path).
  * RBFExpansion (SchNet/Comformer-style): /root/reference/models/utils.py:96-129
    — NB the default branch sets gamma = 1/lengthscale (not 1/ls**2).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_cutoff(dist, cutoff_upper: float, cutoff_lower: float = 0.0):
    """Smooth cosine envelope, zero beyond the cutoff radius."""
    if cutoff_lower > 0:
        c = 0.5 * (jnp.cos(
            math.pi * (2.0 * (dist - cutoff_lower) / (cutoff_upper - cutoff_lower)
                       + 1.0)) + 1.0)
        c = c * (dist < cutoff_upper) * (dist > cutoff_lower)
        return c
    c = 0.5 * (jnp.cos(dist * math.pi / cutoff_upper) + 1.0)
    return c * (dist < cutoff_upper)


def exp_normal_params(cutoff_lower: float, cutoff_upper: float, num_rbf: int,
                      dtype=jnp.float32):
    """PhysNet-default means/betas (non-trainable buffers in CartNet)."""
    start = math.exp(-cutoff_upper + cutoff_lower)
    means = jnp.linspace(start, 1.0, num_rbf, dtype=dtype)
    beta = (2.0 / num_rbf * (1.0 - start)) ** -2
    betas = jnp.full((num_rbf,), beta, dtype=dtype)
    return means, betas


def exp_normal_smearing(dist, means, betas, cutoff_upper: float,
                        cutoff_lower: float = 0.0):
    """[..., num_rbf] expansion of distances, smoothly enveloped."""
    alpha = 5.0 / (cutoff_upper - cutoff_lower)
    d = dist[..., None]
    env = cosine_cutoff(d, cutoff_upper, cutoff_lower)
    return env * jnp.exp(-betas * (jnp.exp(alpha * (-d + cutoff_lower)) - means) ** 2)


def rbf_expansion_params(vmin: float, vmax: float, bins: int, dtype=jnp.float32):
    centers = jnp.linspace(vmin, vmax, bins, dtype=dtype)
    lengthscale = (vmax - vmin) / (bins - 1)
    gamma = 1.0 / lengthscale  # reference default branch: 1/lengthscale
    return centers, gamma


def rbf_expansion(x, centers, gamma):
    """Gaussian RBF expansion: [...,] -> [..., bins]."""
    return jnp.exp(-gamma * (x[..., None] - centers) ** 2)
