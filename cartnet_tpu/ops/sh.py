"""Real spherical harmonics l<=2 and the minimal tensor-product contractions.

Native replacement for e3nn ``o3.spherical_harmonics`` / ``o3.FullyConnected-
TensorProduct`` as used by the eComformer equivariant block
(/root/reference/models/comformer_conv.py:206,271): irreps 1x0e+1x1o+1x2e with
'component' normalization (each SH component has unit second moment over the
sphere) and pre-normalized input directions.

Because both tensor products in the block only combine scalars with SH
(0e ⊗ l -> l) or contract equal-l pairs (l ⊗ l -> 0e), the only
Clebsch-Gordan data needed are products and dot-contractions — implemented in
models/equivariant.py as closed forms; no general CG tables.

NB: values match e3nn's component-normalized real SH exactly for l=0 and l=2
(same component order); for l=1 e3nn orders components (y, z, x) where we use
(x, y, z) — a fixed basis permutation that is absorbed into the learned TP
weights (they never index m; see models/equivariant.py) and leaves the
computed function identical. TP path constants are e3nn-exact (derived in
models/equivariant.py docstrings, oracle-checked in
tests/test_comformer_torch_parity.py).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

SQRT3 = math.sqrt(3.0)
SQRT5 = math.sqrt(5.0)
SQRT15 = math.sqrt(15.0)


def spherical_harmonics_l012(vec, normalize: bool = True, eps: float = 1e-12):
    """[..., 3] directions -> (y0 [..., 1], y1 [..., 3], y2 [..., 5]).

    Component normalization: E[y_lm^2] = 1 over the uniform sphere.
    """
    if normalize:
        n = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True))
        vec = vec / jnp.maximum(n, eps)
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    y0 = jnp.ones_like(x)[..., None]
    y1 = SQRT3 * vec
    y2 = jnp.stack([
        SQRT15 * x * y,
        SQRT15 * y * z,
        (SQRT5 / 2.0) * (3.0 * z * z - 1.0),
        SQRT15 * x * z,
        (SQRT15 / 2.0) * (x * x - y * y),
    ], axis=-1)
    return y0, y1, y2
