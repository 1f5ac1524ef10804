"""Masked BatchNorm1d with PyTorch-parity semantics.

The reference applies ``nn.BatchNorm1d`` to exactly the real edges/nodes of a
dynamically batched graph (/root/reference/models/cartnet.py:198-199,238,269).
On TPU we batch to static padded shapes, so the batch statistics MUST be
computed over real elements only — padding must not pollute the mean/var.
This is the single subtlest parity hazard of the rebuild (SURVEY.md §7).

PyTorch semantics mirrored exactly:
  * train: normalize by biased batch variance (divide by n);
  * running stats: ``running = (1-momentum)*running + momentum*batch``, where
    the variance contribution is the *unbiased* estimate (n/(n-1));
  * eval: normalize by running stats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_norm_init(dim: int, dtype=jnp.float32):
    params = {"gamma": jnp.ones((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype),
             "count": jnp.zeros((), jnp.int32)}
    return params, state


def combine_window_moments(gamma, beta, s1w, m2w, n_w, *, eps: float = 1e-5,
                           axis_names=()):
    """Differentiable core of bn_scale_shift_from_window_moments: per-window
    Welford partials -> BN (scale, shift). Factored so the merged-backward
    edge/sigma op can jax.vjp it (ops/pallas/edge_kernels.py). ``n_w``
    [nt, 1] real-edge counts per window (non-differentiable)."""
    n = jnp.sum(n_w)
    s1 = jnp.sum(s1w, axis=0)
    if axis_names:
        n = jax.lax.psum(n, axis_names)
        s1 = jax.lax.psum(s1, axis_names)
    n = jnp.maximum(n, 1.0)
    mean = s1 / n
    mean_w = s1w / jnp.maximum(n_w, 1.0)
    m2 = jnp.sum(m2w + n_w * jnp.square(mean_w - mean), axis=0)
    if axis_names:
        m2 = jax.lax.psum(m2, axis_names)
    var = m2 / n
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    scale = gamma * inv
    shift = beta - mean * scale
    return (scale, shift), (mean, var, n)


def bn_state_update(state, mean, var, n, momentum: float = 0.1):
    """Running-stat update from batch moments (PyTorch momentum semantics,
    unbiased variance) — the stop-gradient tail shared by the scale/shift
    helpers and the merged edge/sigma op."""
    sg = jax.lax.stop_gradient
    unbiased = sg(var) * (n / jnp.maximum(n - 1.0, 1.0))
    return {
        "mean": (1.0 - momentum) * state["mean"] + momentum * sg(mean),
        "var": (1.0 - momentum) * state["var"] + momentum * unbiased,
        "count": state["count"] + 1,
    }


def masked_bn_scale_shift(params, state, x, mask, *, training: bool,
                          momentum: float = 0.1, eps: float = 1e-5,
                          axis_names=()):
    """BN as an affine (scale, shift) pair + updated running stats.

    y = x*scale + shift ≡ masked_batch_norm(x). Lets fused kernels apply the
    normalize inside a Pallas pass while keeping the train-mode backward
    exact: mean/var here are differentiable functions of x, so cotangents
    through scale/shift reproduce the full BN gradient coupling.
    """
    if not training:
        inv = jnp.reciprocal(jnp.sqrt(state["var"] + eps))
        scale = params["gamma"] * inv
        return scale, params["beta"] - state["mean"] * scale, state

    xf = x.astype(jnp.float32)
    m = mask.astype(jnp.float32)[:, None]
    n = jnp.sum(m)
    s1 = jnp.sum(xf * m, axis=0)
    if axis_names:
        n = jax.lax.psum(n, axis_names)
        s1 = jax.lax.psum(s1, axis_names)
    n = jnp.maximum(n, 1.0)
    mean = s1 / n
    diff = (xf - mean) * m
    s2 = jnp.sum(diff * diff, axis=0)
    if axis_names:
        s2 = jax.lax.psum(s2, axis_names)
    var = s2 / n
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    scale = params["gamma"] * inv
    shift = params["beta"] - mean * scale
    sg = jax.lax.stop_gradient
    unbiased = sg(var) * (n / jnp.maximum(n - 1.0, 1.0))
    new_state = {
        "mean": (1.0 - momentum) * state["mean"] + momentum * sg(mean),
        "var": (1.0 - momentum) * state["var"] + momentum * unbiased,
        "count": state["count"] + 1,
    }
    return scale, shift, new_state


def bn_scale_shift_from_window_moments(params, state, s1w, m2w, mask, *,
                                       momentum: float = 0.1,
                                       eps: float = 1e-5, axis_names=()):
    """Train-mode BN scale/shift from per-window Welford partials.

    ``s1w``/``m2w`` [nt, d] are the fused edge kernel's masked per-window
    partials (sum and centered sumsq of gate); ``mask`` [nt*T] the edge
    mask. Combines with the exact group-merge formula
        M2 = sum_w M2_w + sum_w n_w (mean_w - mean)^2
    (every term non-negative — no cancellation, unlike E[x^2]-mean^2),
    reproducing masked_bn_scale_shift's mean/var to f32 rounding while
    skipping both [E, d] moment read passes. Differentiable in s1w/m2w; the
    kernel's custom VJP folds those cotangents into its dgate. Sync-BN:
    window partials are member-local under shard_map; both reductions psum
    over ``axis_names`` exactly like the two-pass path.
    """
    nt = s1w.shape[0]
    n_w = mask.reshape(nt, -1).sum(axis=1, dtype=jnp.float32)[:, None]
    (scale, shift), (mean, var, n) = combine_window_moments(
        params["gamma"], params["beta"], s1w, m2w, n_w, eps=eps,
        axis_names=tuple(axis_names))
    sg = jax.lax.stop_gradient
    unbiased = sg(var) * (n / jnp.maximum(n - 1.0, 1.0))
    new_state = {
        "mean": (1.0 - momentum) * state["mean"] + momentum * sg(mean),
        "var": (1.0 - momentum) * state["var"] + momentum * unbiased,
        "count": state["count"] + 1,
    }
    return scale, shift, new_state


def masked_batch_norm(params, state, x, mask, *, training: bool,
                      momentum: float = 0.1, eps: float = 1e-5,
                      axis_names=()):
    """Apply masked batch norm.

    Args:
        x: [M, D] features (padded).
        mask: [M] bool — True for real rows.
        training: python bool (static under jit).
        axis_names: mesh axes (inside shard_map) over which batch moments are
            reduced — "sync BN" so a sharded batch sees the same statistics a
            single-device run would.

    Returns:
        (y, new_state). In eval mode new_state is state unchanged.
    """
    if not training:
        inv = jnp.reciprocal(jnp.sqrt(state["var"] + eps))
        y = (x - state["mean"]) * inv * params["gamma"] + params["beta"]
        return y, state

    # batch moments always in f32 (bf16 sums over 10^4+ elements lose bits)
    xf = x.astype(jnp.float32)
    m = mask.astype(jnp.float32)[:, None]
    n = jnp.sum(m)
    s1 = jnp.sum(xf * m, axis=0)
    if axis_names:
        n = jax.lax.psum(n, axis_names)
        s1 = jax.lax.psum(s1, axis_names)
    n = jnp.maximum(n, 1.0)
    mean = s1 / n
    diff = (xf - mean) * m
    s2 = jnp.sum(diff * diff, axis=0)
    if axis_names:
        s2 = jax.lax.psum(s2, axis_names)
    var = s2 / n  # biased, used for normalization
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    y = ((xf - mean) * inv).astype(x.dtype) * params["gamma"] + params["beta"]

    unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
    new_state = {
        "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
        "var": (1.0 - momentum) * state["var"] + momentum * unbiased,
        "count": state["count"] + 1,
    }
    return y, new_state
