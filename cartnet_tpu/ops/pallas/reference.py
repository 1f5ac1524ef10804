"""Pure-jnp reference implementations of the Pallas kernels.

Why this exists: Pallas ``interpret=True`` evaluates the kernel body as a
jaxpr, and under ``shard_map``'s vma type checking the interpreter's internal
loop/slice machinery mixes varying and unvarying values and fails to
type-check (JAX 0.9: "dynamic_slice requires varying manual axes to match").
Compiled TPU kernels take the vma-tagged ``ShapeDtypeStruct`` path and are
unaffected — but this container can only exercise the SHARDED step on a
virtual CPU mesh, where interpret mode is the only option.

So each kernel family has a jnp twin with the exact same dtype/accumulation
semantics (one-hot MXU copies == exact gathers; f32 window accumulators ==
f32 segment sums). The call wrappers dispatch to the twin when
``interpret and inputs vary over mesh axes``; everywhere else (single-device
tests, real TPU) the genuine kernel runs. Kernel-body vs twin equality is
pinned by tests/test_pallas_segment.py + test_edge_kernel.py on empty-vma
inputs, so the sharded grad-equivalence tests compose transitively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- segsum

def segment_sum_sorted_window_ref(values, ids_eff, num_segments: int):
    """jnp twin of segment_kernels.segment_sum_sorted_window: pad ids
    (== num_segments) land in a spill row that is sliced off."""
    out = jax.ops.segment_sum(values, ids_eff,
                              num_segments=num_segments + 1,
                              indices_are_sorted=True)
    return out[:num_segments]


# ---------------------------------------------------------------- sigma

def sigma_fwd_ref(gate, scale, shift, env, sender, e_in, ids_eff,
                  num_segments: int):
    """jnp twin of _sigma_seg_kernel (same casts: f32 sigmoid chain, e_out in
    e_in.dtype, f32 aggregation of sender-dtype values)."""
    g = gate.astype(jnp.float32)
    a = g * scale.astype(jnp.float32) + shift.astype(jnp.float32)
    sig = jax.nn.sigmoid(a) * env.astype(jnp.float32)
    e_out = e_in + sig.astype(e_in.dtype)
    vals = (sig.astype(sender.dtype) * sender).astype(jnp.float32)
    aggr = jax.ops.segment_sum(vals, ids_eff, num_segments=num_segments + 1,
                               indices_are_sorted=True)[:num_segments]
    return e_out, aggr.astype(gate.dtype)


def sigma_bwd_ref(gate, scale, shift, env, sender, ids_eff, deout, daggr,
                  num_segments: int):
    """jnp twin of _sigma_seg_bwd_kernel."""
    dsigma = deout  # residual backward is identity
    g = gate.astype(jnp.float32)
    a = g * scale.astype(jnp.float32) + shift.astype(jnp.float32)
    sig0 = jax.nn.sigmoid(a)
    env32 = env.astype(jnp.float32)
    sig = sig0 * env32
    # spill row for pad ids, exactly like the kernel's daggr_full
    daggr_full = jnp.concatenate(
        [daggr, jnp.zeros((1, daggr.shape[1]), daggr.dtype)], axis=0)
    dvals = jnp.take(daggr_full, jnp.minimum(ids_eff, num_segments),
                     axis=0).astype(jnp.float32)
    sender32 = sender.astype(jnp.float32)
    dsender = (dvals * sig).astype(sender.dtype)
    dsig = dsigma.astype(jnp.float32) + dvals * sender32
    denv = jnp.sum(dsig * sig0, axis=1, keepdims=True).astype(env.dtype)
    da = dsig * env32 * sig0 * (1.0 - sig0)
    dgate = (da * scale.astype(jnp.float32)).astype(gate.dtype)
    dscale = jnp.sum(da * g, axis=0)
    dshift = jnp.sum(da, axis=0)
    return dgate, dscale, dshift, denv, dsender


# ---------------------------------------------------------------- edge phase

def window_moments_ref(gate, emask):
    """jnp twin of the fwd kernel's per-window masked Welford partials
    (moments of the ROUNDED gate, f32 accumulation)."""
    from cartnet_tpu.ops.pallas.edge_kernels import T_EDGES
    e = gate.shape[0]
    nt = e // T_EDGES
    g = gate.astype(jnp.float32).reshape(nt, T_EDGES, -1)
    mf = emask.reshape(nt, T_EDGES, 1).astype(jnp.float32)
    n_w = jnp.sum(mf, axis=1)                               # [nt, 1]
    s1 = jnp.sum(g * mf, axis=1)                            # [nt, d]
    mean_w = s1 / jnp.maximum(n_w, 1.0)
    diff = (g - mean_w[:, None, :]) * mf
    m2 = jnp.sum(diff * diff, axis=1)
    return s1, m2


def edge_phase_fwd_ref(xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src,
                       emask):
    """jnp twin of _fwd_kernel. Pad edges whose endpoint falls outside the
    kernel's band get zero gathers there but real gathers here — those rows
    are masked from every loss path, so values and grads agree where it
    matters (see module docstring)."""
    cdt = xi.dtype
    d = w1g.shape[0]
    gi = jnp.take(xi, dst, axis=0).astype(jnp.float32)
    gj = jnp.take(xj, src, axis=0).astype(jnp.float32)
    ew = jnp.dot(e, we, preferred_element_type=jnp.float32)
    pre = gi + gj + ew + b.astype(jnp.float32)
    h = jax.nn.silu(pre).astype(cdt)
    gate = jnp.dot(h[:, :d], w1g,
                   preferred_element_type=jnp.float32) + b1g.astype(jnp.float32)
    sender = jnp.dot(h[:, d:], w1a,
                     preferred_element_type=jnp.float32) + b1a.astype(jnp.float32)
    gate_c = gate.astype(cdt)
    s1, m2 = window_moments_ref(gate_c, emask)
    return gate_c, sender.astype(cdt), pre.astype(cdt), s1, m2


def edge_phase_bwd_ref(xi, xj, e, we, w1g, w1a, dst, src, emask, pre_saved,
                       gate, meanw, ds1w, dm2w, dgate, dsender, deres):
    """jnp twin of _bwd_kernel (f32 accumulators, cdt matmul operands)."""
    from cartnet_tpu.ops.pallas.edge_kernels import T_EDGES
    cdt = xi.dtype
    d = w1g.shape[0]
    n_i, n_j = xi.shape[0], xj.shape[0]
    pre = pre_saved.astype(jnp.float32)
    h = jax.nn.silu(pre).astype(cdt)
    # fold the window-moment cotangents into dgate (see _bwd_kernel)
    nt = ds1w.shape[0]
    mf = emask.reshape(nt, T_EDGES, 1).astype(jnp.float32)
    g32 = gate.astype(jnp.float32).reshape(nt, T_EDGES, -1)
    corr = (ds1w.astype(jnp.float32)[:, None, :]
            + 2.0 * dm2w.astype(jnp.float32)[:, None, :]
            * (g32 - meanw.astype(jnp.float32)[:, None, :]))
    dg32 = dgate.astype(jnp.float32).reshape(nt, T_EDGES, -1) + mf * corr
    dg = dg32.reshape(gate.shape).astype(cdt)
    ds = dsender.astype(cdt)
    db1g = jnp.sum(dg, axis=0, dtype=jnp.float32)
    db1a = jnp.sum(ds, axis=0, dtype=jnp.float32)
    tt = (((0,), (0,)), ((), ()))
    nt_dims = (((1,), (1,)), ((), ()))  # distinct name: nt above is the window count
    dw1g = jax.lax.dot_general(h[:, :d], dg, tt,
                               preferred_element_type=jnp.float32)
    dw1a = jax.lax.dot_general(h[:, d:], ds, tt,
                               preferred_element_type=jnp.float32)
    dh_g = jax.lax.dot_general(dg, w1g, nt_dims,
                               preferred_element_type=jnp.float32)
    dh_a = jax.lax.dot_general(ds, w1a, nt_dims,
                               preferred_element_type=jnp.float32)
    dh = jnp.concatenate([dh_g, dh_a], axis=1)
    sig = jax.nn.sigmoid(pre)
    dpre = dh * (sig * (1.0 + pre * (1.0 - sig)))
    dpre_c = dpre.astype(cdt)
    db = jnp.sum(dpre, axis=0)
    de = (deres.astype(jnp.float32) + jax.lax.dot_general(
        dpre_c, we, nt_dims, preferred_element_type=jnp.float32)).astype(e.dtype)
    dwe = jax.lax.dot_general(e, dpre_c, tt,
                              preferred_element_type=jnp.float32)
    dpre32 = dpre_c.astype(jnp.float32)
    dxi = jax.ops.segment_sum(dpre32, dst, num_segments=n_i)
    dxj = jax.ops.segment_sum(dpre32, src, num_segments=n_j)
    return (de, dxi, dxj, dwe, db[None, :], dw1g, db1g[None, :],
            dw1a, db1a[None, :])
