"""Pallas TPU kernel: sorted segment-sum as windowed one-hot MXU matmuls.

The SpMM of message passing — scatter-add of [E, D] edge values into [N, D]
node rows — is the top cost of both directions of the CartNet train step
(xprof: XLA's scatter runs at ~100 GB/s, 2.9 ms/step at bench shapes). This
kernel exploits that edge ids are SORTED: any window of T consecutive edges
touches a narrow band of < C node rows, so each window's contribution is a
dense [C, T] one-hot x [T, D] matmul on the MXU, accumulated into a
VMEM-resident output at the window's row offset. No scatters anywhere.

Soundness condition (checked host-side at collate, data/batching._windows_ok):
every T-edge window's real ids span < C rows. Pad edges carry id==num_segments
and either fall outside the window (one-hot all-zero -> dropped) or land in
the [num_segments, num_segments+C) spill rows, which are sliced off — so pad
VALUES never need masking.

Cost: E*C*D*2 FLOPs on the MXU (~4.6 GFLOP at bench shapes ≈ 60 us) vs
~360 us for the XLA scatter path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartnet_tpu.ops.pallas.vma import psum_to, pvary_to, vma_union

import os as _os

T_EDGES = int(_os.environ.get("CARTNET_T_EDGES", "512"))  # edges per window
C_WINDOW = 256  # node-row band per window


def _seg_kernel(banded, lo_ref, ids_ref, val_ref, out_ref, *banded_scratch):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        if banded:
            out_buf, sem = banded_scratch
            _hbm_zero(out_ref, out_buf, sem)
        else:
            out_ref[:] = jnp.zeros_like(out_ref)

    lo = pl.multiple_of(lo_ref[t], 8)  # host-aligned to sublane multiple
    ids = ids_ref[t, :]  # [T] — ids resident as the full [nt, T] block
    cols = jax.lax.broadcasted_iota(jnp.int32, (C_WINDOW, T_EDGES), 0) + lo
    onehot = (cols == ids[None, :]).astype(val_ref.dtype)     # [C, T]
    partial = jnp.dot(onehot, val_ref[:, :],
                      preferred_element_type=jnp.float32)      # [C, D]
    if banded:
        out_buf, sem = banded_scratch
        _hbm_rmw(out_ref.at[pl.ds(lo, C_WINDOW), :], out_buf, sem,
                 partial.astype(out_ref.dtype))
    else:
        out_ref[pl.ds(lo, C_WINDOW), :] += partial.astype(out_ref.dtype)


def segment_sum_sorted_window(values, ids_eff, num_segments: int,
                              interpret: bool = False):
    """values [E, D] (E % T == 0), ids_eff [E] int32 ascending with pads set
    to num_segments -> [num_segments, D] sums. See module docstring."""
    E, D = values.shape
    assert E % T_EDGES == 0, E
    nt = E // T_EDGES
    # under shard_map each member calls this on its local windows; tag the
    # output with the union of the inputs' varying axes (ops/pallas/vma.py)
    vma = vma_union(values, ids_eff)
    if interpret and vma:
        # Pallas interpret mode cannot type-check under shard_map vma —
        # dispatch to the exact jnp twin (ops/pallas/reference.py)
        from cartnet_tpu.ops.pallas.reference import (
            segment_sum_sorted_window_ref)
        return segment_sum_sorted_window_ref(values, ids_eff, num_segments)
    values, ids_eff = pvary_to(values, vma), pvary_to(ids_eff, vma)
    # window base rows, aligned DOWN to the f32 sublane multiple (8) so the
    # dynamic accumulate offset is provably aligned for Mosaic
    lo = ((ids_eff[::T_EDGES] // 16) * 16).astype(jnp.int32)
    ids2d = ids_eff.reshape(nt, T_EDGES).astype(jnp.int32)

    banded = not seg_table_resident(num_segments, D)
    if banded:
        out_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((C_WINDOW, D), values.dtype),
                   pltpu.SemaphoreType.DMA(())]
    else:
        out_spec = pl.BlockSpec((num_segments + C_WINDOW, D),
                                lambda t, lo_ref: (0, 0))
        scratch = []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((nt, T_EDGES), lambda t, lo_ref: (0, 0)),
            pl.BlockSpec((T_EDGES, D), lambda t, lo_ref: (t, 0)),
        ],
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(_seg_kernel, banded),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_segments + C_WINDOW, D),
                                       values.dtype, vma=vma),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * E * C_WINDOW * D,
            bytes_accessed=E * D * values.dtype.itemsize + E * 4
            + (num_segments + C_WINDOW) * D * values.dtype.itemsize,
            transcendentals=0),
    )(lo, ids2d, values)
    return out[:num_segments]


def seg_table_resident(num_segments: int, dim: int) -> bool:
    """True when the [num_segments + C, dim] f32 aggregate fits comfortably
    VMEM-resident (fast path); otherwise the kernels run BANDED — the
    aggregate lives in HBM and each window read-modify-writes just its
    band (VMEM O(window), any N)."""
    vmem = (num_segments + C_WINDOW) * dim * 4 + 2 * T_EDGES * dim * 4
    return vmem < 10 * 1024 * 1024


def pallas_shapes_ok(num_edges: int, dim: int, num_segments: int) -> bool:
    """Static shape gate: window divisibility + lane alignment. No VMEM
    bound on num_segments — big aggregates switch to the banded HBM mode,
    which additionally needs a 128-row-chunkable table for the zero loop."""
    ok = num_edges % T_EDGES == 0 and dim % 128 == 0
    if ok and not seg_table_resident(num_segments, dim):
        ok = num_segments % 128 == 0
    return ok


def on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:  # no backend yet
        return False
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    return plat == "tpu" or "tpu" in kind


# ------------------------------------------------------------------ sigma
# Fused sigma chain + scatter + edge residual:
#   sigma = sigmoid(gate*scale + shift) * env
#   e_out = e_in + sigma                      (the layer's edge residual)
#   aggr  = segment_sum(sigma * sender)
# Replaces ~4 [E,d] elementwise HBM round trips per layer (xprof: the
# BN->sigmoid->envelope->mult->residual loop fusions cost ~0.5 ms/step at
# bench shapes). BN batch statistics are computed OUTSIDE (masked moments are
# differentiable jnp ops), so the train-mode BN backward through mean/var
# composes automatically via the scale/shift cotangents this kernel emits.
# The residual's backward is free: d(e_in) = d(e_out), returned as the
# cotangent array itself — no kernel work, no extra HBM pass.
#
# ``c_window`` (static) is the scatter's node-row band per window: 256 for
# generic sorted batches (collate._windows_ok), 128 when the batch is
# graph-aligned (edge_fuse_ok — the edge kernel's C_DST=128 span check covers
# the same windows), halving the scatter one-hot MXU cost.


def _hbm_zero(ref, buf, sem, rows: int = 128):
    """Zero an HBM f32 ref by streaming a zeroed VMEM chunk over it."""
    buf[...] = jnp.zeros_like(buf)

    def zl(i, _):
        z = pltpu.make_async_copy(buf.at[pl.ds(0, rows), :],
                                  ref.at[pl.ds(i * rows, rows), :], sem)
        z.start()
        z.wait()
        return 0
    jax.lax.fori_loop(0, ref.shape[0] // rows, zl, 0)


def _hbm_rmw(hbm_slice, buf, sem, partial):
    """buf <- hbm_slice; buf += partial; hbm_slice <- buf. Sequential —
    consecutive windows' bands overlap, so no read-ahead is legal."""
    rd = pltpu.make_async_copy(hbm_slice, buf, sem)
    rd.start()
    rd.wait()
    buf[...] += partial
    wr = pltpu.make_async_copy(buf, hbm_slice, sem)
    wr.start()
    wr.wait()


def _sigma_seg_kernel(c_window, banded, lo_ref, ids_ref, gate_ref, scale_ref,
                      shift_ref, env_ref, sender_ref, ein_ref,
                      eout_ref, out_ref, *banded_scratch):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        if banded:
            out_buf, sem = banded_scratch
            _hbm_zero(out_ref, out_buf, sem)
        else:
            out_ref[...] = jnp.zeros_like(out_ref)

    lo = pl.multiple_of(lo_ref[t], 8)
    g = gate_ref[...].astype(jnp.float32)
    a = g * scale_ref[...] + shift_ref[...]
    sig = jax.nn.sigmoid(a) * env_ref[...].astype(jnp.float32)
    # residual add in the compute dtype — bitwise identical to the unfused
    # path's  e_out = e_in + sigma.astype(bf16)
    eout_ref[...] = ein_ref[...] + sig.astype(eout_ref.dtype)
    vals = (sig.astype(sender_ref.dtype) * sender_ref[...])
    ids = ids_ref[t, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, (c_window, T_EDGES), 0) + lo
    onehot = (cols == ids[None, :]).astype(vals.dtype)
    partial = jnp.dot(onehot, vals, preferred_element_type=jnp.float32)
    if banded:
        out_buf, sem = banded_scratch
        _hbm_rmw(out_ref.at[pl.ds(lo, c_window), :], out_buf, sem, partial)
    else:
        out_ref[pl.ds(lo, c_window), :] += partial.astype(out_ref.dtype)


def _sigma_seg_bwd_kernel(c_window, banded, lo_ref, ids_ref, gate_ref,
                          scale_ref, shift_ref, env_ref, sender_ref,
                          dsigma_ref, daggr_ref, dgate_ref, dscale_ref,
                          dshift_ref, denv_ref, dsender_ref,
                          *banded_scratch):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dshift_ref[...] = jnp.zeros_like(dshift_ref)

    lo = pl.multiple_of(lo_ref[t], 8)
    if banded:
        # daggr stays in HBM; double-buffered band reads (read-only — safe
        # to prefetch ahead, unlike the fwd RMW)
        dbuf, dsem = banded_scratch
        nt = pl.num_programs(0)

        def band_dma(slot, w):
            lw = pl.multiple_of(lo_ref[w], 8)
            return pltpu.make_async_copy(
                daggr_ref.at[pl.ds(lw, c_window), :], dbuf.at[slot],
                dsem.at[slot])

        @pl.when(t == 0)
        def _():
            band_dma(0, 0).start()

        @pl.when(t + 1 < nt)
        def _():
            band_dma((t + 1) % 2, t + 1).start()

        band_dma(t % 2, t).wait()
    g = gate_ref[...].astype(jnp.float32)
    a = g * scale_ref[...] + shift_ref[...]
    sig0 = jax.nn.sigmoid(a)
    env = env_ref[...].astype(jnp.float32)
    sig = sig0 * env
    ids = ids_ref[t, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, (T_EDGES, c_window), 1) + lo
    onehot = (cols == ids[:, None]).astype(daggr_ref.dtype)  # [T, C]
    dband = dbuf[t % 2] if banded else daggr_ref[pl.ds(lo, c_window), :]
    dvals = jnp.dot(onehot, dband,
                    preferred_element_type=jnp.float32)      # [T, d]
    sender = sender_ref[...].astype(jnp.float32)
    dsender_ref[...] = (dvals * sig).astype(dsender_ref.dtype)
    dsig = dsigma_ref[...].astype(jnp.float32) + dvals * sender
    denv_ref[...] = jnp.sum(dsig * sig0, axis=1,
                            keepdims=True).astype(denv_ref.dtype)
    da = dsig * env * sig0 * (1.0 - sig0)
    dgate_ref[...] = (da * scale_ref[...]).astype(dgate_ref.dtype)
    dscale_ref[...] += jnp.sum(da * g, axis=0)[None, :]
    dshift_ref[...] += jnp.sum(da, axis=0)[None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def sigma_segsum(gate, scale, shift, env, sender, e_in, ids_eff, lo,
                 num_segments: int, c_window: int = C_WINDOW,
                 interpret: bool = False):
    """Fused sigmoid-gate chain + edge residual + sorted windowed scatter.

    gate/sender/e_in [E, d]; scale/shift [d] (from masked BN stats +
    gamma/beta); env [E, 1] (CosineCutoff, or ones); ids_eff [E] dst ids with
    pads set to num_segments; lo [nt] window base rows; c_window static band
    width (real ids of every window must span < c_window rows above lo).
    Returns (e_out [E, d] = e_in + sigma, aggr [num_segments, d]).
    """
    return _sigma_fwd_call(gate, scale, shift, env, sender, e_in, ids_eff,
                           lo, num_segments, c_window, interpret)


def _sigma_fwd_call(gate, scale, shift, env, sender, e_in, ids_eff, lo,
                    num_segments, c_window, interpret=False):
    E, d = gate.shape
    nt = E // T_EDGES
    # uniform vma across operands (scale/shift are replicated BN params under
    # shard_map; the edge arrays vary over the mesh axes) — see vma.py
    vma = vma_union(gate, scale, shift, env, sender, e_in, ids_eff, lo)
    if interpret and vma:
        from cartnet_tpu.ops.pallas.reference import sigma_fwd_ref
        return sigma_fwd_ref(gate, scale, shift, env, sender, e_in,
                             ids_eff, num_segments)
    gate, scale, shift, env, sender, e_in, ids_eff, lo = (
        pvary_to(a, vma) for a in
        (gate, scale, shift, env, sender, e_in, ids_eff, lo))
    ids2d = ids_eff.reshape(nt, T_EDGES).astype(jnp.int32)
    win = lambda shape: pl.BlockSpec(shape, lambda t, lo: (t, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda t, lo: (0, 0))
    banded = not seg_table_resident(num_segments, d)
    if banded:
        out_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((c_window, d), jnp.float32),
                   pltpu.SemaphoreType.DMA(())]
    else:
        out_spec = pl.BlockSpec((num_segments + c_window, d),
                                lambda t, lo: (0, 0))
        scratch = []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[const((nt, T_EDGES)), win((T_EDGES, d)), const((1, d)),
                  const((1, d)), win((T_EDGES, 1)), win((T_EDGES, d)),
                  win((T_EDGES, d))],
        out_specs=[win((T_EDGES, d)), out_spec],
        scratch_shapes=scratch,
    )
    e_out, out = pl.pallas_call(
        functools.partial(_sigma_seg_kernel, c_window, banded),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E, d), e_in.dtype, vma=vma),
                   jax.ShapeDtypeStruct((num_segments + c_window, d),
                                        jnp.float32, vma=vma)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * E * c_window * d,
            bytes_accessed=E * d * 5 * gate.dtype.itemsize,
            transcendentals=E * d),
    )(lo, ids2d, gate, scale.reshape(1, -1).astype(jnp.float32),
      shift.reshape(1, -1).astype(jnp.float32), env, sender, e_in)
    return e_out, out[:num_segments].astype(gate.dtype)


def _sigma_fwd(gate, scale, shift, env, sender, e_in, ids_eff, lo,
               num_segments, c_window, interpret):
    out = _sigma_fwd_call(gate, scale, shift, env, sender, e_in, ids_eff, lo,
                          num_segments, c_window, interpret)
    return out, (gate, scale, shift, env, sender, ids_eff, lo)


def _sigma_bwd(num_segments, c_window, interpret, res, cts):
    import numpy as np
    gate, scale, shift, env, sender, ids_eff, lo = res
    deout, daggr = cts
    dsigma = deout  # e_out = e_in + sigma: the residual backward is identity
    E, d = gate.shape
    nt = E // T_EDGES
    vma = vma_union(gate, scale, shift, env, sender, ids_eff, lo, deout,
                    daggr)
    if interpret and vma:
        from cartnet_tpu.ops.pallas.reference import sigma_bwd_ref
        dgate, dscale, dshift, denv, dsender = sigma_bwd_ref(
            gate, scale, shift, env, sender, ids_eff, deout, daggr,
            num_segments)
        dgate = psum_to(dgate, gate, vma)
        dscale = psum_to(dscale, scale, vma)
        dshift = psum_to(dshift, shift, vma)
        denv = psum_to(denv, env, vma)
        dsender = psum_to(dsender, sender, vma)
        return (dgate, dscale.reshape(scale.shape).astype(scale.dtype),
                dshift.reshape(shift.shape).astype(shift.dtype), denv,
                dsender, deout,
                np.zeros(ids_eff.shape, jax.dtypes.float0),
                np.zeros(lo.shape, jax.dtypes.float0))
    gate_v, scale_v, shift_v, env_v, sender_v, ids_v, lo_v, dsigma, daggr = (
        pvary_to(a, vma) for a in
        (gate, scale, shift, env, sender, ids_eff, lo, dsigma, daggr))
    ids2d = ids_v.reshape(nt, T_EDGES).astype(jnp.int32)
    win = lambda shape: pl.BlockSpec(shape, lambda t, lo: (t, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda t, lo: (0, 0))
    banded = not seg_table_resident(num_segments, d)
    if banded:
        daggr_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((2, c_window, d), daggr.dtype),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        daggr_spec = pl.BlockSpec((num_segments + c_window, d),
                                  lambda t, lo: (0, 0))
        scratch = []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[const((nt, T_EDGES)), win((T_EDGES, d)), const((1, d)),
                  const((1, d)), win((T_EDGES, 1)), win((T_EDGES, d)),
                  win((T_EDGES, d)), daggr_spec],
        out_specs=[win((T_EDGES, d)), const((1, d)), const((1, d)),
                   win((T_EDGES, 1)), win((T_EDGES, d))],
        scratch_shapes=scratch,
    )
    # pad daggr into the spill region the forward sliced off
    daggr_full = jnp.zeros((num_segments + c_window, d), daggr.dtype)
    daggr_full = pvary_to(daggr_full, vma).at[:num_segments].set(daggr)
    dgate, dscale, dshift, denv, dsender = pl.pallas_call(
        functools.partial(_sigma_seg_bwd_kernel, c_window, banded),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E, d), gate.dtype, vma=vma),
                   jax.ShapeDtypeStruct((1, d), jnp.float32, vma=vma),
                   jax.ShapeDtypeStruct((1, d), jnp.float32, vma=vma),
                   jax.ShapeDtypeStruct((E, 1), env.dtype, vma=vma),
                   jax.ShapeDtypeStruct((E, d), sender.dtype, vma=vma)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * E * c_window * d,
            bytes_accessed=E * d * 6 * gate.dtype.itemsize,
            transcendentals=E * d),
    )(lo_v, ids2d, gate_v, scale_v.reshape(1, -1).astype(jnp.float32),
      shift_v.reshape(1, -1).astype(jnp.float32), env_v, sender_v, dsigma,
      daggr_full)
    # each cotangent must come back at its PRIMAL's vma: replicated params
    # (scale/shift under shard_map) accumulated per-member partial grads that
    # psum over the axes they were broadcast to; varying inputs are no-ops
    dgate = psum_to(dgate, gate, vma)
    dscale = psum_to(dscale, scale, vma)
    dshift = psum_to(dshift, shift, vma)
    denv = psum_to(denv, env, vma)
    dsender = psum_to(dsender, sender, vma)
    return (dgate, dscale.reshape(scale.shape).astype(scale.dtype),
            dshift.reshape(shift.shape).astype(shift.dtype), denv, dsender,
            deout,
            np.zeros(ids_eff.shape, jax.dtypes.float0),
            np.zeros(lo.shape, jax.dtypes.float0))


sigma_segsum.defvjp(_sigma_fwd, _sigma_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def masked_segment_sum_pallas(values, ids, mask, num_segments: int):
    """Differentiable masked sorted-segment-sum via the window kernel."""
    ids_eff = jnp.where(mask, ids, num_segments).astype(jnp.int32)
    return segment_sum_sorted_window(values, ids_eff, num_segments)


def _mssp_fwd(values, ids, mask, num_segments):
    out = masked_segment_sum_pallas(values, ids, mask, num_segments)
    return out, (ids, mask)


def _mssp_bwd(num_segments, res, ct):
    import numpy as np
    ids, mask = res
    safe = jnp.minimum(ids, num_segments - 1)
    ct_vals = jnp.take(ct, safe, axis=0) * mask[:, None].astype(ct.dtype)
    return (ct_vals, np.zeros(ids.shape, jax.dtypes.float0),
            np.zeros(mask.shape, jax.dtypes.float0))


masked_segment_sum_pallas.defvjp(_mssp_fwd, _mssp_bwd)
