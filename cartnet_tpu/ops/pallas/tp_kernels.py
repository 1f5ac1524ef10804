"""Fused Pallas TPU kernels for the eComformer per-edge tensor product.

The equivariant block (models/equivariant.py, re-designing
/root/reference/models/comformer_conv.py:197-280) generates per-edge
tensor-product weights with an fc MLP and contracts them with gathered node
irreps:

    w_all = h @ W + b                 # [E, 5120]  (h = softplus(lin0(e)))
    c_p   = sum_u a_p[e, u] * w_p[e, u, w]   per TP path p

XLA cannot keep this chain on-chip: the [E, 5120] weight tensor and the
[E, 64, 64] broadcast products round-trip HBM (~172 MB each — xprof round 5:
2x ~545 us broadcast-multiply, 2x ~510 us activation slices, 2x ~490 us bias
reduces, and backward weight-gen GEMMs at 33-42% MXU). This kernel runs the
whole chain per T-edge tile in VMEM:

  * ONE weight-gen GEMM tiles [T, C] @ [C, 5120] on the MXU; per-path views
    are 128-aligned VMEM lane slices (offsets 0 / 4096 / 4608);
  * the strided per-edge contraction sum_u a[e,u] * wp[e, u*W+w] becomes two
    MXU matmuls against constant 0/1 matrices —
    expand:  a_exp = a @ R_rep   (R_rep[u, u*W+w] = 1)
    reduce:  c     = (wp * a_exp) @ R_sum  (R_sum[u*W+w, w'] = delta_{w w'})
    — no [E, U, W] tensor ever exists, in VMEM or HBM. The R matrices are
    PASSED as resident operands: building them per grid step from iota cost
    ~2-3 us/tile of VPU serial work (~40% of the fwd tile, first cut);
  * the backward recomputes w_all in VMEM (55 GFLOP is cheaper than a
    172 MB HBM round-trip) and accumulates dW / db in f32 VMEM across the
    grid.

Layer shapes (NS=64 scalar channels, NV=8 vector/tensor channels,
comformer_conv.py:235-236): layer 1 contracts one [E, 64] input against
paths (U=64 -> W=64, 8, 8); layer 2 contracts three inputs [E,64],[E,8],
[E,8] against paths (U=64,8,8 -> W=64) summed into one output. The SH outer
products and normalization constants stay outside in jnp (tiny elementwise).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartnet_tpu.ops.pallas.vma import psum_to, pvary_to, vma_union

T_TP = int(_os.environ.get("CARTNET_T_TP", "128"))  # edges per tile

# (U, W, lane offset) per TP path; 64*64 + 64*8 + 64*8 = 5120 fc lanes.
# Path 0 uses the (rr_a, rs_a) expansion/reduction pair, paths 1/2 share
# (rr_b, rs_b).
PATHS_L1 = ((64, 64, 0), (64, 8, 4096), (64, 8, 4608))
PATHS_L2 = ((64, 64, 0), (8, 64, 4096), (8, 64, 4608))
NUMEL = 5120


@functools.lru_cache(maxsize=None)
def _rrep_np(U, W):
    """[U, U*W] 0/1 expansion: (a @ R)[e, u*W+w] == a[e, u]."""
    r = np.zeros((U, U * W), np.float32)
    r[np.arange(U * W) // W, np.arange(U * W)] = 1.0
    return r


@functools.lru_cache(maxsize=None)
def _rsum_np(U, W):
    """[U*W, W] 0/1 reduction: (p @ R)[e, w] == sum_u p[e, u*W+w]."""
    r = np.zeros((U * W, W), np.float32)
    r[np.arange(U * W), np.arange(U * W) % W] = 1.0
    return r


def _rmats(paths, dtype):
    (U0, W0, _), (U1, W1, _) = paths[0], paths[1]
    return (jnp.asarray(_rrep_np(U0, W0), dtype),
            jnp.asarray(_rsum_np(U0, W0), dtype),
            jnp.asarray(_rrep_np(U1, W1), dtype),
            jnp.asarray(_rsum_np(U1, W1), dtype))


_DIMS_NT = (((1,), (1,)), ((), ()))   # contract minor x minor (B^T on rhs)
_DIMS_TT = (((0,), (0,)), ((), ()))   # contract major x major (A^T on lhs)


def _tp_fwd_kernel(paths, n_a, sum_out, h_ref, *refs):
    a_refs = refs[:n_a]
    W_ref, b_ref = refs[n_a], refs[n_a + 1]
    rr_a, rs_a, rr_b, rs_b = refs[n_a + 2:n_a + 6]
    out_refs = refs[n_a + 6:]
    cdt = h_ref.dtype
    h = h_ref[...]
    w_all = (jnp.dot(h, W_ref[...], preferred_element_type=jnp.float32)
             + b_ref[...]).astype(cdt)
    acc = None
    for i, (U, W, off) in enumerate(paths):
        rr, rs = (rr_a, rs_a) if i == 0 else (rr_b, rs_b)
        wp = w_all[:, off:off + U * W]
        a = a_refs[i if n_a > 1 else 0][...]
        a_exp = jnp.dot(a, rr[...],
                        preferred_element_type=jnp.float32).astype(cdt)
        c = jnp.dot(wp * a_exp, rs[...], preferred_element_type=jnp.float32)
        if sum_out:
            acc = c if acc is None else acc + c
        else:
            out_refs[i][...] = c.astype(out_refs[i].dtype)
    if sum_out:
        out_refs[0][...] = acc.astype(out_refs[0].dtype)


def _tp_bwd_kernel(paths, n_a, sum_out, h_ref, *refs):
    a_refs = refs[:n_a]
    W_ref, b_ref = refs[n_a], refs[n_a + 1]
    rr_a, rs_a, rr_b, rs_b = refs[n_a + 2:n_a + 6]
    n_dc = 1 if sum_out else len(paths)
    dc_refs = refs[n_a + 6:n_a + 6 + n_dc]
    dh_ref = refs[n_a + 6 + n_dc]
    da_refs = refs[n_a + 7 + n_dc:n_a + 7 + n_dc + n_a]
    dW_ref, db_ref = refs[n_a + 7 + n_dc + n_a], refs[n_a + 8 + n_dc + n_a]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dW_ref[...] = jnp.zeros_like(dW_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    cdt = h_ref.dtype
    h = h_ref[...]
    w_all = (jnp.dot(h, W_ref[...], preferred_element_type=jnp.float32)
             + b_ref[...]).astype(cdt)
    parts = []
    da_acc = [None] * n_a
    for i, (U, W, off) in enumerate(paths):
        rr, rs = (rr_a, rs_a) if i == 0 else (rr_b, rs_b)
        dc = dc_refs[0 if sum_out else i][...].astype(cdt)
        # dprod[e, u*W+w] = dc[e, w]
        dprod = jax.lax.dot_general(
            dc, rs[...], _DIMS_NT,
            preferred_element_type=jnp.float32).astype(cdt)
        wp = w_all[:, off:off + U * W]
        ai = i if n_a > 1 else 0
        a = a_refs[ai][...]
        a_exp = jnp.dot(a, rr[...],
                        preferred_element_type=jnp.float32).astype(cdt)
        da = jax.lax.dot_general(dprod * wp, rr[...], _DIMS_NT,
                                 preferred_element_type=jnp.float32)
        da_acc[ai] = da if da_acc[ai] is None else da_acc[ai] + da
        parts.append(dprod * a_exp)
    for ai in range(n_a):
        da_refs[ai][...] = da_acc[ai].astype(da_refs[ai].dtype)
    dwall = jnp.concatenate(parts, axis=1)                     # [T, 5120]
    dh_ref[...] = jax.lax.dot_general(
        dwall, W_ref[...], _DIMS_NT,
        preferred_element_type=jnp.float32).astype(dh_ref.dtype)
    dW_ref[...] += jax.lax.dot_general(h, dwall, _DIMS_TT,
                                       preferred_element_type=jnp.float32)
    db_ref[...] += jnp.sum(dwall.astype(jnp.float32), axis=0)[None, :]


def _const(shape):
    return pl.BlockSpec(shape, lambda t: (0, 0))


def _win(shape):
    return pl.BlockSpec(shape, lambda t: (t, 0))


def _common_args(paths, h, a_list, Wp, bp, vma):
    cdt = h.dtype
    rmats = _rmats(paths, cdt)
    args = [h] + list(a_list) + [Wp, bp.reshape(1, -1)] + list(rmats)
    args = [pvary_to(x, vma) for x in args]
    C = h.shape[1]
    in_specs = ([_win((T_TP, C))]
                + [_win((T_TP, a.shape[1])) for a in a_list]
                + [_const((C, NUMEL)), _const((1, NUMEL))]
                + [_const(r.shape) for r in rmats])
    return args, in_specs


def _fwd_call(paths, n_a, sum_out, h, a_list, Wp, bp, interpret):
    E, C = h.shape
    nt = E // T_TP
    cdt = h.dtype
    vma = vma_union(h, *a_list, Wp, bp)
    args, in_specs = _common_args(paths, h, a_list, Wp, bp, vma)
    if sum_out:
        out_specs = [_win((T_TP, paths[0][1]))]
        out_shape = [jax.ShapeDtypeStruct((E, paths[0][1]), cdt, vma=vma)]
    else:
        out_specs = [_win((T_TP, W)) for (_, W, _) in paths]
        out_shape = [jax.ShapeDtypeStruct((E, W), cdt, vma=vma)
                     for (_, W, _) in paths]
    flops = 2 * E * C * NUMEL + 4 * E * 64 * NUMEL
    outs = pl.pallas_call(
        functools.partial(_tp_fwd_kernel, paths, n_a, sum_out),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=E * (C + 192) * cdt.itemsize + C * NUMEL * 2,
            transcendentals=0),
    )(*args)
    return outs


def _bwd_call(paths, n_a, sum_out, h, a_list, Wp, bp, dc_list, interpret):
    E, C = h.shape
    nt = E // T_TP
    cdt = h.dtype
    vma = vma_union(h, *a_list, Wp, bp, *dc_list)
    args, in_specs = _common_args(paths, h, a_list, Wp, bp, vma)
    dcs = [pvary_to(dc.astype(cdt), vma) for dc in dc_list]
    args = args + dcs
    in_specs = in_specs + [_win((T_TP, dc.shape[1])) for dc in dcs]
    out_specs = ([_win((T_TP, C))]
                 + [_win((T_TP, a.shape[1])) for a in a_list]
                 + [_const((C, NUMEL)), _const((1, NUMEL))])
    out_shape = ([jax.ShapeDtypeStruct((E, C), cdt, vma=vma)]
                 + [jax.ShapeDtypeStruct((E, a.shape[1]), cdt, vma=vma)
                    for a in a_list]
                 + [jax.ShapeDtypeStruct((C, NUMEL), jnp.float32, vma=vma),
                    jax.ShapeDtypeStruct((1, NUMEL), jnp.float32, vma=vma)])
    flops = 3 * (2 * E * C * NUMEL) + 8 * E * 64 * NUMEL
    outs = pl.pallas_call(
        functools.partial(_tp_bwd_kernel, paths, n_a, sum_out),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * E * (C + 192) * cdt.itemsize + C * NUMEL * 6,
            transcendentals=0),
    )(*args)
    return outs


# ------------------------------------------------------------- layer 1 op

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def tp_contract_l1(h, a, Wp, bp, interpret: bool = False):
    """h [E, C] fc hidden, a [E, 64] gathered scalars, Wp [C, 5120], bp
    [5120] -> (c0 [E,64], c1 [E,8], c2 [E,8]): c_p = contract(a, w_p) for
    the three 0e x l -> l paths. No cotangent flows to SH inputs (they are
    multiplied outside)."""
    return tuple(_fwd_call(PATHS_L1, 1, False, h, [a], Wp, bp, interpret))


def _l1_fwd(h, a, Wp, bp, interpret):
    out = tp_contract_l1(h, a, Wp, bp, interpret)
    return out, (h, a, Wp, bp, Wp[:0], bp[:0])


def _l1_bwd(interpret, res, ct):
    h, a, Wp, bp, wprobe, bprobe = res
    dh, da, dW, db = _bwd_call(PATHS_L1, 1, False, h, [a], Wp, bp,
                               list(ct), interpret)
    vma = vma_union(h, a)
    dW = psum_to(dW.astype(Wp.dtype), wprobe, vma)
    db = psum_to(db[0].astype(bp.dtype), bprobe, vma)
    return dh, da, dW, db


tp_contract_l1.defvjp(_l1_fwd, _l1_bwd)


# ------------------------------------------------------------- layer 2 op

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def tp_contract_l2(h, a0, a1, a2, Wp, bp, interpret: bool = False):
    """h [E, C], a0 [E,64] (s*y0), a1/a2 [E,8] (v/t dot y), Wp [C, 5120],
    bp [5120] -> out [E, 64] = sum of the three l x l -> 0e paths."""
    return _fwd_call(PATHS_L2, 3, True, h, [a0, a1, a2], Wp, bp,
                     interpret)[0]


def _l2_fwd(h, a0, a1, a2, Wp, bp, interpret):
    out = tp_contract_l2(h, a0, a1, a2, Wp, bp, interpret)
    return out, (h, a0, a1, a2, Wp, bp, Wp[:0], bp[:0])


def _l2_bwd(interpret, res, ct):
    h, a0, a1, a2, Wp, bp, wprobe, bprobe = res
    dh, da0, da1, da2, dW, db = _bwd_call(PATHS_L2, 3, True, h,
                                          [a0, a1, a2], Wp, bp, [ct],
                                          interpret)
    vma = vma_union(h, a0)
    dW = psum_to(dW.astype(Wp.dtype), wprobe, vma)
    db = psum_to(db[0].astype(bp.dtype), bprobe, vma)
    return dh, da0, da1, da2, dW, db


tp_contract_l2.defvjp(_l2_fwd, _l2_bwd)


def tp_kernel_ok(E: int, C: int) -> bool:
    """Static gate: tile divisibility, lane alignment, real TPU, opt-out."""
    if _os.environ.get("CARTNET_TP_FUSE", "1") == "0":
        return False
    from cartnet_tpu.ops.pallas.segment_kernels import on_tpu
    return E % T_TP == 0 and C % 128 == 0 and on_tpu()
