"""Segment (scatter/gather) aggregation ops — the SpMM of message passing.

TPU-native replacement for torch-scatter ``scatter(reduce='sum'/'mean')``
(/root/reference/models/cartnet.py:259, comformer_conv.py:220) built on
``jax.ops.segment_sum``: deterministic by construction (the reference README
explicitly disclaims reproducibility because of nondeterministic CUDA atomics,
/root/reference/README.md:223-225).

Edges are sorted by destination at batch-build time so ``indices_are_sorted``
lets XLA lower to a fast path. Padding rows must carry mask=False and their
index may be anything in-range; callers zero padded values before reducing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(values, segment_ids, num_segments: int, *, sorted_ids: bool = False):
    """Masked values ([E, D] or [E]) summed per segment -> [num_segments, ...]."""
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments,
                               indices_are_sorted=sorted_ids)


def masked_segment_sum(values, segment_ids, mask, num_segments: int, *,
                       sorted_ids: bool = False, pallas_ok: bool = False):
    if pallas_ok and sorted_ids and values.ndim == 2:
        from cartnet_tpu.ops.pallas.segment_kernels import (
            masked_segment_sum_pallas, on_tpu, pallas_shapes_ok)
        if on_tpu() and pallas_shapes_ok(values.shape[0], values.shape[1],
                                         num_segments):
            return masked_segment_sum_pallas(values, segment_ids, mask,
                                             num_segments)
    m = mask.astype(values.dtype)
    m = m.reshape(m.shape + (1,) * (values.ndim - m.ndim))
    return segment_sum(values * m, segment_ids, num_segments, sorted_ids=sorted_ids)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def segment_sum_presorted(values, segment_ids, perm, ids_eff, mask,
                          num_segments: int, pallas_ok: bool = False):
    """Masked segment-sum with CALLER-precomputed sort metadata.

    ``perm`` sorts the unsorted ``segment_ids``; ``ids_eff`` is the sorted
    ids with masked/pad positions set to ``num_segments`` — computed ONCE
    per batch by the caller and shared across every reduction on the same
    edge set. The 1-D mask permute + where chain this removes from each
    call ran ~160-190 us EACH at bench shapes (XLA lowers [E] 1-D
    gathers/reduces at a few elements/cycle — xprof round 5). Pad values
    never need zeroing: out-of-range ids are dropped by both the XLA
    scatter and the window kernel's spill rows. Backward is a gather:
    d(values) = d(out)[segment_ids] * mask (original order).
    """
    vs = jnp.asarray(values).at[perm].get(mode="promise_in_bounds")
    if pallas_ok and vs.ndim == 2:
        from cartnet_tpu.ops.pallas.segment_kernels import (
            on_tpu, pallas_shapes_ok, segment_sum_sorted_window)
        if on_tpu() and pallas_shapes_ok(vs.shape[0], vs.shape[1],
                                         num_segments):
            return segment_sum_sorted_window(vs, ids_eff, num_segments)
    return jax.ops.segment_sum(vs, ids_eff, num_segments=num_segments,
                               indices_are_sorted=True)


def _ssp_fwd(values, segment_ids, perm, ids_eff, mask, num_segments,
             pallas_ok):
    out = segment_sum_presorted(values, segment_ids, perm, ids_eff, mask,
                                num_segments, pallas_ok)
    return out, (segment_ids, mask)


def _ssp_bwd(num_segments, pallas_ok, res, ct):
    import numpy as np
    segment_ids, mask = res
    m = mask.astype(ct.dtype).reshape(
        mask.shape + (1,) * (ct.ndim - mask.ndim))
    dvalues = ct.at[segment_ids].get(mode="promise_in_bounds") * m
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    # perm / ids_eff share segment_ids' [E] shape
    return (dvalues, f0(segment_ids), f0(segment_ids), f0(segment_ids),
            f0(mask))


segment_sum_presorted.defvjp(_ssp_fwd, _ssp_bwd)


def masked_segment_mean(values, segment_ids, mask, num_segments: int, *,
                        sorted_ids: bool = False):
    """Mean over real elements per segment (pad-safe denominator)."""
    s = masked_segment_sum(values, segment_ids, mask, num_segments,
                           sorted_ids=sorted_ids)
    cnt = segment_sum(mask.astype(values.dtype), segment_ids, num_segments,
                      sorted_ids=sorted_ids)
    cnt = cnt.reshape(cnt.shape + (1,) * (s.ndim - cnt.ndim))
    return s / jnp.maximum(cnt, 1.0)


def gather(values, idx):
    """Edge-endpoint feature gather: values [N, D], idx [E] -> [E, D].

    Indices are collate-guaranteed in range; promise_in_bounds skips the
    clamp select XLA otherwise materializes (~0.4 ms/step at bench shapes).
    """
    return values.at[idx].get(mode="promise_in_bounds")


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gather_sorted_vjp(values, idx, perm, idx_sorted, pallas_ok: bool = False):
    """x[idx] whose VJP scatter-add runs as a SORTED segment-sum.

    The transpose of a gather is a scatter-add, which XLA lowers to a slow
    serial path on TPU when indices are unsorted (~23x slower than a sorted
    segment reduction at bench shapes). ``perm`` must sort ``idx``
    (idx[perm] ascending) — pass perm=None when idx is ALREADY ascending (the
    backward then skips the cotangent permute entirely). ``idx_sorted`` is
    the host-precomputed idx[perm]: an int gather on-device runs at ~2 GiB/s
    (xprof, PERF_NOTES.md), so it must never be materialized at runtime.
    The reduction uses the Pallas window kernel when ``pallas_ok``
    (collate-verified span condition) and shapes allow. Forward is identical
    to jnp.take. Pad-edge cotangents are exactly zero (pads never reach an
    unmasked reduction), so pad ids need no masking.
    """
    return values.at[idx].get(mode="promise_in_bounds")


def _gsv_fwd(values, idx, perm, idx_sorted, pallas_ok):
    # NB: custom_vjp passes fwd the ORIGINAL positional signature (nondiff
    # args stay in place); only bwd gets nondiff args as leading arguments.
    # values[:0] is a zero-size probe carrying values' vma: under shard_map
    # the cotangent (varying like idx, e.g. over ep) must be psum'd back to
    # the primal's vma or the whole grad pytree is inferred ep-varying.
    return (values.at[idx].get(mode="promise_in_bounds"),
            (idx, perm, idx_sorted, values.shape[0], values[:0]))


def _gsv_bwd(pallas_ok, res, ct):
    import numpy as np  # only for float0 integer cotangents
    from cartnet_tpu.ops.pallas.vma import psum_to, vma_union
    idx, perm, idx_sorted, n, values_probe = res
    if perm is None:
        ct_s, ids_s = ct, idx  # idx already ascending
    else:
        ct_s = ct.at[perm].get(mode="promise_in_bounds")
        ids_s = idx_sorted
    if pallas_ok and ct.ndim == 2:
        from cartnet_tpu.ops.pallas.segment_kernels import (
            on_tpu, pallas_shapes_ok, segment_sum_sorted_window)
        if on_tpu() and pallas_shapes_ok(ct.shape[0], ct.shape[1], n):
            ct_values = segment_sum_sorted_window(ct_s, ids_s, n)
            ct_values = psum_to(ct_values, values_probe,
                                vma_union(ct, idx))
            return (ct_values, np.zeros(idx.shape, jax.dtypes.float0),
                    None if perm is None
                    else np.zeros(perm.shape, jax.dtypes.float0),
                    None if idx_sorted is None
                    else np.zeros(idx_sorted.shape, jax.dtypes.float0))
    ct_values = jax.ops.segment_sum(ct_s, ids_s, num_segments=n,
                                    indices_are_sorted=True)
    ct_values = psum_to(ct_values, values_probe, vma_union(ct, idx))
    return (ct_values, np.zeros(idx.shape, jax.dtypes.float0),
            None if perm is None else np.zeros(perm.shape, jax.dtypes.float0),
            None if idx_sorted is None
            else np.zeros(idx_sorted.shape, jax.dtypes.float0))


gather_sorted_vjp.defvjp(_gsv_fwd, _gsv_bwd)


def gather_edges(values, idx, perm=None, pallas_ok: bool = False,
                 idx_sorted=None, sorted_idx: bool = False):
    """Gather with the fastest available backward.

    sorted_idx=True: idx itself is ascending — sorted-VJP with no permute.
    perm given (idx[perm] ascending): sorted-VJP permuting the cotangent;
    pass the host-precomputed ``idx_sorted`` too. Otherwise plain XLA."""
    if sorted_idx:
        return gather_sorted_vjp(values, idx, None, None, pallas_ok)
    if perm is None:
        return jnp.take(values, idx, axis=0)  # shard_map path: keep clamp
    if idx_sorted is None:
        idx_sorted = idx.at[perm].get(mode="promise_in_bounds")
    return gather_sorted_vjp(values, idx, perm, idx_sorted, pallas_ok)
