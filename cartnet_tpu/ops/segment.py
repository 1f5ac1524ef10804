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
                       sorted_ids: bool = False):
    m = mask.astype(values.dtype)
    m = m.reshape(m.shape + (1,) * (values.ndim - m.ndim))
    return segment_sum(values * m, segment_ids, num_segments, sorted_ids=sorted_ids)


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
    """Edge-endpoint feature gather: values [N, D], idx [E] -> [E, D]."""
    return jnp.take(values, idx, axis=0)
