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

T_EDGES = 512   # edges per window (grid step)
C_WINDOW = 256  # node-row band per window


def _seg_kernel(lo_ref, ids_ref, val_ref, out_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lo = pl.multiple_of(lo_ref[t], 8)  # host-aligned to sublane multiple
    ids = ids_ref[t, :]  # [T] — ids resident as the full [nt, T] block
    cols = jax.lax.broadcasted_iota(jnp.int32, (C_WINDOW, T_EDGES), 0) + lo
    onehot = (cols == ids[None, :]).astype(val_ref.dtype)     # [C, T]
    partial = jnp.dot(onehot, val_ref[:, :],
                      preferred_element_type=jnp.float32)      # [C, D]
    out_ref[pl.ds(lo, C_WINDOW), :] += partial.astype(out_ref.dtype)


def segment_sum_sorted_window(values, ids_eff, num_segments: int,
                              interpret: bool = False):
    """values [E, D] (E % T == 0), ids_eff [E] int32 ascending with pads set
    to num_segments -> [num_segments, D] sums. See module docstring."""
    E, D = values.shape
    assert E % T_EDGES == 0, E
    nt = E // T_EDGES
    # window base rows, aligned DOWN to the f32 sublane multiple (8) so the
    # dynamic accumulate offset is provably aligned for Mosaic
    lo = ((ids_eff[::T_EDGES] // 8) * 8).astype(jnp.int32)
    ids2d = ids_eff.reshape(nt, T_EDGES).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((nt, T_EDGES), lambda t, lo_ref: (0, 0)),
            pl.BlockSpec((T_EDGES, D), lambda t, lo_ref: (t, 0)),
        ],
        out_specs=pl.BlockSpec((num_segments + C_WINDOW, D),
                               lambda t, lo_ref: (0, 0)),
    )
    out = pl.pallas_call(
        _seg_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_segments + C_WINDOW, D),
                                       values.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * E * C_WINDOW * D,
            bytes_accessed=E * D * values.dtype.itemsize + E * 4
            + (num_segments + C_WINDOW) * D * values.dtype.itemsize,
            transcendentals=0),
    )(lo, ids2d, values)
    return out[:num_segments]


def pallas_shapes_ok(num_edges: int, dim: int, num_segments: int) -> bool:
    """Static shape gate: window divisibility, lane alignment, VMEM budget."""
    vmem = (num_segments + C_WINDOW) * dim * 4 + 2 * T_EDGES * dim * 4
    return (num_edges % T_EDGES == 0 and dim % 128 == 0
            and vmem < 10 * 1024 * 1024)


def on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:  # no backend yet
        return False
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    return plat == "tpu" or "tpu" in kind


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
