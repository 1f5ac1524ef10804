"""Fused Pallas TPU kernel for the CartNet edge phase.

Computes, per dst-sorted edge window of T edges, the whole chain

    pre    = xi[dst] + xj[src] + e @ We + b          # [T, 2d]
    h      = silu(pre)
    gate   = h[:, :d] @ W1g + b1g                    # [T, d]
    sender = h[:, d:] @ W1a + b1a                    # [T, d]

without ever materializing the [E, 2d] gather/activation tensors in HBM —
ablation (PERF_NOTES.md) shows the 8 endpoint gathers alone cost ~0.61 ms of
the 1.99 ms forward at bench shapes. Both gathers are banded:

  * dst ids are sorted, so a T-edge window spans a narrow row band
    (~degree·T/E rows; C_DST covers it) — same trick as segment_kernels.py;
  * src ids within a dst window live inside the node ranges of the crystals
    that window touches, and collate keeps each crystal's nodes contiguous,
    so a C_SRC band covers them.

Banded gathers become one-hot MXU matmuls (exact row copies). The custom VJP
recomputes the window forward and emits all cotangents in one pass: windowed
de, banded one-hot-transpose accumulation for dxi/dxj, and f32 VMEM-resident
accumulators for the five weight/bias grads. Soundness (band spans) is
checked host-side at collation (edge_windows_ok); callers fall back to the
XLA gather path otherwise.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartnet_tpu.ops.pallas.vma import psum_to, pvary_to, vma_union

import os as _os

T_EDGES = int(_os.environ.get("CARTNET_T_EDGES", "512"))  # edges per window
C_DST = 128     # dst row band per window
# band base-row alignment: 16 = the bf16 sublane tile, so banded-mode DMAs
# (HBM node tables) start on tile boundaries; also valid for f32 (8)
LO_ALIGN = 16
# src row band per window: covers ONE crystal's node range when collate
# aligns each graph's edge segment to T_EDGES (edge_align), so windows never
# cross graphs. The src one-hot matmul is the kernel's dominant FLOP term
# (E*C_SRC*2d*2 per layer) — keep this band as tight as the data allows.
# 384 covers the ADP size distribution's bulk (avg 194 atoms); batches with
# larger crystals fall back to the unfused XLA path per collate's check.
C_SRC = 384
# src sub-band granularity: the src band is gathered as up to C_SRC/SRC_BLK
# MXU-native [T, 128] one-hot matmuls and each window SKIPS the blocks beyond
# its real span (edge_src_nblk, planned host-side) — the src one-hot is the
# kernel's dominant FLOP term and most ADP windows span <= 2 blocks.
SRC_BLK = 128


def edge_windows_ok(dst, src, mask, num_nodes: int,
                    num_src_nodes: int = None, band: int = None
                    ) -> Tuple[bool, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side soundness check + per-window band base rows.

    Returns (ok, dst_lo [nt], src_lo [nt], src_nblk [nt]); lo rows are
    aligned down to LO_ALIGN and clamped so the band stays inside
    [0, num_nodes] (dst) respectively [0, num_src_nodes] (src — differs in
    halo mode, where src indexes the [local ‖ recv] member table).
    ``src_nblk`` is the number of SRC_BLK blocks the window's real src span
    covers (1..C_SRC/SRC_BLK); the kernel skips the rest. Only REAL edges
    bind the span; pad edges produce all-zero one-hot rows (masked
    downstream).
    """
    if num_src_nodes is None:
        num_src_nodes = num_nodes
    if band is None:
        band = C_SRC
    e = len(dst)
    if e % T_EDGES != 0:
        return False, None, None, None
    nt = e // T_EDGES
    dst_lo = np.zeros(nt, np.int32)
    src_lo = np.zeros(nt, np.int32)
    src_nblk = np.zeros(nt, np.int32)
    max_blk = band // SRC_BLK
    al = LO_ALIGN
    for t in range(nt):
        sl = slice(t * T_EDGES, (t + 1) * T_EDGES)
        m = mask[sl]
        if not m.any():
            continue
        d_real = dst[sl][m]
        s_real = src[sl][m]
        dlo = min((int(d_real.min()) // al) * al,
                  (max(num_nodes - C_DST, 0) // al) * al)
        if int(d_real.max()) - dlo >= C_DST:
            return False, None, None, None
        smax = int(s_real.max())
        slo = min((int(s_real.min()) // al) * al,
                  (max(num_src_nodes - band, 0) // al) * al)
        # fewest blocks covering the span, with every used block inside the
        # table (slo + SRC_BLK*nb <= num_src_nodes); clamping slo down can
        # grow the span by one block, so iterate
        while True:
            nb = -(-(smax + 1 - slo) // SRC_BLK)
            if nb > max_blk:
                return False, None, None, None
            if slo + SRC_BLK * nb <= num_src_nodes:
                break
            slo = ((num_src_nodes - SRC_BLK * nb) // al) * al
        dst_lo[t] = dlo
        src_lo[t] = slo
        src_nblk[t] = nb
    return True, dst_lo, src_lo, src_nblk


def plan_edge_windows(dst, src, mask, num_nodes: int,
                      num_src_nodes: int = None):
    """Band-minimizing plan: the src one-hot matmuls are the kernel's
    dominant FLOP term and scale with the band width, so pick the SMALLEST
    MXU-granular band in {128, 256, 384} that covers every window's real
    src span. Returns (ok, dst_lo, src_lo, src_nblk, band)."""
    n_src = num_nodes if num_src_nodes is None else num_src_nodes
    for band in (SRC_BLK, 2 * SRC_BLK, C_SRC):
        if band > n_src:
            break
        ok, dlo, slo, nblk = edge_windows_ok(dst, src, mask, num_nodes,
                                             num_src_nodes, band)
        if ok:
            return True, dlo, slo, nblk, band
    return False, None, None, None, C_SRC


def _bwd_saved() -> bool:
    """CARTNET_BWD_SAVED=1: the forward saves [pre ‖ sigmoid(pre)] (bf16,
    [E, 4d]) instead of pre alone, making the backward silu' chain pure
    FMAs — no transcendentals on the bwd kernel's serial VPU path (the
    suspected 68%-MXU limiter, PERF_NOTES round-4 lead 1) at the cost of
    one extra [E, 2d] bf16 HBM write+read per layer. Measured +3.5% on the
    full step (in-process A/B, 6.85M vs 6.61-6.66M, round 5) — DEFAULT ON;
    CARTNET_BWD_SAVED=0 reverts. Read at trace time."""
    return _os.environ.get("CARTNET_BWD_SAVED", "1") == "1"


def _compiler_params():
    """Optional Mosaic VMEM-budget override (CARTNET_VMEM_LIMIT_MB): a
    larger scoped budget lets the pipeliner double-buffer more of the
    windowed streams. None -> compiler default."""
    mb = _os.environ.get("CARTNET_VMEM_LIMIT_MB")
    if not mb:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(mb) * 1024 * 1024)


def _onehot(ids, lo, c, dtype):
    cols = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], c), 1)
    return (cols == (ids - lo)[:, None]).astype(dtype)


def _fwd_kernel(saved, c_src, banded, dlo_ref, slo_ref, nblk_ref, dids_ref,
                sids_ref, emask_ref, xi_ref, xj_ref, e_ref, we_ref, b_ref,
                w1g_ref, b1g_ref, w1a_ref, b1a_ref, gate_ref, sender_ref,
                pre_ref, s1_ref, m2_ref, acc_ref, *banded_scratch):
    t = pl.program_id(0)
    d = w1g_ref.shape[0]
    dlo = pl.multiple_of(dlo_ref[t], LO_ALIGN)
    slo = pl.multiple_of(slo_ref[t], LO_ALIGN)
    cdt = e_ref.dtype
    if banded:
        # node tables stay in HBM (VMEM must not scale with N — VERDICT r3
        # next #4): per window, double-buffered async DMAs stream just the
        # [C_DST, 2d] dst band and [c_src, 2d] src band into VMEM scratch
        # while the previous window computes
        xi_buf, xj_buf, sem_i, sem_j = banded_scratch
        nt = pl.num_programs(0)

        def band_dmas(slot, w):
            dw = pl.multiple_of(dlo_ref[w], LO_ALIGN)
            sw = pl.multiple_of(slo_ref[w], LO_ALIGN)
            return (pltpu.make_async_copy(
                        xi_ref.at[pl.ds(dw, C_DST), :], xi_buf.at[slot],
                        sem_i.at[slot]),
                    pltpu.make_async_copy(
                        xj_ref.at[pl.ds(sw, c_src), :], xj_buf.at[slot],
                        sem_j.at[slot]))

        @pl.when(t == 0)
        def _():
            for dma in band_dmas(0, 0):
                dma.start()

        @pl.when(t + 1 < nt)
        def _():
            for dma in band_dmas((t + 1) % 2, t + 1):
                dma.start()

        for dma in band_dmas(t % 2, t):
            dma.wait()
        xi_band = xi_buf[t % 2]
        xj_band_ref = xj_buf.at[t % 2]
    else:
        xi_band = xi_ref[pl.ds(dlo, C_DST), :]
        xj_band_ref = xj_ref.at[pl.ds(slo, c_src), :]
    oh_d = _onehot(dids_ref[t], dlo, C_DST, cdt)          # [T, C_DST]
    gi = jnp.dot(oh_d, xi_band, preferred_element_type=jnp.float32)
    e_w = e_ref[...]                                      # [T, d]
    ew = jnp.dot(e_w, we_ref[...], preferred_element_type=jnp.float32)
    sids = sids_ref[t]
    # default: one unconditional C_SRC-wide one-hot dot in registers. The
    # per-block pl.when skip (CARTNET_SRC_SKIP=1) saves ~25% of the one-hot
    # FLOPs at mean nblk≈2.2 but costs a VMEM scratch accumulator round-trip
    # per window — measured NET -5% on the full bench step (bench A/B
    # 2026-08-21: 6.41M vs 6.12M edges/s), while the BACKWARD dxj block skip
    # below is pure win (no scratch). Keep the fwd skip behind the env flag
    # for shapes where nblk is mostly 1.
    if _os.environ.get("CARTNET_SRC_SKIP", "0") == "1" and not banded:
        acc_ref[...] = gi + ew + b_ref[...].astype(jnp.float32)
        for k in range(c_src // SRC_BLK):
            @pl.when(nblk_ref[t] > k)
            def _(k=k):
                blo = pl.multiple_of(slo + k * SRC_BLK, 8)
                oh_k = _onehot(sids, blo, SRC_BLK, cdt)
                acc_ref[...] += jnp.dot(
                    oh_k, xj_ref[pl.ds(blo, SRC_BLK), :],
                    preferred_element_type=jnp.float32)
        pre = acc_ref[...]
    else:  # register path: one unconditional c_src-wide one-hot dot
        oh_s = _onehot(sids, slo, c_src, cdt)
        gj = jnp.dot(oh_s, xj_band_ref[...],
                     preferred_element_type=jnp.float32)
        pre = gi + gj + ew + b_ref[...].astype(jnp.float32)
    sig = jax.nn.sigmoid(pre)
    h = (pre * sig).astype(cdt)                           # = silu(pre)
    gate = jnp.dot(h[:, :d], w1g_ref[...],
                   preferred_element_type=jnp.float32) + b1g_ref[...]
    sender = jnp.dot(h[:, d:], w1a_ref[...],
                     preferred_element_type=jnp.float32) + b1a_ref[...]
    gate_ref[...] = gate.astype(gate_ref.dtype)
    sender_ref[...] = sender.astype(sender_ref.dtype)
    # saved for the backward: re-deriving pre would cost the oh_d/oh_s/eW
    # dots again (~16.5 GF/layer, xprof'd at ~0.1 ms/layer) vs one [T,2d]
    # write+read. bf16 save matches the XLA path's silu-bwd precision.
    if saved:  # [pre ‖ sig]: transcendental-free backward (_bwd_saved)
        pre_ref[...] = jnp.concatenate(
            [pre.astype(pre_ref.dtype), sig.astype(pre_ref.dtype)], axis=1)
    else:
        pre_ref[...] = pre.astype(pre_ref.dtype)
    # per-window masked Welford partials of the BN batch moments over the
    # ROUNDED gate (what downstream consumes): s1_w = sum(m*g),
    # M2_w = sum(m*(g-mean_w)^2). Combined outside with the exact
    # group-merge formula (nn/norm.py::bn_scale_shift_from_window_moments)
    # — replaces the two XLA [E,d] moment read passes per layer AND two
    # links of the per-layer edge->moments->sigma serialization chain
    # (PERF_NOTES round-3 session-2 xprof: ~130 us/step of stalls).
    mf = (emask_ref[t] > 0).astype(jnp.float32)[:, None]      # [T, 1]
    g32 = gate.astype(gate_ref.dtype).astype(jnp.float32)
    n_w = jnp.sum(mf)
    s1 = jnp.sum(g32 * mf, axis=0)                            # [d]
    mean_w = s1 / jnp.maximum(n_w, 1.0)
    diff = (g32 - mean_w) * mf
    # whole-(nt,d) output blocks (a (1,d) block over (nt,d) is Mosaic-illegal
    # when nt % 8 != 0); each window writes exactly its own row
    s1_ref[pl.ds(t, 1), :] = s1[None, :]
    m2_ref[pl.ds(t, 1), :] = jnp.sum(diff * diff, axis=0)[None, :]


def _bwd_kernel(saved, c_src, banded, dlo_ref, slo_ref, nblk_ref, dids_ref,
                sids_ref, emask_ref, e_ref, we_ref, b_ref, w1g_ref, b1g_ref,
                w1a_ref, b1a_ref, pre_saved_ref, gate_ref, meanw_ref,
                ds1_ref, dm2_ref, dgate_ref, dsender_ref,
                deres_ref, de_ref, dxi_ref, dxj_ref,
                dwe_ref, db_ref, dw1g_ref, db1g_ref, dw1a_ref, db1a_ref,
                *banded_scratch):
    # NB: no xi/xj inputs — the backward never rereads the node tables
    # (pre is saved by the forward); keeping them resident wasted ~2 MB of
    # VMEM that the pipeline buffers want.
    # banded mode: dxi/dxj live in HBM (zeroed by chunked DMAs at t == 0);
    # each window accumulates its banded partial via a read-modify-write
    # DMA pair — VMEM stays O(window), not O(N)
    t = pl.program_id(0)
    d = w1g_ref.shape[0]

    @pl.when(t == 0)
    def _():
        if banded:
            dxi_buf, dxj_buf, sem_x = banded_scratch
            dxi_buf[...] = jnp.zeros_like(dxi_buf)

            def zero_chunks(ref, buf, sem, rows):
                def zl(i, _):
                    z = pltpu.make_async_copy(
                        buf, ref.at[pl.ds(i * rows, rows), :], sem)
                    z.start()
                    z.wait()
                    return 0
                jax.lax.fori_loop(0, ref.shape[0] // rows, zl, 0)

            zero_chunks(dxi_ref, dxi_buf, sem_x.at[0], C_DST)
            dxj_buf[...] = jnp.zeros_like(dxj_buf)
            zero_chunks(dxj_ref, dxj_buf, sem_x.at[1], SRC_BLK)
        else:
            dxi_ref[...] = jnp.zeros_like(dxi_ref)
            dxj_ref[...] = jnp.zeros_like(dxj_ref)
        dwe_ref[...] = jnp.zeros_like(dwe_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1g_ref[...] = jnp.zeros_like(dw1g_ref)
        db1g_ref[...] = jnp.zeros_like(db1g_ref)
        dw1a_ref[...] = jnp.zeros_like(dw1a_ref)
        db1a_ref[...] = jnp.zeros_like(db1a_ref)

    cdt = e_ref.dtype
    dlo = pl.multiple_of(dlo_ref[t], LO_ALIGN)
    slo = pl.multiple_of(slo_ref[t], LO_ALIGN)
    dims_nt = (((1,), (1,)), ((), ()))
    dims_tt = (((0,), (0,)), ((), ()))

    def _rmw(hbm_slice, buf, sem, partial):
        """buf <- hbm_slice; buf += partial; hbm_slice <- buf (sequential —
        consecutive windows' bands overlap, so no read-ahead is legal)."""
        rd = pltpu.make_async_copy(hbm_slice, buf, sem)
        rd.start()
        rd.wait()
        buf[...] += partial
        wr = pltpu.make_async_copy(buf, hbm_slice, sem)
        wr.start()
        wr.wait()

    # CARTNET_BWD_SPLIT=1: process the window as independent halves so the
    # scheduler can overlap one half's VPU chain (sigmoid/silu'/corr) with
    # the other's MXU dots — the kernel runs at ~64% MXU and the gap tracks
    # the serial VPU phase (PERF_NOTES round-4 lead 1). Identical math up to
    # f32 accumulation order (contractions over T split in two).
    n_halves = (2 if _os.environ.get("CARTNET_BWD_SPLIT", "0") == "1"
                and not banded else 1)
    t_half = dgate_ref.shape[0] // n_halves

    for hs in range(n_halves):
        rows = pl.ds(hs * t_half, t_half)
        # fold the BN-moment cotangents into dgate: the fwd emitted
        # per-window masked partials s1_w = sum(m*g), M2_w =
        # sum(m*(g-mean_w)^2), so d gate = dgate_in + m * (ds1_w +
        # 2*dM2_w*(g - mean_w)); the internal mean_w dependence of M2_w
        # contributes zero (sum of m*(g-mean_w) = 0)
        mf = (emask_ref[t, rows] > 0).astype(jnp.float32)[:, None]
        g32 = gate_ref[rows, :].astype(jnp.float32)
        # moment arrays arrive as whole (nt, d) blocks (see fwd); read row t
        corr = (ds1_ref[pl.ds(t, 1), :]
                + 2.0 * dm2_ref[pl.ds(t, 1), :]
                * (g32 - meanw_ref[pl.ds(t, 1), :]))
        dg = (dgate_ref[rows, :].astype(jnp.float32) + mf * corr).astype(cdt)
        ds = dsender_ref[rows, :].astype(cdt)

        # the input-only MXU dots are issued before the VPU silu' chain so
        # the scheduler CAN overlap them:
        # dh = [dg @ W1g^T ‖ ds @ W1a^T]  (contract over output dim)
        dh_g = jax.lax.dot_general(dg, w1g_ref[...], dims_nt,
                                   preferred_element_type=jnp.float32)
        dh_a = jax.lax.dot_general(ds, w1a_ref[...], dims_nt,
                                   preferred_element_type=jnp.float32)

        if saved:  # [pre ‖ sig] saved by the fwd — no bwd transcendentals
            ps = pre_saved_ref[rows, :].astype(jnp.float32)
            pre, sig = ps[:, :2 * d], ps[:, 2 * d:]
        else:
            pre = pre_saved_ref[rows, :].astype(jnp.float32)
            sig = jax.nn.sigmoid(pre)
        h32 = pre * sig                                       # = silu(pre)
        h = h32.astype(cdt)
        oh_d = _onehot(dids_ref[t, rows], dlo, C_DST, cdt)

        # CARTNET_BWD_XB=1: skip the in-kernel [T,d]->[1,d] bias-grad
        # reductions (serial VPU work in an MXU-bound kernel); _ep_bwd then
        # derives db1g/db1a outside from dgate/dsender + window moments
        # (sum(dg) == sum(dgate_in) + n_w*ds1_w per window — the dm2 term
        # telescopes to zero)
        if _os.environ.get("CARTNET_BWD_XB", "0") != "1":
            db1g_ref[...] += jnp.sum(dg, axis=0, dtype=jnp.float32)[None, :]
            db1a_ref[...] += jnp.sum(ds, axis=0, dtype=jnp.float32)[None, :]
        # dW1 = h_slice^T @ dout  (contract over the T axis)
        dw1g_ref[...] += jax.lax.dot_general(
            h[:, :d], dg, dims_tt, preferred_element_type=jnp.float32)
        dw1a_ref[...] += jax.lax.dot_general(
            h[:, d:], ds, dims_tt, preferred_element_type=jnp.float32)

        dh = jnp.concatenate([dh_g, dh_a], axis=1)        # [T/2, 2d] f32
        # silu' = sig + pre*sig*(1-sig) = sig + h32*(1-sig)  (reuses h32)
        dpre = dh * (sig + h32 * (1.0 - sig))
        dpre_c = dpre.astype(cdt)

        db_ref[...] += jnp.sum(dpre, axis=0)[None, :]
        # de = de_res + dpre @ We^T ; dWe = e_w^T @ dpre.  de_res is the
        # layer residual's cotangent (e is passed through this op so the
        # downstream e_out = e + sigma add backward lands here instead of a
        # separate XLA [E,d] add pass).
        e_w = e_ref[rows, :]
        de_ref[rows, :] = (
            deres_ref[rows, :].astype(jnp.float32) + jax.lax.dot_general(
                dpre_c, we_ref[...], dims_nt,
                preferred_element_type=jnp.float32)).astype(de_ref.dtype)
        dwe_ref[...] += jax.lax.dot_general(
            e_w, dpre_c, dims_tt, preferred_element_type=jnp.float32)
        # banded scatter: dxi[band] += oh_d^T @ dpre; dxj per src block with
        # the same skip as the forward gather (disjoint row ranges per block)
        dxi_part = jax.lax.dot_general(
            oh_d, dpre_c, dims_tt, preferred_element_type=jnp.float32)
        if banded:
            dxi_buf, dxj_buf, sem_x = banded_scratch
            _rmw(dxi_ref.at[pl.ds(dlo, C_DST), :], dxi_buf, sem_x.at[0],
                 dxi_part)
        else:
            dxi_ref[pl.ds(dlo, C_DST), :] += dxi_part
        sids = sids_ref[t, rows]
        for k in range(c_src // SRC_BLK):
            @pl.when(nblk_ref[t] > k)
            def _(k=k, sids=sids, dpre_c=dpre_c):
                blo = pl.multiple_of(slo + k * SRC_BLK, 8)
                oh_k = _onehot(sids, blo, SRC_BLK, cdt)
                dxj_part = jax.lax.dot_general(
                    oh_k, dpre_c, dims_tt,
                    preferred_element_type=jnp.float32)
                if banded:
                    dxi_buf, dxj_buf, sem_x = banded_scratch
                    _rmw(dxj_ref.at[pl.ds(blo, SRC_BLK), :], dxj_buf,
                         sem_x.at[1], dxj_part)
                else:
                    dxj_ref[pl.ds(blo, SRC_BLK), :] += dxj_part


def _specs(nt, n_i, n_j, e, d, t_win):
    # n_i/n_j may differ: in halo mode xj is the [local ‖ recv] member table
    const = lambda shape: pl.BlockSpec(shape, lambda t, dlo, slo, nb: (0, 0))
    win = lambda shape: pl.BlockSpec(shape, lambda t, dlo, slo, nb: (t, 0))
    return [
        const((nt, t_win)),   # dst ids
        const((nt, t_win)),   # src ids
        const((nt, t_win)),   # edge mask (i32; BN moments + moment bwd)
        const((n_i, 2 * d)),  # xi
        const((n_j, 2 * d)),  # xj
        win((t_win, d)),      # e window
        const((d, 2 * d)),    # we
        const((1, 2 * d)),    # b
        const((d, d)),        # w1g
        const((1, d)),        # b1g
        const((d, d)),        # w1a
        const((1, d)),        # b1a
    ]


def _prep(xi, xj, dst, src, dst_lo, src_lo):
    e = dst.shape[0]
    nt = e // T_EDGES
    dids = dst.reshape(nt, T_EDGES).astype(jnp.int32)
    sids = src.reshape(nt, T_EDGES).astype(jnp.int32)
    return nt, dids, sids


def edge_phase_fwd(xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask,
                   dst_lo, src_lo, src_nblk=None, c_src: int = C_SRC,
                   interpret: bool = False, saved=None):
    n_i, d2 = xi.shape
    n_j = xj.shape[0]
    d = d2 // 2
    E = e.shape[0]
    saved = _bwd_saved() if saved is None else saved
    wsave = 4 * d if saved else 2 * d
    if src_nblk is None:
        src_nblk = jnp.full(E // T_EDGES, c_src // SRC_BLK, jnp.int32)
    # uniform vma: under shard_map the node tables may be replicated over ep
    # while the edge windows vary (ops/pallas/vma.py)
    vma = vma_union(xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask,
                    dst_lo, src_lo, src_nblk)
    if interpret and vma:
        # sharded CPU-mesh path: Pallas interpret mode cannot type-check
        # under shard_map vma — use the jnp twin (ops/pallas/reference.py)
        from cartnet_tpu.ops.pallas.reference import edge_phase_fwd_ref
        return edge_phase_fwd_ref(xi, xj, e, we, b, w1g, b1g, w1a, b1a,
                                  dst, src, emask)
    (xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask, dst_lo, src_lo,
     src_nblk) = (
        pvary_to(a, vma) for a in
        (xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask, dst_lo,
         src_lo, src_nblk))
    nt, dids, sids = _prep(xi, xj, dst, src, dst_lo, src_lo)
    em2d = emask.reshape(nt, T_EDGES).astype(jnp.int32)
    banded = not edge_tables_resident(n_i, n_j, d, xi.dtype.itemsize)
    in_specs = _specs(nt, n_i, n_j, E, d, T_EDGES)
    scratch = [pltpu.VMEM((T_EDGES, 2 * d), jnp.float32)]
    if banded:
        # node tables stay in HBM; the kernel streams per-window bands
        in_specs[3] = pl.BlockSpec(memory_space=pl.ANY)  # xi
        in_specs[4] = pl.BlockSpec(memory_space=pl.ANY)  # xj
        scratch += [pltpu.VMEM((2, C_DST, 2 * d), xi.dtype),
                    pltpu.VMEM((2, c_src, 2 * d), xi.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((T_EDGES, d), lambda t, dlo, slo, nb: (t, 0)),
                   pl.BlockSpec((T_EDGES, d), lambda t, dlo, slo, nb: (t, 0)),
                   pl.BlockSpec((T_EDGES, wsave),
                                lambda t, dlo, slo, nb: (t, 0)),
                   pl.BlockSpec((nt, d), lambda t, dlo, slo, nb: (0, 0)),
                   pl.BlockSpec((nt, d), lambda t, dlo, slo, nb: (0, 0))],
        scratch_shapes=scratch,
    )
    flops = 2 * E * (C_DST + c_src) * 2 * d + 2 * E * d * 2 * d * 2
    gate, sender, pre, s1w, m2w = pl.pallas_call(
        functools.partial(_fwd_kernel, saved, c_src, banded),
        grid_spec=grid_spec,
        compiler_params=_compiler_params(),
        out_shape=[jax.ShapeDtypeStruct((E, d), xi.dtype, vma=vma),
                   jax.ShapeDtypeStruct((E, d), xi.dtype, vma=vma),
                   jax.ShapeDtypeStruct((E, wsave), xi.dtype, vma=vma),
                   jax.ShapeDtypeStruct((nt, d), jnp.float32, vma=vma),
                   jax.ShapeDtypeStruct((nt, d), jnp.float32, vma=vma)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=E * d * 5 * xi.dtype.itemsize,
            transcendentals=E * 2 * d),
    )(dst_lo, src_lo, src_nblk, dids, sids, em2d, xi, xj, e,
      we, b.reshape(1, -1), w1g, b1g.reshape(1, -1), w1a, b1a.reshape(1, -1))
    return gate, sender, pre, s1w, m2w


def edge_phase_bwd_call(xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src,
                        emask, dst_lo, src_lo, src_nblk, pre, gate, meanw,
                        ds1w, dm2w, dgate, dsender, deres,
                        c_src: int = C_SRC, interpret: bool = False,
                        saved=None):
    n_i, d2 = xi.shape
    n_j = xj.shape[0]
    d = d2 // 2
    E = e.shape[0]
    saved = _bwd_saved() if saved is None else saved
    wsave = 4 * d if saved else 2 * d
    if src_nblk is None:
        src_nblk = jnp.full(E // T_EDGES, c_src // SRC_BLK, jnp.int32)
    vma = vma_union(xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask,
                    dst_lo, src_lo, src_nblk, pre, gate, meanw, ds1w, dm2w,
                    dgate, dsender, deres)
    if interpret and vma:
        from cartnet_tpu.ops.pallas.reference import edge_phase_bwd_ref
        return edge_phase_bwd_ref(xi, xj, e, we, w1g, w1a, dst, src, emask,
                                  pre, gate, meanw, ds1w, dm2w,
                                  dgate, dsender, deres)
    (xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask, dst_lo, src_lo,
     src_nblk, pre, gate, meanw, ds1w, dm2w, dgate, dsender, deres) = (
        pvary_to(a, vma) for a in
        (xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask, dst_lo,
         src_lo, src_nblk, pre, gate, meanw, ds1w, dm2w, dgate, dsender,
         deres))
    nt, dids, sids = _prep(xi, xj, dst, src, dst_lo, src_lo)
    em2d = emask.reshape(nt, T_EDGES).astype(jnp.int32)
    win = lambda shape: pl.BlockSpec(shape, lambda t, dlo, slo, nb: (t, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda t, dlo, slo, nb: (0, 0))
    bwd_in = [spec for i, spec in
              enumerate(_specs(nt, n_i, n_j, E, d, T_EDGES))
              if i not in (3, 4)]  # drop the unused xi/xj node tables
    banded = not edge_tables_resident(n_i, n_j, d, xi.dtype.itemsize)
    if banded:
        dxi_spec = pl.BlockSpec(memory_space=pl.ANY)
        dxj_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((C_DST, 2 * d), jnp.float32),
                   pltpu.VMEM((SRC_BLK, 2 * d), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        dxi_spec = const((n_i, 2 * d))
        dxj_spec = const((n_j, 2 * d))
        scratch = []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=bwd_in + [win((T_EDGES, wsave)),   # pre (‖ sig if saved)
                           win((T_EDGES, d)),       # gate (rounded)
                           const((nt, d)),          # mean_w (whole array)
                           const((nt, d)),          # ds1_w
                           const((nt, d)),          # dm2_w
                           win((T_EDGES, d)),       # dgate
                           win((T_EDGES, d)),       # dsender
                           win((T_EDGES, d))],      # deres
        out_specs=[
            win((T_EDGES, d)),        # de
            dxi_spec,                 # dxi (f32 accumulator)
            dxj_spec,                 # dxj
            const((d, 2 * d)),        # dwe
            const((1, 2 * d)),        # db
            const((d, d)),            # dw1g
            const((1, d)),            # db1g
            const((d, d)),            # dw1a
            const((1, d)),            # db1a
        ],
        scratch_shapes=scratch,
    )
    flops = 3 * (2 * E * (C_DST + c_src) * 2 * d + 6 * E * d * 2 * d * 2)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, saved, c_src, banded),
        grid_spec=grid_spec,
        compiler_params=_compiler_params(),
        out_shape=[
            jax.ShapeDtypeStruct((E, d), e.dtype, vma=vma),
            jax.ShapeDtypeStruct((n_i, 2 * d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((n_j, 2 * d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((d, 2 * d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, 2 * d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((d, d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((d, d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, d), jnp.float32, vma=vma),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=E * d * 5 * xi.dtype.itemsize,
            transcendentals=E * 2 * d),
    )(dst_lo, src_lo, src_nblk, dids, sids, em2d, e,
      we, b.reshape(1, -1), w1g, b1g.reshape(1, -1), w1a, b1a.reshape(1, -1),
      pre, gate, meanw.astype(jnp.float32), ds1w.astype(jnp.float32),
      dm2w.astype(jnp.float32), dgate, dsender, deres)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16))
def edge_phase(xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask,
               dst_lo, src_lo, src_nblk=None, c_src: int = C_SRC,
               interpret: bool = False):
    """Fused gather+MLP edge phase
    -> (gate, sender, e_res [E,d], s1_w, M2_w [nt,d]).

    e_res is e passed through unchanged (zero cost forward). Route the
    layer's edge residual through it (e_out = e_res + sigma) so that the
    residual's backward add folds into this op's de output instead of a
    separate XLA [E,d] pass. ``s1_w``/``M2_w`` are per-window masked Welford
    partials of gate's BN batch moments (combine with
    nn.norm.bn_scale_shift_from_window_moments) — differentiable; their
    backward is folded into the bwd kernel's dgate. ``emask`` [E] bool: real
    edges. ``src_nblk`` [nt]: per-window src block count from
    edge_windows_ok (None -> no skipping). ``c_src`` (static): the src band
    width this batch's plan was built for (plan_edge_windows) — the
    dominant FLOP term scales with it.
    """
    gate, sender, _, s1w, m2w = edge_phase_fwd(
        xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask,
        dst_lo, src_lo, src_nblk, c_src, interpret)
    return gate, sender, e, s1w, m2w


def _ep_fwd(xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask, dst_lo,
            src_lo, src_nblk, c_src, interpret):
    gate, sender, pre, s1w, m2w = edge_phase_fwd(
        xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask,
        dst_lo, src_lo, src_nblk, c_src, interpret)
    return ((gate, sender, e, s1w, m2w),
            (xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask,
             dst_lo, src_lo, src_nblk, pre, gate, s1w))


def _ep_bwd(c_src, interpret, res, cts):
    (xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask, dst_lo, src_lo,
     src_nblk, pre, gate, s1w) = res
    dgate, dsender, deres, ds1w, dm2w = cts
    # mean_w for the M2 cotangent term, recomputed exactly as the combine
    # does outside (s1_w / n_w)
    nt = s1w.shape[0]
    n_w = emask.reshape(nt, -1).sum(axis=1, dtype=jnp.float32)[:, None]
    meanw = s1w / jnp.maximum(n_w, 1.0)
    (de, dxi, dxj, dwe, db, dw1g, db1g, dw1a, db1a) = edge_phase_bwd_call(
        xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask, dst_lo,
        src_lo, src_nblk, pre, gate, meanw, ds1w, dm2w,
        dgate, dsender, deres, c_src, interpret)
    if _os.environ.get("CARTNET_BWD_XB", "0") == "1":
        # bias grads outside the kernel (see _bwd_kernel note): one fused
        # XLA reduce over arrays that stream from HBM anyway. Exact formula
        # (not an approximation), so overriding the twin's value is a no-op
        db1g = (jnp.sum(dgate, axis=0, dtype=jnp.float32)
                + jnp.sum(n_w * ds1w.astype(jnp.float32), axis=0))[None, :]
        db1a = jnp.sum(dsender, axis=0, dtype=jnp.float32)[None, :]
    # under shard_map every grad above is a per-member partial accumulated
    # over that member's edge windows; inputs replicated across mesh axes
    # (node tables over ep, weights over everything) need their partials
    # psum'd back to the primal's vma (no-op single-device / for edge arrays)
    vma = vma_union(dgate, dsender, deres, xi, xj, e)
    de = psum_to(de, e, vma)
    dxi, dxj = psum_to(dxi, xi, vma), psum_to(dxj, xj, vma)
    dwe, db = psum_to(dwe, we, vma), psum_to(db, b, vma)
    dw1g, db1g = psum_to(dw1g, w1g, vma), psum_to(db1g, b1g, vma)
    dw1a, db1a = psum_to(dw1a, w1a, vma), psum_to(db1a, b1a, vma)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dxi.astype(xi.dtype), dxj.astype(xj.dtype), de,
            dwe.astype(we.dtype), db.reshape(-1).astype(b.dtype),
            dw1g.astype(w1g.dtype), db1g.reshape(-1).astype(b1g.dtype),
            dw1a.astype(w1a.dtype), db1a.reshape(-1).astype(b1a.dtype),
            f0(dst), f0(src), f0(emask), f0(dst_lo), f0(src_lo),
            None if src_nblk is None else f0(src_nblk))


edge_phase.defvjp(_ep_fwd, _ep_bwd)


# ------------------------------------------------- merged edge+BN+sigma op

def _merged_bwd_call(xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask,
                     dst_lo, src_lo, src_nblk, pre, gate, sender, env2d,
                     scale, shift, meanw, ds1w, dm2w, deout, daggr,
                     c_src: int, interpret: bool):
    n_i, d2 = xi.shape
    n_j = xj.shape[0]
    d = d2 // 2
    E = e.shape[0]
    vma = vma_union(xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask,
                    dst_lo, src_lo, src_nblk, pre, gate, sender, env2d,
                    scale, shift, meanw, ds1w, dm2w, deout, daggr)
    (xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask, dst_lo, src_lo,
     src_nblk, pre, gate, sender, env2d, scale, shift, meanw, ds1w, dm2w,
     deout, daggr) = (
        pvary_to(a, vma) for a in
        (xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask, dst_lo,
         src_lo, src_nblk, pre, gate, sender, env2d, scale, shift, meanw,
         ds1w, dm2w, deout, daggr))
    nt, dids, sids = _prep(xi, xj, dst, src, dst_lo, src_lo)
    em2d = emask.reshape(nt, T_EDGES).astype(jnp.int32)
    win = lambda shape: pl.BlockSpec(shape, lambda t, dlo, slo, nb: (t, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda t, dlo, slo, nb: (0, 0))
    bwd_in = [spec for i, spec in
              enumerate(_specs(nt, n_i, n_j, E, d, T_EDGES))
              if i not in (3, 4)]
    banded = not edge_tables_resident(n_i, n_j, d, xi.dtype.itemsize)
    from cartnet_tpu.ops.pallas.segment_kernels import seg_table_resident
    seg_res = seg_table_resident(n_i, d)
    scratch = []
    if banded:
        dxi_spec = pl.BlockSpec(memory_space=pl.ANY)
        dxj_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch += [pltpu.VMEM((C_DST, 2 * d), jnp.float32),
                    pltpu.VMEM((SRC_BLK, 2 * d), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
    else:
        dxi_spec = const((n_i, 2 * d))
        dxj_spec = const((n_j, 2 * d))
    if seg_res:
        daggr_spec = const((n_i, d))
    else:
        daggr_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch += [pltpu.VMEM((C_DST, d), daggr.dtype),
                    pltpu.SemaphoreType.DMA(())]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=bwd_in + [win((T_EDGES, 2 * d)),   # pre (merged: plain)
                           win((T_EDGES, d)),       # gate
                           win((T_EDGES, d)),       # sender
                           win((T_EDGES, 1)),       # env
                           const((1, d)),           # scale
                           const((1, d)),           # shift
                           const((nt, d)),          # mean_w
                           const((nt, d)),          # ds1_w
                           const((nt, d)),          # dm2_w
                           win((T_EDGES, d)),       # deout
                           daggr_spec],             # daggr [n_i, d]
        out_specs=[
            win((T_EDGES, d)),        # de
            dxi_spec, dxj_spec,
            const((d, 2 * d)),        # dwe
            const((1, 2 * d)),        # db
            const((d, d)),            # dw1g
            const((1, d)),            # db1g
            const((d, d)),            # dw1a
            const((1, d)),            # db1a
        ],
        scratch_shapes=scratch,
    )
    flops = 3 * (2 * E * (C_DST + c_src) * 2 * d + 6 * E * d * 2 * d * 2)
    outs = pl.pallas_call(
        functools.partial(_bwd_merged_kernel, c_src, banded, seg_res),
        grid_spec=grid_spec,
        compiler_params=_compiler_params(),
        out_shape=[
            jax.ShapeDtypeStruct((E, d), e.dtype, vma=vma),
            jax.ShapeDtypeStruct((n_i, 2 * d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((n_j, 2 * d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((d, 2 * d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, 2 * d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((d, d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((d, d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, d), jnp.float32, vma=vma),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=E * d * 8 * xi.dtype.itemsize,
            transcendentals=E * 3 * d),
    )(dst_lo, src_lo, src_nblk, dids, sids, em2d, e,
      we, b.reshape(1, -1), w1g, b1g.reshape(1, -1), w1a, b1a.reshape(1, -1),
      pre, gate, sender, env2d, scale.reshape(1, -1).astype(jnp.float32),
      shift.reshape(1, -1).astype(jnp.float32), meanw.astype(jnp.float32),
      ds1w.astype(jnp.float32), dm2w.astype(jnp.float32), deout, daggr)
    return outs


def _fes_plain(xi, xj, e, we, b, w1g, b1g, w1a, b1a, gamma, beta, env2d,
               dst, src, emask, dst_lo, src_lo, src_nblk, c_src, c_win,
               eps, axes, interpret):
    """Unmerged composition (edge_phase -> combine -> sigma_segsum): the
    reference semantics the merged op must match; also the dispatch target
    under interpret+vma (CPU meshes) and for CARTNET_MERGED=0 A/Bs."""
    from cartnet_tpu.nn.norm import combine_window_moments
    from cartnet_tpu.ops.pallas.segment_kernels import sigma_segsum
    gate, sender, e_res, s1w, m2w = edge_phase(
        xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask,
        dst_lo, src_lo, src_nblk, c_src, interpret)
    nt = s1w.shape[0]
    n_w = emask.reshape(nt, -1).sum(axis=1, dtype=jnp.float32)[:, None]
    (scale, shift), (mean, var, n) = combine_window_moments(
        gamma, beta, s1w, m2w, n_w, eps=eps, axis_names=axes)
    N = xi.shape[0]
    ids_eff = jnp.where(emask, dst, N).astype(jnp.int32)
    lo = ((ids_eff[::T_EDGES] // 16) * 16).astype(jnp.int32)
    e_out, aggr = sigma_segsum(gate, scale, shift, env2d.astype(gate.dtype),
                               sender, e_res, ids_eff, lo, N, c_win,
                               interpret)
    return e_out, aggr, mean, var, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19, 20, 21, 22))
def _fes_op(xi, xj, e, we, b, w1g, b1g, w1a, b1a, gamma, beta, env2d,
            dst, src, emask, dst_lo, src_lo, src_nblk, c_src, c_win,
            eps, axes, interpret):
    out, _ = _fes_fwd(xi, xj, e, we, b, w1g, b1g, w1a, b1a, gamma, beta,
                      env2d, dst, src, emask, dst_lo, src_lo, src_nblk,
                      c_src, c_win, eps, axes, interpret)
    return out


def _fes_fwd(xi, xj, e, we, b, w1g, b1g, w1a, b1a, gamma, beta, env2d,
             dst, src, emask, dst_lo, src_lo, src_nblk, c_src, c_win,
             eps, axes, interpret):
    from cartnet_tpu.nn.norm import combine_window_moments
    from cartnet_tpu.ops.pallas.segment_kernels import _sigma_fwd_call
    # merged path keeps the plain [E, 2d] pre residual (its own bwd kernel
    # consumes pre directly)
    gate, sender, pre, s1w, m2w = edge_phase_fwd(
        xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask,
        dst_lo, src_lo, src_nblk, c_src, interpret, saved=False)
    nt = s1w.shape[0]
    n_w = emask.reshape(nt, -1).sum(axis=1, dtype=jnp.float32)[:, None]
    (scale, shift), (mean, var, n) = combine_window_moments(
        gamma, beta, s1w, m2w, n_w, eps=eps, axis_names=axes)
    N = xi.shape[0]
    ids_eff = jnp.where(emask, dst, N).astype(jnp.int32)
    lo = ((ids_eff[::T_EDGES] // 16) * 16).astype(jnp.int32)
    e_out, aggr = _sigma_fwd_call(gate, scale, shift,
                                  env2d.astype(gate.dtype), sender, e,
                                  ids_eff, lo, N, c_win, interpret)
    res = (xi, xj, e, we, b, w1g, b1g, w1a, b1a, gamma, beta, env2d, dst,
           src, emask, dst_lo, src_lo, src_nblk, pre, gate, sender, s1w,
           m2w, scale, shift)
    return (e_out, aggr, mean, var, n), res


def _fes_bwd(c_src, c_win, eps, axes, interpret, res, cts):
    from cartnet_tpu.nn.norm import combine_window_moments
    (xi, xj, e, we, b, w1g, b1g, w1a, b1a, gamma, beta, env2d, dst, src,
     emask, dst_lo, src_lo, src_nblk, pre, gate, sender, s1w, m2w, scale,
     shift) = res
    deout, daggr, _, _, _ = cts   # mean/var/n feed stop-gradient state only
    N = xi.shape[0]
    nt = s1w.shape[0]
    n_w = emask.reshape(nt, -1).sum(axis=1, dtype=jnp.float32)[:, None]
    maskf = emask.astype(jnp.float32)[:, None]

    # phase A': the BN backward's global-sum barrier — dscale/dshift need
    # all edges' da before any dgate can be formed. One fused XLA reduce.
    g32 = gate.astype(jnp.float32)
    sig0 = jax.nn.sigmoid(g32 * scale.astype(jnp.float32)
                          + shift.astype(jnp.float32))
    env32 = env2d.astype(jnp.float32)
    safe = jnp.minimum(dst, N - 1)
    dvals = jnp.take(daggr, safe, axis=0).astype(jnp.float32) * maskf
    dsig = deout.astype(jnp.float32) + dvals * sender.astype(jnp.float32)
    # env cotangent (same formula as the standalone sigma kernel,
    # segment_kernels.py _sigma bwd): sigma = env * sig0 => denv = Σ_d dsig·sig0
    denv = jnp.sum(dsig * sig0, axis=1, keepdims=True)
    da = dsig * env32 * sig0 * (1.0 - sig0)
    dscale = jnp.sum(da * g32, axis=0)
    dshift = jnp.sum(da, axis=0)
    vma = vma_union(deout, daggr, xi, xj, e)
    dscale = psum_to(dscale, gamma, vma)
    dshift = psum_to(dshift, gamma, vma)

    # combine backward: (dscale, dshift) -> dgamma/dbeta + the per-window
    # moment cotangents the merged kernel folds into dgate
    def comb(gm, bt, s1, m2):
        return combine_window_moments(gm, bt, s1, m2, n_w, eps=eps,
                                      axis_names=axes)[0]

    _, comb_vjp = jax.vjp(comb, gamma, beta, s1w, m2w)
    dgamma, dbeta, ds1w, dm2w = comb_vjp((dscale.astype(scale.dtype),
                                          dshift.astype(shift.dtype)))

    meanw = s1w / jnp.maximum(n_w, 1.0)
    (de, dxi, dxj, dwe, db, dw1g, db1g, dw1a, db1a) = _merged_bwd_call(
        xi, xj, e, we, b, w1g, b1g, w1a, b1a, dst, src, emask, dst_lo,
        src_lo, src_nblk, pre, gate, sender, env2d, scale, shift, meanw,
        ds1w, dm2w, deout, daggr, c_src, interpret)

    de = psum_to(de, e, vma)
    dxi, dxj = psum_to(dxi, xi, vma), psum_to(dxj, xj, vma)
    dwe, db = psum_to(dwe, we, vma), psum_to(db, b, vma)
    dw1g, db1g = psum_to(dw1g, w1g, vma), psum_to(db1g, b1g, vma)
    dw1a, db1a = psum_to(dw1a, w1a, vma), psum_to(db1a, b1a, vma)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dxi.astype(xi.dtype), dxj.astype(xj.dtype), de,
            dwe.astype(we.dtype), db.reshape(-1).astype(b.dtype),
            dw1g.astype(w1g.dtype), db1g.reshape(-1).astype(b1g.dtype),
            dw1a.astype(w1a.dtype), db1a.reshape(-1).astype(b1a.dtype),
            dgamma, dbeta, psum_to(denv, env2d, vma).astype(env2d.dtype),
            f0(dst), f0(src), f0(emask), f0(dst_lo), f0(src_lo),
            None if src_nblk is None else f0(src_nblk))


_fes_op.defvjp(_fes_fwd, _fes_bwd)


def fused_edge_sigma(xi, xj, e, we, b, w1g, b1g, w1a, b1a, gamma, beta,
                     env2d, dst, src, emask, dst_lo, src_lo, src_nblk,
                     c_src: int, c_win: int, eps: float, axes=(),
                     interpret: bool = False):
    """Whole fused CartNet message phase with a MERGED backward: edge MLPs
    (window kernel) -> train-mode BN scale/shift from in-kernel Welford
    moments -> sigmoid-gate + envelope + residual + windowed scatter.
    Returns (e_out, aggr, mean, var, n) — mean/var/n feed the (stop-grad)
    running-stat update outside.

    MEASURED SLOWER than the unmerged composition (6.03M vs 6.63M edges/s
    in-process A/B, 2026-08-21): the BN two-phase barrier forces phase A'
    to re-read gate/sender/deout (~50 us/layer of added traffic) while the
    kernels are COMPUTE-bound, so the saved dgate/dsender round trips never
    pay. Default CARTNET_MERGED=0 keeps the unmerged path; the merged op
    stays available (tests pin its correctness) for stream-bound regimes.

    Under interpret+vma (CPU meshes) dispatches to the unmerged composition
    (whose kernels dispatch to their jnp twins).
    """
    axes = tuple(axes)
    vma = vma_union(xi, xj, e, emask)
    if ((interpret and vma)
            or _os.environ.get("CARTNET_MERGED", "0") != "1"):
        return _fes_plain(xi, xj, e, we, b, w1g, b1g, w1a, b1a, gamma, beta,
                          env2d, dst, src, emask, dst_lo, src_lo, src_nblk,
                          c_src, c_win, eps, axes, interpret)
    return _fes_op(xi, xj, e, we, b, w1g, b1g, w1a, b1a, gamma, beta, env2d,
                   dst, src, emask, dst_lo, src_lo, src_nblk, c_src, c_win,
                   eps, axes, interpret)


def _bwd_merged_kernel(c_src, banded, seg_res, dlo_ref, slo_ref, nblk_ref,
                       dids_ref, sids_ref, emask_ref, e_ref, we_ref, b_ref,
                       w1g_ref, b1g_ref, w1a_ref, b1a_ref, pre_saved_ref,
                       gate_ref, sender_ref, env_ref, scale_ref, shift_ref,
                       meanw_ref, ds1_ref, dm2_ref, deout_ref, daggr_ref,
                       de_ref, dxi_ref, dxj_ref, dwe_ref, db_ref,
                       dw1g_ref, db1g_ref, dw1a_ref, db1a_ref,
                       *banded_scratch):
    """Merged sigma+edge backward: the per-layer bwd chain used to be
    sigma-bwd kernel -> HBM dgate/dsender -> edge-bwd kernel. Here the sigma
    backward (daggr gather, gate chain) runs as a prologue of the edge
    backward, in-window — no [E, d] dgate/dsender round trips and two fewer
    serial kernel links per layer. dscale/dshift (the BN two-phase barrier)
    are computed OUTSIDE (one fused XLA reduce) and arrive folded into the
    ds1/dm2 window cotangents."""
    t = pl.program_id(0)
    d = w1g_ref.shape[0]

    @pl.when(t == 0)
    def _():
        if banded:
            dxi_buf, dxj_buf, sem_x = banded_scratch[:3]
            dxi_buf[...] = jnp.zeros_like(dxi_buf)

            def zero_chunks(ref, buf, sem, rows):
                def zl(i, _):
                    z = pltpu.make_async_copy(
                        buf, ref.at[pl.ds(i * rows, rows), :], sem)
                    z.start()
                    z.wait()
                    return 0
                jax.lax.fori_loop(0, ref.shape[0] // rows, zl, 0)

            zero_chunks(dxi_ref, dxi_buf, sem_x.at[0], C_DST)
            dxj_buf[...] = jnp.zeros_like(dxj_buf)
            zero_chunks(dxj_ref, dxj_buf, sem_x.at[1], SRC_BLK)
        else:
            dxi_ref[...] = jnp.zeros_like(dxi_ref)
            dxj_ref[...] = jnp.zeros_like(dxj_ref)
        dwe_ref[...] = jnp.zeros_like(dwe_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1g_ref[...] = jnp.zeros_like(dw1g_ref)
        db1g_ref[...] = jnp.zeros_like(db1g_ref)
        dw1a_ref[...] = jnp.zeros_like(dw1a_ref)
        db1a_ref[...] = jnp.zeros_like(db1a_ref)

    cdt = e_ref.dtype
    dlo = pl.multiple_of(dlo_ref[t], LO_ALIGN)
    slo = pl.multiple_of(slo_ref[t], LO_ALIGN)
    dims_nt = (((1,), (1,)), ((), ()))
    dims_tt = (((0,), (0,)), ((), ()))

    def _rmw(hbm_slice, buf, sem, partial):
        rd = pltpu.make_async_copy(hbm_slice, buf, sem)
        rd.start()
        rd.wait()
        buf[...] += partial
        wr = pltpu.make_async_copy(buf, hbm_slice, sem)
        wr.start()
        wr.wait()

    # ---- sigma backward prologue (in-window)
    ids = dids_ref[t]
    mask_w = emask_ref[t] > 0
    mf = mask_w.astype(jnp.float32)[:, None]
    g32 = gate_ref[...].astype(jnp.float32)
    sig0 = jax.nn.sigmoid(g32 * scale_ref[...] + shift_ref[...])
    env32 = env_ref[...].astype(jnp.float32)                   # [T, 1]
    # daggr gather over the dst band: pad edges carry out-of-band ids in the
    # one-hot (masked to an id no band column matches) -> zero rows, exactly
    # like the standalone sigma bwd's spill-region gather
    ids_eff = jnp.where(mask_w, ids, jnp.int32(2 ** 30))
    cols = jax.lax.broadcasted_iota(jnp.int32,
                                    (ids.shape[0], C_DST), 1) + dlo
    oh_a = (cols == ids_eff[:, None])
    if seg_res:
        dband = daggr_ref[pl.ds(dlo, C_DST), :]
    else:
        dbuf, dsem = banded_scratch[-2:]
        rd = pltpu.make_async_copy(daggr_ref.at[pl.ds(dlo, C_DST), :], dbuf,
                                   dsem)
        rd.start()
        rd.wait()
        dband = dbuf[...]
    dvals = jnp.dot(oh_a.astype(dband.dtype), dband,
                    preferred_element_type=jnp.float32)        # [T, d]
    sender32 = sender_ref[...].astype(jnp.float32)
    deout32 = deout_ref[...].astype(jnp.float32)
    dsig = deout32 + dvals * sender32
    da = dsig * env32 * sig0 * (1.0 - sig0)
    ds = (dvals * sig0 * env32).astype(cdt)
    # fold the BN-moment cotangents (which carry the dscale/dshift barrier,
    # combined outside) into dgate
    corr = (ds1_ref[pl.ds(t, 1), :]
            + 2.0 * dm2_ref[pl.ds(t, 1), :]
            * (g32 - meanw_ref[pl.ds(t, 1), :]))
    dg = (da * scale_ref[...] + mf * corr).astype(cdt)

    # ---- edge backward (identical to _bwd_kernel's tail)
    dh_g = jax.lax.dot_general(dg, w1g_ref[...], dims_nt,
                               preferred_element_type=jnp.float32)
    dh_a = jax.lax.dot_general(ds, w1a_ref[...], dims_nt,
                               preferred_element_type=jnp.float32)
    pre = pre_saved_ref[...].astype(jnp.float32)
    sig = jax.nn.sigmoid(pre)
    h32 = pre * sig
    h = h32.astype(cdt)
    oh_d = _onehot(ids, dlo, C_DST, cdt)
    db1g_ref[...] += jnp.sum(dg, axis=0, dtype=jnp.float32)[None, :]
    db1a_ref[...] += jnp.sum(ds, axis=0, dtype=jnp.float32)[None, :]
    dw1g_ref[...] += jax.lax.dot_general(
        h[:, :d], dg, dims_tt, preferred_element_type=jnp.float32)
    dw1a_ref[...] += jax.lax.dot_general(
        h[:, d:], ds, dims_tt, preferred_element_type=jnp.float32)
    dh = jnp.concatenate([dh_g, dh_a], axis=1)
    dpre = dh * (sig + h32 * (1.0 - sig))
    dpre_c = dpre.astype(cdt)
    db_ref[...] += jnp.sum(dpre, axis=0)[None, :]
    # d(e): the residual term (e_out = e + sigma) + the e@We term
    de_ref[...] = (deout32 + jax.lax.dot_general(
        dpre_c, we_ref[...], dims_nt,
        preferred_element_type=jnp.float32)).astype(de_ref.dtype)
    dwe_ref[...] += jax.lax.dot_general(
        e_ref[...], dpre_c, dims_tt, preferred_element_type=jnp.float32)
    dxi_part = jax.lax.dot_general(
        oh_d, dpre_c, dims_tt, preferred_element_type=jnp.float32)
    if banded:
        dxi_buf, dxj_buf, sem_x = banded_scratch[:3]
        _rmw(dxi_ref.at[pl.ds(dlo, C_DST), :], dxi_buf, sem_x.at[0],
             dxi_part)
    else:
        dxi_ref[pl.ds(dlo, C_DST), :] += dxi_part
    sids = sids_ref[t]
    for k in range(c_src // SRC_BLK):
        @pl.when(nblk_ref[t] > k)
        def _(k=k):
            blo = pl.multiple_of(slo + k * SRC_BLK, 8)
            oh_k = _onehot(sids, blo, SRC_BLK, cdt)
            dxj_part = jax.lax.dot_general(
                oh_k, dpre_c, dims_tt, preferred_element_type=jnp.float32)
            if banded:
                dxi_buf, dxj_buf, sem_x = banded_scratch[:3]
                _rmw(dxj_ref.at[pl.ds(blo, SRC_BLK), :], dxj_buf,
                     sem_x.at[1], dxj_part)
            else:
                dxj_ref[pl.ds(blo, SRC_BLK), :] += dxj_part


def edge_tables_resident(n_i: int, n_j: int, dim: int,
                         itemsize: int = 2) -> bool:
    """True when the whole node tables (fwd) + f32 grad accumulators (bwd)
    fit comfortably in VMEM — the fast path. Otherwise the kernels run in
    BANDED mode: tables stay in HBM and each window DMAs just its bands
    (VMEM O(window), any N)."""
    d2 = 2 * dim
    rows = n_i + n_j
    vmem = (rows * d2 * itemsize            # fwd xi/xj resident
            + rows * d2 * 4                 # bwd dxi/dxj f32 accumulators
            + 3 * dim * d2 * 4              # weight grads
            + 6 * T_EDGES * d2 * 4)         # window intermediates
    return vmem < 14 * 1024 * 1024


def edge_fuse_shapes_ok(num_edges: int, num_nodes: int, dim: int,
                        itemsize: int = 2, num_src_nodes: int = None,
                        c_src: int = None) -> bool:
    """Static gate: window divisibility + lane alignment. No VMEM bound on
    N any more — when the tables don't fit (edge_tables_resident False) the
    kernels stream banded slices from HBM instead, which additionally needs
    DMA-chunkable table sizes (multiples of the band quanta).
    ``num_src_nodes``: rows of the src table when it differs from the dst
    table (halo [local ‖ recv] layout)."""
    if num_src_nodes is None:
        num_src_nodes = num_nodes
    if c_src is None:
        c_src = C_SRC
    ok = (num_edges % T_EDGES == 0 and dim % 128 == 0
          and num_nodes % LO_ALIGN == 0 and num_src_nodes % LO_ALIGN == 0
          and num_nodes >= C_DST and num_src_nodes >= c_src)
    if ok and not edge_tables_resident(num_nodes, num_src_nodes, dim,
                                       itemsize):
        # banded mode: t==0 zero-loops walk the accumulators in band-sized
        # chunks, and band DMAs must stay inside the tables
        ok = (num_nodes % C_DST == 0 and num_src_nodes % SRC_BLK == 0)
    return ok
