"""Halo-exchange edge partitioning: nodes AND edges sharded over ``ep``.

The round-1 edge-parallel layout replicated every node array and all-reduced
the complete [N, d] aggregate per layer — O(N·d·layers) ICI traffic regardless
of how separable the graph is. This module implements the BASELINE north-star
design (SURVEY.md §2.2/§7.7, no reference counterpart): each ep member OWNS a
contiguous range of nodes and exactly the edges whose DESTINATION it owns, so

  * the scatter/segment-sum of message passing is fully member-local
    (dst-partitioned edges need no reduce-scatter);
  * the only per-layer communication is the halo: boundary SOURCE-node
    features fetched from their owners with one all_to_all over the ep axis;
  * node partitions snap to graph boundaries whenever the batch's crystals
    fit whole members, making the halo EMPTY (zero comms bytes) for ordinary
    multi-graph batches — halo traffic only pays for graphs genuinely split
    across chips (the CP/ring-attention analogue for graph-size scaling).

Host-side planning (``to_halo``) is pure numpy on an already-collated batch;
device-side exchange (``halo_table``) is one gather + lax.all_to_all + concat
whose AD transpose shard_map derives automatically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from cartnet_tpu.data.schema import CrystalBatch


class HaloInfeasible(ValueError):
    pass


def _partition_nodes(node_mask: np.ndarray, graph_id: np.ndarray,
                     edge_dst: np.ndarray, edge_mask: np.ndarray,
                     ep: int, n_per: int, e_per: int,
                     cum_edges: Optional[np.ndarray] = None) -> np.ndarray:
    """Contiguous node-range bounds [ep+1] balancing in-edges under caps.

    Strategy: try an ALL-SNAPPED partition first (every cut at a graph
    start — zero halo), using a right-to-left suffix-feasibility table so a
    member never takes so many graphs that the remainder cannot fit. Only
    when no snapped partition exists fall back to the greedy mid-graph
    splitter (paid for via halo exchange).

    ``cum_edges``: edges-into-[0, i) at the member-edge accounting the
    caller uses (to_halo passes ALL dst-in-range edges incl. alignment
    pads, so capacity checks match the slices actually taken).
    """
    n = len(node_mask)
    nr = int(node_mask.sum())
    if cum_edges is None:
        indeg = np.bincount(edge_dst[edge_mask], minlength=n)
        cum_edges = np.concatenate([[0], np.cumsum(indeg)])
    er = int(cum_edges[nr])
    graph_starts = np.flatnonzero(np.diff(
        np.concatenate([[-1], graph_id[:nr]])) != 0)

    def fits(lo, hi):
        return (hi - lo <= n_per
                and cum_edges[hi] - cum_edges[lo] <= e_per)

    # --- all-snapped attempt -------------------------------------------
    # suffix_members[j] = min members to hold graphs starting at node
    # boundary gs[j] .. nr with greedy max packing from the left
    gs = np.concatenate([graph_starts, [nr]])
    ng = len(gs) - 1
    suffix = np.full(ng + 1, 10 ** 9, np.int64)
    suffix[ng] = 0
    for j in range(ng - 1, -1, -1):
        # largest j2 > j with graphs [j, j2) fitting one member
        j2 = j
        while j2 + 1 <= ng and fits(gs[j], gs[j2 + 1]):
            j2 += 1
        if j2 > j and suffix[j2] < 10 ** 9:
            suffix[j] = suffix[j2] + 1
        # also allow taking fewer graphs if that unlocks a feasible suffix
        for jt in range(j2, j, -1):
            if suffix[jt] + 1 < suffix[j]:
                suffix[j] = suffix[jt] + 1
    if suffix[0] <= ep:
        bounds = [0]
        j = 0
        for m in range(ep - 1):
            left = ep - m - 1
            # take as many whole graphs as possible while the suffix still
            # fits the remaining members
            j2 = j
            while (j2 + 1 <= ng and fits(gs[j], gs[j2 + 1])
                   and suffix[j2 + 1] <= left):
                j2 += 1
            bounds.append(int(gs[j2]))
            j = j2
        bounds.append(nr)
        bounds = np.asarray(bounds, np.int64)
        if all(fits(bounds[m], bounds[m + 1]) for m in range(ep)):
            return bounds

    # --- greedy mid-graph fallback -------------------------------------
    bounds = [0]
    for m in range(ep - 1):
        lo = bounds[-1]
        target_edges = er * (m + 1) / ep
        # furthest cut satisfying both caps for THIS member
        hi_cap = min(lo + n_per, nr)
        while hi_cap > lo and cum_edges[hi_cap] - cum_edges[lo] > e_per:
            hi_cap -= 1
        # prefer the edge-balanced cut if it fits, else the cap
        hi_bal = int(np.searchsorted(cum_edges, target_edges))
        hi = min(max(hi_bal, lo), hi_cap)
        # snap to the graph boundary nearest the balanced cut within
        # (lo, hi_cap] — graph-aligned cuts cost zero halo
        snaps = graph_starts[(graph_starts > lo) & (graph_starts <= hi_cap)]
        if len(snaps):
            hi = int(snaps[np.argmin(np.abs(snaps - hi))])
        if hi <= lo and nr > lo:
            hi = min(lo + 1, hi_cap) if hi_cap > lo else lo
        # forward feasibility: the REMAINING members must be able to hold
        # the remaining nodes/edges — push this cut forward (past a snap if
        # necessary) until they can
        left = ep - m - 1
        while hi < nr and (nr - hi > left * n_per
                           or er - cum_edges[hi] > left * e_per):
            hi += 1
        if hi > hi_cap:
            raise HaloInfeasible(
                f"member {m}: no cut satisfies caps (n_per={n_per}, "
                f"e_per={e_per}) — raise max_nodes/max_edges padding")
        bounds.append(hi)
    bounds.append(nr)
    bounds = np.asarray(bounds, np.int64)
    # feasibility: every member within caps
    for m in range(ep):
        ln = bounds[m + 1] - bounds[m]
        le = cum_edges[bounds[m + 1]] - cum_edges[bounds[m]]
        if ln > n_per or le > e_per:
            raise HaloInfeasible(
                f"member {m}: {ln} nodes (cap {n_per}) / {le} edges "
                f"(cap {e_per}) — raise max_nodes/max_edges padding")
    return bounds


def to_halo(batch: CrystalBatch, ep: int,
            h_max: Optional[int] = None) -> CrystalBatch:
    """Re-layout a collated (numpy) dp-slice batch for halo edge parallelism.

    Node/edge arrays become member-major blocks of n_per = N/ep and
    e_per = E/ep; edge_dst is member-LOCAL (still ascending per member);
    edge_src indexes the member table [local (n_per) ‖ recv (ep*h_max)].
    """
    N, E = batch.z.shape[0], batch.edge_src.shape[0]
    if N % ep or E % ep:
        raise HaloInfeasible(f"pad sizes must divide ep: N={N} E={E} ep={ep}")
    n_per, e_per = N // ep, E // ep
    if h_max is None:
        h_max = n_per  # one owner can contribute at most its n_per rows
    node_mask = np.asarray(batch.node_mask)
    edge_mask = np.asarray(batch.edge_mask)
    dst = np.asarray(batch.edge_dst).astype(np.int64)
    src = np.asarray(batch.edge_src).astype(np.int64)
    graph_id = np.asarray(batch.graph_id)
    # member capacity must count ALL edges whose dst falls in range — the
    # slices below keep interior (graph-alignment) pad edges so member
    # windows stay graph-aligned and the fused kernel plans survive. Tail
    # pads (everything after the last real edge) are excluded from the
    # accounting; members re-pad their own tails.
    real_pos = np.flatnonzero(edge_mask)
    e_end = int(real_pos.max()) + 1 if len(real_pos) else 0
    cum_all = np.searchsorted(dst[:e_end], np.arange(len(node_mask) + 1),
                              "left")
    bounds = _partition_nodes(node_mask, graph_id, dst, edge_mask, ep,
                              n_per, e_per, cum_edges=cum_all)

    adp = np.ndim(batch.y) == 3
    nz = lambda shape, dt: np.zeros(shape, dt)
    out_z = nz(N, np.int32)
    out_pos = nz((N, 3), np.float32)
    out_gid = nz(N, np.int32)
    out_nmask = nz(N, bool)
    out_nonh = nz(N, bool)
    out_y = nz((N, 3, 3), np.float32) if adp else np.asarray(batch.y)
    out_src = np.zeros(E, np.int32)
    out_dst = np.zeros(E, np.int32)
    out_dist = nz(E, np.float32)
    out_dir = nz((E, 3), np.float32)
    out_emask = nz(E, bool)
    send_idx = nz((ep, ep, h_max), np.int32)
    send_mask = nz((ep, ep, h_max), bool)

    owner_of = np.searchsorted(bounds, np.arange(N), side="right") - 1
    owner_of = np.clip(owner_of, 0, ep - 1)

    for m in range(ep):
        lo, hi = int(bounds[m]), int(bounds[m + 1])
        ln = hi - lo
        nsl = slice(m * n_per, m * n_per + ln)
        out_z[nsl] = np.asarray(batch.z)[lo:hi]
        out_pos[nsl] = np.asarray(batch.pos)[lo:hi]
        out_gid[nsl] = graph_id[lo:hi]
        out_nmask[nsl] = node_mask[lo:hi]
        out_nonh[nsl] = np.asarray(batch.non_h_mask)[lo:hi]
        if adp:
            out_y[nsl] = np.asarray(batch.y)[lo:hi]

        # contiguous dst-range slice of the globally dst-sorted edge list —
        # ALL edges incl. interior alignment pads, preserving graph-aligned
        # windows inside the member (critical for the fused kernel plans)
        e0, e1 = int(cum_all[lo]), int(cum_all[hi])
        esel = np.arange(e0, e1)
        le = len(esel)
        if le > e_per:
            raise HaloInfeasible(
                f"member {m}: {le} edges (cap {e_per}) — raise max_edges")
        emask_m = edge_mask[esel]
        esl = slice(m * e_per, m * e_per + le)
        # local dst ids; preserved dst-sorted order stays ascending
        out_dst[esl] = (dst[esel] - lo).astype(np.int32)
        out_dist[esl] = np.asarray(batch.cart_dist)[esel]
        out_dir[esl] = np.asarray(batch.cart_dir)[esel]
        out_emask[esl] = emask_m
        # tail pad edges of this member point at its last local row (monotone)
        pad_sl = slice(m * e_per + le, (m + 1) * e_per)
        out_dst[pad_sl] = max(n_per - 1, 0)
        out_src[pad_sl] = 0

        # src remap: local rows, or halo slots per owner. Only REAL edges
        # allocate halo slots; pad edges (alignment/tail) point at their own
        # dst row — in-range, masked downstream.
        e_src = src[esel]
        e_owner = owner_of[e_src]
        src_ids = np.empty(le, np.int32)
        src_ids[~emask_m] = (dst[esel][~emask_m] - lo).astype(np.int32)
        local = (e_owner == m) & emask_m
        src_ids[local] = (e_src[local] - lo).astype(np.int32)
        remote = (~local) & emask_m
        for o in np.unique(e_owner[remote]):
            sel = (e_owner == o) & remote
            rows = np.unique(e_src[sel])  # global rows owned by o
            if len(rows) > h_max:
                raise HaloInfeasible(
                    f"halo {len(rows)} rows from member {int(o)} to {m} "
                    f"exceeds h_max={h_max}")
            # sender-side layout: member o sends these (local to o) to m
            send_idx[o, m, :len(rows)] = (rows - bounds[o]).astype(np.int32)
            send_mask[o, m, :len(rows)] = True
            slot = np.searchsorted(rows, e_src[sel])
            # recv-block rank: neighbors-first rolled order (owner m+1 right
            # after the local rows). RCM + contiguous cuts mean nearly all
            # remote refs come from member m+1, so the table span a boundary
            # window must cover stays ~[top-of-local .. n_per + |halo|]
            # instead of jumping o*h_max rows — without this the fused plans
            # fail on genuinely split crystals (span > band). The device side
            # builds the same order with jnp.roll (models/cartnet.py).
            rank = (int(o) - m - 1) % ep
            src_ids[sel] = (n_per + rank * h_max + slot).astype(np.int32)
        out_src[esl] = src_ids

    # per-member Pallas window plans (VERDICT r2 #1): the sharded step runs
    # the fused kernels member-locally, so every member's window spans must
    # hold — dst against its local node block, src against its
    # [local (n_per) ‖ recv (ep*h_max)] table. One traced program covers all
    # members, so the flags AND over members.
    from cartnet_tpu.data.batching import _windows_ok
    from cartnet_tpu.ops.pallas.edge_kernels import (C_SRC, T_EDGES,
                                                     plan_edge_windows)
    seg_ok = e_per % T_EDGES == 0
    fuse_ok = seg_ok
    nt = max(E // T_EDGES, 1)
    dst_lo = np.zeros(nt, np.int32)
    src_lo = np.zeros(nt, np.int32)
    src_nblk = np.zeros(nt, np.int32)
    src_band = SRC_BAND_MIN = 128
    n_src = n_per + ep * h_max
    nt_per = e_per // T_EDGES if seg_ok else 0
    plans = []
    for m in range(ep):
        if not seg_ok:
            break
        sl = slice(m * e_per, (m + 1) * e_per)
        seg_ok = seg_ok and _windows_ok(out_dst[sl], out_emask[sl])
        if fuse_ok:
            ok_m, dlo_m, slo_m, nblk_m, band_m = plan_edge_windows(
                out_dst[sl], out_src[sl], out_emask[sl], n_per, n_src)
            fuse_ok = bool(ok_m)
            if ok_m:
                plans.append((sl, out_dst[sl], out_src[sl], out_emask[sl]))
                src_band = max(src_band, int(band_m))
                dst_lo[m * nt_per:(m + 1) * nt_per] = dlo_m
                src_lo[m * nt_per:(m + 1) * nt_per] = slo_m
                src_nblk[m * nt_per:(m + 1) * nt_per] = nblk_m
    if fuse_ok and seg_ok and src_band > SRC_BAND_MIN:
        # one traced program covers all members: re-plan every member at the
        # shared (max) band so slo clamps are consistent
        from cartnet_tpu.ops.pallas.edge_kernels import edge_windows_ok
        for (sl, dst_m, src_m, mask_m), m in zip(plans, range(ep)):
            ok_m, dlo_m, slo_m, nblk_m = edge_windows_ok(
                dst_m, src_m, mask_m, n_per, n_src, band=src_band)
            fuse_ok = fuse_ok and bool(ok_m)
            if ok_m:
                dst_lo[m * nt_per:(m + 1) * nt_per] = dlo_m
                src_lo[m * nt_per:(m + 1) * nt_per] = slo_m
                src_nblk[m * nt_per:(m + 1) * nt_per] = nblk_m
    if not fuse_ok:
        dst_lo[:] = 0
        src_lo[:] = 0
        src_nblk[:] = 0
        src_band = C_SRC

    # overlap/fused coexistence (VERDICT r3 next #6): reorder each member's
    # windows interior-first (no real src row >= n_per, i.e. untouched by the
    # recv block). The layer then runs the fused kernel on the first
    # ``interior_nt`` windows against a zeros-recv table WHILE the boundary
    # all_to_all flies, and a second kernel call handles the rest. Window
    # permutation is sound: every kernel/plan is per-window, windows stay
    # internally dst-sorted, and the (rare) unfused fallback switches to
    # unsorted scatter when interior_nt > 0 (models/cartnet.py).
    interior_nt = 0
    if fuse_ok and seg_ok and send_mask.sum() > 0:
        ni_list = []
        for m in range(ep):
            base = m * e_per
            interior, boundary = [], []
            for w in range(nt_per):
                wsl = slice(base + w * T_EDGES, base + (w + 1) * T_EDGES)
                mreal = out_emask[wsl]
                is_b = bool((out_src[wsl][mreal] >= n_per).any()) \
                    if mreal.any() else False
                (boundary if is_b else interior).append(w)
            perm = np.asarray(interior + boundary, np.int64)
            ni_list.append(len(interior))
            for arr in (out_dst, out_src, out_dist, out_emask, out_dir):
                blk = arr[base:base + e_per].reshape(
                    (nt_per, T_EDGES) + arr.shape[1:])
                arr[base:base + e_per] = blk[perm].reshape(
                    (e_per,) + arr.shape[1:])
            pb = m * nt_per
            for arr in (dst_lo, src_lo, src_nblk):
                arr[pb:pb + nt_per] = arr[pb:pb + nt_per][perm]
        ni = min(ni_list)
        # floor to a power of two: bounds the distinct compiled programs to
        # log2(nt_per) while keeping most of the overlapped work
        interior_nt = (1 << (ni.bit_length() - 1)) if ni > 0 else 0

    return batch.replace(
        halo_interior_nt=int(interior_nt),
        z=out_z, pos=out_pos, graph_id=out_gid, node_mask=out_nmask,
        non_h_mask=out_nonh, y=out_y,
        edge_src=out_src, edge_dst=out_dst, cart_dist=out_dist,
        cart_dir=out_dir, edge_mask=out_emask,
        edge_src_perm=None, edge_mask_src_sorted=None, src_degree=None,
        pallas_seg_ok=bool(seg_ok),
        edge_dst_lo=dst_lo, edge_src_lo=src_lo, edge_src_nblk=src_nblk,
        src_band=int(src_band),
        edge_fuse_ok=bool(fuse_ok),
        edge_src_sorted=None,
        halo_empty=bool(send_mask.sum() == 0),
        halo_send_idx=send_idx, halo_send_mask=send_mask)


def halo_recv_rows(x, send_idx, halo_empty: bool, ep_axis: str):
    """The recv block of ``halo_table`` alone: [ep*H, d] boundary rows from
    their owners, in the neighbors-first rolled rank order ``to_halo``'s src
    ids were built against. ``halo_empty`` (a static collate flag) skips the
    collective entirely for graph-snapped zero-comms layouts — the zeros
    block only keeps the table shape the kernel plans were built for."""
    import jax
    import jax.numpy as jnp
    ep, h = send_idx.shape
    if halo_empty:
        return jnp.zeros((ep * h, x.shape[-1]), x.dtype)
    send = x[send_idx]  # [ep, H, d] — local rows destined for each member
    recv = jax.lax.all_to_all(send, ep_axis, split_axis=0, concat_axis=0)
    m_idx = jax.lax.axis_index(ep_axis)
    recv = jnp.roll(recv, -(m_idx + 1), axis=0)
    return recv.reshape(-1, x.shape[-1])


def halo_scatter_back(local, remote, send_idx, halo_empty: bool,
                      ep_axis: str):
    """Transpose of the table gather for FORWARD src-directed scatters.

    A segment-sum over table ids (n_per local rows ‖ ep*H recv slots)
    produces ``local`` [n_per, C] plus ``remote`` [ep*H, C] partial sums that
    belong to OTHER members' rows (e.g. the equi block's scatter-mean onto
    edge SOURCES, models/equivariant.py — the one reference dataflow that
    aggregates toward the un-owned endpoint). Returns the complete per-owner
    sums: partials are rolled back from rank order to owner order, exchanged
    with one all_to_all (the exact reverse of ``halo_recv_rows``), and
    scatter-added into the sender's rows. Unused slots carry zeros (no edge
    references them), so the index-0 default rows are harmless.
    """
    import jax
    import jax.numpy as jnp
    if halo_empty:
        return local
    ep, h = send_idx.shape
    rem = remote.reshape(ep, h, -1)
    m_idx = jax.lax.axis_index(ep_axis)
    rem = jnp.roll(rem, m_idx + 1, axis=0)  # rank order -> owner order
    back = jax.lax.all_to_all(rem, ep_axis, split_axis=0, concat_axis=0)
    # back[s] = partials member s computed for MY rows send_idx[s]
    return local.at[send_idx.reshape(-1)].add(
        back.reshape(ep * h, local.shape[-1]))


def halo_table(x, send_idx, ep_axis: str):
    """Per-layer boundary exchange: one gather + all_to_all over ``ep_axis``.

    x: member-local [n_per, d]; send_idx: [ep, H] rows this member sends to
    every other member. Returns the gather table
    [n_per + ep*H, d] = [x ‖ recv-from-(m+1) ‖ recv-from-(m+2) ‖ ...]
    (neighbors-first rolled block order, matching to_halo's src ids);
    edge_src ids from ``to_halo`` index straight into it. Unfilled slots are
    never referenced by real edges, so no receiver-side masking is needed.
    """
    import jax
    import jax.numpy as jnp
    send = x[send_idx]  # [ep, H, d] — local rows destined for each member
    recv = jax.lax.all_to_all(send, ep_axis, split_axis=0, concat_axis=0)
    m_idx = jax.lax.axis_index(ep_axis)
    recv = jnp.roll(recv, -(m_idx + 1), axis=0)
    return jnp.concatenate([x, recv.reshape(-1, x.shape[-1])], axis=0)


def comms_bytes_per_layer(batch: CrystalBatch, dim: int,
                          itemsize: int = 4) -> Tuple[int, int]:
    """(halo_bytes, replicated_psum_bytes) per message-passing layer.

    halo: real send rows, once out + once in. replicated baseline: ring
    all-reduce of the full [N, d] aggregate = 2·(ep-1)/ep · N·d.
    """
    ep = batch.halo_send_idx.shape[-2]
    sent = int(np.asarray(batch.halo_send_mask).sum())
    halo = 2 * sent * dim * itemsize
    n_total = batch.z.shape[0]
    psum = int(2 * (ep - 1) / ep * n_total * dim * itemsize)
    return halo, psum
