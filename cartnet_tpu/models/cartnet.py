"""CartNet: Cartesian-frame message-passing GNN, TPU-native.

Behavioral parity with /root/reference/models/cartnet.py (Encoder :75-161,
CartNet_layer :163-274, Cholesky_head :276-305, Scalar_head :307-327) with a
TPU-first compute layout:

  * Static padded shapes; masked BatchNorm over real edges/nodes only.
  * The per-edge gate/aggregate MLPs' FIRST layer acts on [x_dst ‖ x_src ‖ e].
    We split its weight row-blocks: x@W_i and x@W_j are computed ONCE per node
    ([N,d] MXU matmuls) and gathered per edge, instead of materializing
    [E, 3d] and doing an [E,3d]x[3d,d] matmul. Identical math
    (concat-matmul ≡ sum of block matmuls), ~3x fewer edge-level FLOPs and
    far less HBM traffic at avg degree ~30.
  * Aggregation is a deterministic sorted segment-sum (edges pre-sorted by
    destination at collation).

All functions are pure; BN running stats are threaded explicitly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cartnet_tpu.config import ModelConfig
from cartnet_tpu.data.schema import CrystalBatch
from cartnet_tpu.nn import core as nn
from cartnet_tpu.nn.norm import batch_norm_init, masked_batch_norm
from cartnet_tpu.ops import rbf as rbf_ops
from cartnet_tpu.ops import segment
from cartnet_tpu.ops.linalg3 import assemble_cholesky_upper


# ---------------------------------------------------------------- encoder

def encoder_init(key, cfg: ModelConfig):
    d, dtype = cfg.dim_in, cfg.param_dtype
    keys = jax.random.split(key, 4)
    p = {}
    if cfg.use_atom_types:
        p["embedding"] = nn.embedding_init(keys[0], 119, 2 * d, dtype, "xavier")
    elif not cfg.use_temperature:
        # reference fallback: a single learned row broadcast to all atoms
        # (/root/reference/models/cartnet.py:116,151) — torch default N(0,1) init
        p["embedding"] = nn.embedding_init(keys[0], 1, d, dtype, "normal")
    if cfg.use_temperature:
        p["temp_proj"] = nn.torch_linear_init(keys[1], 1, 2 * d, True, dtype)
    elif cfg.use_atom_types:
        p["bias"] = jnp.zeros((2 * d,), dtype)
    if cfg.use_temperature or cfg.use_atom_types:
        p["atom_mlp"] = nn.torch_linear_init(keys[2], 2 * d, d, True, dtype)
    dim_edge = cfg.dim_rbf + (0 if cfg.invariant else 3)
    p["edge_mlp"] = nn.mlp_init(keys[3], [dim_edge, 2 * d, d], True, dtype)
    means, betas = rbf_ops.exp_normal_params(0.0, cfg.radius, cfg.dim_rbf, dtype)
    p["rbf_means"], p["rbf_betas"] = means, betas
    return p


def encoder_apply(p, batch: CrystalBatch, cfg: ModelConfig):
    """Returns (x [N,d], e [E,d])."""
    dt = cfg.compute_dtype
    # embedding + per-graph gathers as one-hot MXU matmuls: bit-exact with
    # jnp.take, but the backward becomes a dense matmul instead of the
    # ~19 us/step serial scatter XLA emits for take's VJP (nn.core)
    if cfg.use_temperature and cfg.use_atom_types:
        t = nn.linear(p["temp_proj"], batch.temperature[:, None].astype(dt))
        x = (nn.embedding_onehot(p["embedding"], batch.z, dt)
             + nn.gather_rows_onehot(t, batch.graph_id, batch.num_graphs, dt))
    elif cfg.use_atom_types:
        x = nn.embedding_onehot(p["embedding"], batch.z, dt) + p["bias"]
    elif cfg.use_temperature:
        t = nn.linear(p["temp_proj"], batch.temperature[:, None].astype(dt))
        x = nn.gather_rows_onehot(t, batch.graph_id, batch.num_graphs, dt)
    else:
        x = jnp.broadcast_to(p["embedding"]["w"][0].astype(dt),
                             (batch.num_nodes, cfg.dim_in))
    if cfg.use_temperature or cfg.use_atom_types:
        # Sequential(SiLU, Linear, SiLU): activation applied BEFORE the linear
        # (/root/reference/models/cartnet.py:125-127)
        x = jax.nn.silu(nn.linear(p["atom_mlp"], jax.nn.silu(x)))

    feats = rbf_ops.exp_normal_smearing(batch.cart_dist.astype(dt),
                                        p["rbf_means"].astype(dt),
                                        p["rbf_betas"].astype(dt), cfg.radius)
    if not cfg.invariant:
        feats = jnp.concatenate([feats, batch.cart_dir.astype(dt)], axis=-1)
    e = nn.mlp_silu(p["edge_mlp"], feats, 2, final_act=True)
    return x, e


# ---------------------------------------------------------------- layer

# test hook: run the fused sigma/segsum kernel in interpret mode on CPU
_FORCE_SIGMA_INTERPRET = False


def kernels_active(batch: CrystalBatch, dim: int, itemsize: int = 2,
                   dp: int = 1, ep: int = 1) -> bool:
    """What the fused Pallas paths will actually do for THIS batch, for the
    ``fused_fraction`` stat: True when BOTH kernel families run (plan flags
    AND the shape/VMEM gates AND the env/platform gates). Shares the exact
    predicates the dispatch sites use (ops/dispatch.py) — no mirror to
    drift. ``dp``/``ep``: the mesh a stacked super-batch is sharded over
    (the gates apply to the PER-DEVICE shard sizes)."""
    from cartnet_tpu.ops import dispatch
    if not (batch.edge_fuse_ok and batch.pallas_seg_ok):
        return False
    if dim <= 0:
        return True  # width unknown (logger not configured): flags only
    e, n, n_src = dispatch.shard_shapes(batch, dp, ep)
    return (dispatch.edge_fuse_active(e, n, dim, itemsize, n_src,
                                      batch.src_band,
                                      plans=batch.edge_dst_lo is not None)
            and dispatch.sigma_active(e, dim, n,
                                      interpret_ok=_FORCE_SIGMA_INTERPRET))


def layer_init(key, cfg: ModelConfig):
    d, dtype = cfg.dim_in, cfg.param_dtype
    k1, k2 = jax.random.split(key)
    p = {"mlp_gate": nn.mlp_init(k1, [3 * d, d, d], True, dtype),
         "mlp_aggr": nn.mlp_init(k2, [3 * d, d, d], True, dtype)}
    bn_p, bn_s = batch_norm_init(d, dtype)
    bn2_p, bn2_s = batch_norm_init(d, dtype)
    p["bn"], p["bn2"] = bn_p, bn2_p
    return p, {"bn": bn_s, "bn2": bn2_s}


def _merged_proj(p, x, d):
    """Merged first-layer weight blocks + node projections shared by the
    fused paths: wi/wj stack the gate & aggregate MLPs' dst/src blocks so
    one [N, 2d] projection per endpoint serves both MLPs (see
    _dual_edge_mlp)."""
    wg, bg = p["mlp_gate"]["lin0"]["w"], p["mlp_gate"]["lin0"]["b"]
    wa, ba = p["mlp_aggr"]["lin0"]["w"], p["mlp_aggr"]["lin0"]["b"]
    wi = jnp.concatenate([wg[:d], wa[:d]], axis=1)
    wj = jnp.concatenate([wg[d:2 * d], wa[d:2 * d]], axis=1)
    we = jnp.concatenate([wg[2 * d:], wa[2 * d:]], axis=1)
    b = jnp.concatenate([bg, ba])
    xi = jnp.dot(x, wi, preferred_element_type=x.dtype)
    xj = jnp.dot(x, wj, preferred_element_type=x.dtype)
    return xi, xj, we, b


def _dual_edge_mlp(p, x, e, batch: CrystalBatch,
                   ep_axis: Optional[str] = None):
    """Both per-edge MLPs (gate & aggregate) with merged projections.

    Each MLP's first layer acts on [x_dst ‖ x_src ‖ e] (reference concat order
    models/cartnet.py:237,256; x_i = x[dst] PyG target, x_j = x[src]). The
    two MLPs' node blocks are fused into ONE [N, 2d] projection per endpoint
    so each endpoint needs a single [E, 2d] gather instead of two [E, d]
    gathers; gathers use sorted-VJP (dst is pre-sorted, src via the collate
    permutation) so backward scatter-adds hit the fast sorted path.
    Identical math to two independent MLP([xi‖xj‖e]) evaluations.

    Halo mode (batch.halo_send_idx set, nodes sharded over ``ep_axis``):
    boundary source rows are exchanged ONCE at d-width (parallel/halo.py),
    then the member-local table is projected and gathered member-locally.
    """
    d = x.shape[-1]
    wg, bg = p["mlp_gate"]["lin0"]["w"], p["mlp_gate"]["lin0"]["b"]
    wa, ba = p["mlp_aggr"]["lin0"]["w"], p["mlp_aggr"]["lin0"]["b"]
    wi = jnp.concatenate([wg[:d], wa[:d]], axis=1)              # [d, 2d]
    wj = jnp.concatenate([wg[d:2 * d], wa[d:2 * d]], axis=1)
    we = jnp.concatenate([wg[2 * d:], wa[2 * d:]], axis=1)
    b = jnp.concatenate([bg, ba])

    if batch.halo_send_idx is not None:
        # the boundary exchange is dispatched FIRST: everything until the
        # recv-dependent ops below is independent of it, so XLA's async
        # collective scheduling hides the all_to_all behind the local
        # projections + interior gathers (SURVEY §7.7 overlap north star)
        send_idx = batch.halo_send_idx.reshape(
            batch.halo_send_idx.shape[-2:])  # [ep, H] member block
        if batch.halo_empty:
            # graph-snapped cuts: zero-comms layout — no gather, no
            # collective; src ids never reference the recv block, which only
            # exists to keep the table shape the plans were built against
            recv_rows = jnp.zeros(
                (send_idx.shape[0] * send_idx.shape[1], x.shape[-1]),
                x.dtype)
        else:
            send = x[send_idx]  # [ep, H, d] rows destined for each member
            recv = jax.lax.all_to_all(send, ep_axis, split_axis=0,
                                      concat_axis=0)
            # neighbors-first rolled block order: owner (m+1+r) % ep sits at
            # rank r, matching to_halo's src-id layout (keeps boundary-window
            # spans narrow enough for the fused plans)
            m_idx = jax.lax.axis_index(ep_axis)
            recv = jnp.roll(recv, -(m_idx + 1), axis=0)
            recv_rows = recv.reshape(-1, x.shape[-1])
        n_per = x.shape[0]
        # dst is member-local (< n_per): project only the local rows for xi
        xi = jnp.dot(x, wi, preferred_element_type=x.dtype)
        from cartnet_tpu.ops import dispatch
        n_table = n_per + recv_rows.shape[0]
        if dispatch.edge_fuse_active(
                batch.num_edges, n_per, d, x.dtype.itemsize, n_table,
                batch.src_band,
                plans=batch.edge_fuse_ok and batch.edge_dst_lo is not None):
            from cartnet_tpu.ops.pallas import edge_kernels as ek
            from cartnet_tpu.ops.pallas.segment_kernels import on_tpu
            interp = not on_tpu()
            lin1 = (p["mlp_gate"]["lin1"]["w"], p["mlp_gate"]["lin1"]["b"],
                    p["mlp_aggr"]["lin1"]["w"], p["mlp_aggr"]["lin1"]["b"])
            ni = batch.halo_interior_nt
            Ei = ni * ek.T_EDGES
            if 0 < Ei < batch.num_edges and not batch.halo_empty:
                # overlap + fused coexistence: to_halo ordered each member's
                # windows interior-first, so the first ni windows never index
                # the recv block — run them against a zeros-recv table while
                # the all_to_all is in flight, then a second kernel call for
                # the boundary windows (VERDICT r3 next #6)
                t1 = jnp.concatenate([x, jnp.zeros_like(recv_rows)], axis=0)
                xj1 = jnp.dot(t1, wj, preferred_element_type=x.dtype)
                o1 = ek.edge_phase(
                    xi, xj1, e[:Ei], we, b, *lin1,
                    batch.edge_dst[:Ei], batch.edge_src[:Ei],
                    batch.edge_mask[:Ei], batch.edge_dst_lo[:ni],
                    batch.edge_src_lo[:ni], batch.edge_src_nblk[:ni],
                    batch.src_band, interp)
                t2 = jnp.concatenate([x, recv_rows], axis=0)
                xj2 = jnp.dot(t2, wj, preferred_element_type=x.dtype)
                o2 = ek.edge_phase(
                    xi, xj2, e[Ei:], we, b, *lin1,
                    batch.edge_dst[Ei:], batch.edge_src[Ei:],
                    batch.edge_mask[Ei:], batch.edge_dst_lo[ni:],
                    batch.edge_src_lo[ni:], batch.edge_src_nblk[ni:],
                    batch.src_band, interp)
                return tuple(jnp.concatenate([a, c], axis=0)
                             for a, c in zip(o1, o2))
            # no split available: one kernel over the whole [local ‖ recv]
            # table (waits for the exchange)
            table = jnp.concatenate([x, recv_rows], axis=0)
            xj = jnp.dot(table, wj, preferred_element_type=x.dtype)
            return ek.edge_phase(
                xi, xj, e, we, b, *lin1,
                batch.edge_dst, batch.edge_src, batch.edge_mask,
                batch.edge_dst_lo, batch.edge_src_lo,
                batch.edge_src_nblk, batch.src_band, interp)
        # overlap path: interior (src-local) gathers + xi/xj projections run
        # while the exchange flies; only the boundary select waits on recv
        xj_loc = jnp.dot(x, wj, preferred_element_type=x.dtype)
        gi = xi[batch.edge_dst]
        is_local = batch.edge_src < n_per
        gj_loc = xj_loc[jnp.where(is_local, batch.edge_src, 0)]
        xj_rec = jnp.dot(recv_rows, wj, preferred_element_type=x.dtype)
        gj_rec = xj_rec[jnp.clip(batch.edge_src - n_per, 0,
                                 max(recv_rows.shape[0] - 1, 0))]
        gj = jnp.where(is_local[:, None], gj_loc, gj_rec)
    else:
        xi = jnp.dot(x, wi, preferred_element_type=x.dtype)      # [N, 2d]
        xj = jnp.dot(x, wj, preferred_element_type=x.dtype)
        from cartnet_tpu.ops import dispatch
        if dispatch.edge_fuse_active(
                batch.num_edges, batch.num_nodes, d, x.dtype.itemsize,
                c_src=batch.src_band,
                plans=batch.edge_fuse_ok and batch.edge_dst_lo is not None):
            from cartnet_tpu.ops.pallas import edge_kernels as ek
            from cartnet_tpu.ops.pallas.segment_kernels import on_tpu
            # fused window kernel: gathers + e@We + silu + both lin1
            # GEMMs, no [E,2d] HBM round trips (PERF_NOTES.md)
            return ek.edge_phase(
                xi, xj, e, we, b,
                p["mlp_gate"]["lin1"]["w"], p["mlp_gate"]["lin1"]["b"],
                p["mlp_aggr"]["lin1"]["w"], p["mlp_aggr"]["lin1"]["b"],
                batch.edge_dst, batch.edge_src, batch.edge_mask,
                batch.edge_dst_lo, batch.edge_src_lo,
                batch.edge_src_nblk, batch.src_band, not on_tpu())
        if batch.edge_src_perm is None:
            # shard_map path: no batch-global permutation; plain gathers (the
            # custom-vjp collective-typing doesn't compose with vma tracking).
            gi = xi[batch.edge_dst]
            gj = xj[batch.edge_src]
        else:
            gi = segment.gather_edges(xi, batch.edge_dst,
                                      pallas_ok=batch.pallas_seg_ok,
                                      sorted_idx=True)  # dst pre-sorted
            gj = segment.gather_edges(xj, batch.edge_src,
                                      batch.edge_src_perm,
                                      batch.pallas_seg_ok,
                                      idx_sorted=batch.edge_src_sorted)
    pre = gi + gj + jnp.dot(e, we, preferred_element_type=x.dtype) + b
    h = jax.nn.silu(pre)
    gate = nn.linear(p["mlp_gate"]["lin1"], h[:, :d])
    sender = nn.linear(p["mlp_aggr"]["lin1"], h[:, d:])
    return gate, sender, e, None, None


def layer_apply(p, state, x, e, batch: CrystalBatch, cfg: ModelConfig,
                training: bool, ep_axis: Optional[str] = None,
                edge_stat_axes=(), node_stat_axes=(), envelope=None):
    """One message-passing layer.

    Inside shard_map with edges partitioned over ``ep_axis`` (nodes
    replicated), the local segment-sum produces partial node aggregates which
    are psum'd over the edge axis — the GNN analogue of tensor-parallel
    all-reduce. BN batch moments reduce over the given stat axes (sync BN) so
    sharded training matches the single-device statistics exactly.

    ``envelope``: precomputed CosineCutoff(dist) [E] (identical across layers,
    so the caller hoists it out of the layer loop).
    """
    x_in = x

    halo = batch.halo_send_idx is not None
    # e_res == e, passed through the (possibly fused) edge op so the residual
    # backward add folds into its de output (ops/pallas/edge_kernels.py);
    env = None
    if cfg.use_envelope:
        env = (envelope if envelope is not None else
               rbf_ops.cosine_cutoff(batch.cart_dist.astype(x.dtype),
                                     cfg.radius))

    # flagship train path: ONE op spanning edge MLPs -> in-kernel BN moments
    # -> sigma/scatter, with a MERGED backward (the sigma backward runs as a
    # prologue of the edge backward kernel — no [E,d] dgate/dsender HBM
    # round trips, two fewer serial kernel links per layer)
    import os as _os
    from cartnet_tpu.ops import dispatch
    d = x.shape[-1]
    if (training and not halo
            and _os.environ.get("CARTNET_KBN", "1") == "1"
            and dispatch.edge_fuse_active(
                batch.num_edges, batch.num_nodes, d, x.dtype.itemsize,
                c_src=batch.src_band,
                plans=batch.edge_fuse_ok and batch.edge_dst_lo is not None)
            and dispatch.sigma_active(
                batch.num_edges, d, batch.num_nodes,
                seg_ok=batch.pallas_seg_ok,
                interpret_ok=_FORCE_SIGMA_INTERPRET)):
        from cartnet_tpu.nn.norm import bn_state_update
        from cartnet_tpu.ops.pallas import edge_kernels as ek
        from cartnet_tpu.ops.pallas.segment_kernels import on_tpu
        xi, xj, we, b = _merged_proj(p, x, d)
        env_col = (env[:, None] if env is not None
                   else jnp.ones((batch.num_edges, 1), x.dtype))
        e_out, aggr, mean, var, n = ek.fused_edge_sigma(
            xi, xj, e, we, b,
            p["mlp_gate"]["lin1"]["w"], p["mlp_gate"]["lin1"]["b"],
            p["mlp_aggr"]["lin1"]["w"], p["mlp_aggr"]["lin1"]["b"],
            p["bn"]["gamma"], p["bn"]["beta"], env_col,
            batch.edge_dst, batch.edge_src, batch.edge_mask,
            batch.edge_dst_lo, batch.edge_src_lo, batch.edge_src_nblk,
            batch.src_band, ek.C_DST, cfg.bn_eps, edge_stat_axes,
            not on_tpu())
        bn_s = bn_state_update(state["bn"], mean, var, n, cfg.bn_momentum)
        if ep_axis is not None:
            aggr = jax.lax.psum(aggr, ep_axis)
        aggr, bn2_s = masked_batch_norm(p["bn2"], state["bn2"], aggr,
                                        batch.node_mask, training=training,
                                        momentum=cfg.bn_momentum,
                                        eps=cfg.bn_eps,
                                        axis_names=node_stat_axes)
        return jax.nn.silu(aggr) + x_in, e_out, {"bn": bn_s, "bn2": bn2_s}

    # s1w/m2w are the kernel's per-window BN moment partials (None when the
    # kernel didn't run)
    gate, sender, e_res, s1w, m2w = _dual_edge_mlp(p, x, e, batch, ep_axis)

    sigma_fused = False
    if batch.pallas_seg_ok:
        from cartnet_tpu.ops import dispatch
        from cartnet_tpu.ops.pallas.segment_kernels import (
            C_WINDOW, on_tpu, sigma_segsum)
        from cartnet_tpu.ops.pallas.edge_kernels import C_DST, T_EDGES
        E, N, d = batch.num_edges, batch.num_nodes, gate.shape[-1]
        if dispatch.sigma_active(E, d, N,
                                 interpret_ok=_FORCE_SIGMA_INTERPRET):
            # fused BN-normalize + sigmoid + envelope + x sender + edge
            # residual + windowed scatter: one Pallas pass instead of ~4
            # [E,d] HBM round trips (PERF_NOTES.md). BN batch moments stay
            # outside so the full train-mode BN backward composes through
            # scale/shift. Graph-aligned batches (edge_fuse_ok) guarantee a
            # dst span < C_DST per window, halving the scatter band.
            # Sharded modes compose member-locally: inside shard_map E/N are
            # the member's window-aligned shard (collate plans per member —
            # parallel/step.py, parallel/halo.py); halo dst is member-owned
            # so the kernel output IS the full aggregate, while the
            # replicated-node ep layout psums partials exactly like the
            # unfused path below.
            from cartnet_tpu.nn.norm import (
                bn_scale_shift_from_window_moments, masked_bn_scale_shift)
            import os as _os
            if (training and s1w is not None
                    and _os.environ.get("CARTNET_KBN", "1") == "1"):
                # moments from the edge kernel's per-window partials —
                # skips both [E,d] XLA moment read passes per layer
                scale, shift, bn_s = bn_scale_shift_from_window_moments(
                    p["bn"], state["bn"], s1w, m2w, batch.edge_mask,
                    momentum=cfg.bn_momentum, eps=cfg.bn_eps,
                    axis_names=edge_stat_axes)
            else:
                scale, shift, bn_s = masked_bn_scale_shift(
                    p["bn"], state["bn"], gate, batch.edge_mask,
                    training=training, momentum=cfg.bn_momentum,
                    eps=cfg.bn_eps, axis_names=edge_stat_axes)
            env_col = (env[:, None] if env is not None
                       else jnp.ones((E, 1), gate.dtype))
            ids_eff = jnp.where(batch.edge_mask, batch.edge_dst,
                                N).astype(jnp.int32)
            lo = ((ids_eff[::T_EDGES] // 16) * 16).astype(jnp.int32)
            c_win = C_DST if batch.edge_fuse_ok else C_WINDOW
            e_out, aggr = sigma_segsum(gate, scale, shift,
                                       env_col.astype(gate.dtype), sender,
                                       e_res, ids_eff, lo, N, c_win,
                                       not on_tpu())
            if ep_axis is not None and not halo:
                aggr = jax.lax.psum(aggr, ep_axis)
            sigma_fused = True

    if not sigma_fused:
        gate, bn_s = masked_batch_norm(p["bn"], state["bn"], gate,
                                       batch.edge_mask, training=training,
                                       momentum=cfg.bn_momentum,
                                       eps=cfg.bn_eps,
                                       axis_names=edge_stat_axes)
        sigma = jax.nn.sigmoid(gate)
        if env is not None:
            sigma = env[:, None] * sigma

        # to_halo's interior-first window permutation (halo_interior_nt > 0)
        # breaks ACROSS-window dst sortedness — fall back to unsorted scatter
        aggr = segment.masked_segment_sum(sigma * sender, batch.edge_dst,
                                          batch.edge_mask, batch.num_nodes,
                                          sorted_ids=batch.halo_interior_nt
                                          == 0,
                                          pallas_ok=batch.pallas_seg_ok)
        if ep_axis is not None and not halo:
            # replicated-node layout: partial aggregates all-reduce over ep.
            # halo layout owns dst locally — the segment-sum above IS the
            # full aggregate, no collective needed.
            aggr = jax.lax.psum(aggr, ep_axis)
        e_out = e_res + sigma
    aggr, bn2_s = masked_batch_norm(p["bn2"], state["bn2"], aggr,
                                    batch.node_mask, training=training,
                                    momentum=cfg.bn_momentum, eps=cfg.bn_eps,
                                    axis_names=node_stat_axes)
    x_out = jax.nn.silu(aggr) + x_in
    return x_out, e_out, {"bn": bn_s, "bn2": bn2_s}


# ---------------------------------------------------------------- heads

def cholesky_head_init(key, cfg: ModelConfig):
    d = cfg.dim_in
    return {"mlp": nn.mlp_init(key, [d, d // 2, 6], True, cfg.param_dtype)}


def cholesky_head_apply(p, x):
    """[N, d] -> SPD U [N, 3, 3] (reference models/cartnet.py:293-303)."""
    out = nn.mlp_silu(p["mlp"], x, 2)
    diag = jax.nn.softplus(out[:, :3])
    return assemble_cholesky_upper(diag, out[:, 3:])


def scalar_head_init(key, cfg: ModelConfig):
    d = cfg.dim_in
    return {"mlp": nn.mlp_init(key, [d, d // 2, 1], True, cfg.param_dtype)}


def scalar_head_apply(p, x, batch: CrystalBatch,
                      psum_axis: Optional[str] = None):
    """[N, d] -> per-graph scalar [G] via masked scatter-mean.

    ``psum_axis``: in halo mode nodes are sharded over ep, so a graph split
    across members needs its partial sums and counts all-reduced before the
    mean (graph slots are global within the dp slice)."""
    out = nn.mlp_silu(p["mlp"], x, 2)
    s = segment.masked_segment_sum(out, batch.graph_id, batch.node_mask,
                                   batch.num_graphs)
    cnt = segment.segment_sum(batch.node_mask.astype(out.dtype),
                              batch.graph_id, batch.num_graphs)
    if psum_axis is not None:
        s = jax.lax.psum(s, psum_axis)
        cnt = jax.lax.psum(cnt, psum_axis)
    per_graph = s / jnp.maximum(cnt, 1.0)[:, None]
    return per_graph[:, 0]


# ---------------------------------------------------------------- model

def cartnet_init(key, cfg: ModelConfig):
    keys = jax.random.split(key, cfg.num_layers + 2)
    params = {"encoder": encoder_init(keys[0], cfg)}
    state = {}
    for i in range(cfg.num_layers):
        lp, ls = layer_init(keys[1 + i], cfg)
        params[f"layer{i}"] = lp
        state[f"layer{i}"] = ls
    head_key = keys[-1]
    if cfg.cholesky:
        params["head"] = cholesky_head_init(head_key, cfg)
    else:
        params["head"] = scalar_head_init(head_key, cfg)
    return params, state


def cartnet_apply(params, state, batch: CrystalBatch, cfg: ModelConfig,
                  training: bool = False, ep_axis: Optional[str] = None,
                  edge_stat_axes=(), node_stat_axes=()):
    """Forward pass.

    Args (parallel, only inside shard_map):
        ep_axis: mesh axis over which this shard's edge list is a partition;
            node aggregates are psum'd over it.
        edge_stat_axes / node_stat_axes: sync-BN reduction axes for edge-level
            and node-level batch statistics.

    Returns:
        pred: [N,3,3] (cholesky) or [G] (scalar) — padded rows are garbage,
              consume together with ``pred_mask``.
        pred_mask: [N] non-H real-node mask, or [G] graph mask.
        new_state: updated BN running stats (== state when training=False).
    """
    if cfg.compute_dtype != cfg.param_dtype:
        # true low-precision compute: cast params once (XLA fuses the casts);
        # BN statistics and the loss stay f32 (see nn/norm.py, train/metrics.py)
        params = jax.tree.map(
            lambda a: a.astype(cfg.compute_dtype)
            if a.dtype == cfg.param_dtype else a, params)
    x, e = encoder_apply(params["encoder"], batch, cfg)
    envelope = (rbf_ops.cosine_cutoff(batch.cart_dist.astype(x.dtype),
                                      cfg.radius) if cfg.use_envelope else None)
    new_state = {}
    layer_fn = lambda p, s, x, e, env: layer_apply(
        p, s, x, e, batch, cfg, training, ep_axis,
        edge_stat_axes, node_stat_axes, env)
    if cfg.remat:
        # recompute the [E, *] edge intermediates in backward instead of
        # saving them — the step is HBM-bound, not FLOP-bound (bench note)
        layer_fn = jax.checkpoint(layer_fn)
    for i in range(cfg.num_layers):
        x, e, ls = layer_fn(params[f"layer{i}"], state[f"layer{i}"], x, e,
                            envelope)
        new_state[f"layer{i}"] = ls
    if cfg.cholesky:
        pred = cholesky_head_apply(params["head"], x)
        mask = batch.non_h_mask
    else:
        halo = batch.halo_send_idx is not None
        pred = scalar_head_apply(params["head"], x, batch,
                                 psum_axis=ep_axis if halo else None)
        mask = batch.graph_mask
    return pred, mask, new_state
