"""eComformer / iComformer: gated graph-attention crystal transformers.

TPU-native re-design of /root/reference/models/comformer.py and
comformer_conv.py (originally from the ComFormer paper, divelab/AIRS):

  * ComformerConv (:21-99): single-head gated attention. NB the reference's
    alpha is sigmoid(BN(q*k/sqrt(C))) — *gated*, NOT softmax-normalized — so
    no segment-softmax is needed; aggregation stays a masked segment-sum.
  * ComformerConv_edge (:102-193): edge-feature update attending over the 3
    lattice-vector channels. (The reference's ``lemb``/``lin_edge_len``
    params are dead code — never touched in forward — and are omitted here.)
  * eComformer (:28-70): 3 conv layers + equivariant TP block after layer 0.
  * iComformer (:75-132): lattice-aware invariant edge features
    (per-edge RBF of -0.75/||cell rows|| and cell-row/direction cosines),
    4 conv layers + 1 edge-update layer.

Same TPU layout as CartNet: static padded shapes, masked BN, first-layer
concat-MLPs split into node-level block matmuls, dst-sorted segment-sum.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from cartnet_tpu.config import ModelConfig
from cartnet_tpu.data.schema import CrystalBatch
from cartnet_tpu.models.cartnet import cholesky_head_apply, cholesky_head_init, \
    scalar_head_apply, scalar_head_init
from cartnet_tpu.models.equivariant import equi_block_apply, equi_block_init
from cartnet_tpu.nn import core as nn
from cartnet_tpu.nn.norm import batch_norm_init, masked_batch_norm
from cartnet_tpu.ops import rbf as rbf_ops
from cartnet_tpu.ops import segment


# ------------------------------------------------------------ ComformerConv

def conv_init(key, d: int, dtype):
    keys = jax.random.split(key, 8)
    p = {"lin_key": nn.torch_linear_init(keys[0], d, d, True, dtype),
         "lin_query": nn.torch_linear_init(keys[1], d, d, True, dtype),
         "lin_value": nn.torch_linear_init(keys[2], d, d, True, dtype),
         "lin_edge": nn.torch_linear_init(keys[3], d, d, True, dtype),
         "lin_concate": nn.torch_linear_init(keys[4], d, d, True, dtype),
         "key_update": nn.mlp_init(keys[5], [3 * d, d, d], True, dtype),
         "msg_update": nn.mlp_init(keys[6], [3 * d, d, d], True, dtype)}
    bn_p, bn_s = batch_norm_init(d, dtype)
    bn_att_p, bn_att_s = batch_norm_init(d, dtype)
    p["bn"], p["bn_att"] = bn_p, bn_att_p
    return p, {"bn": bn_s, "bn_att": bn_att_s}


def _split3(mlp, a_node_i, a_node_j, edge_term, batch: CrystalBatch):
    """First layer of MLP([a_i ‖ a_j ‖ e]) via node-level block matmuls,
    with sorted-VJP gathers (see models/cartnet._dual_edge_mlp)."""
    d = a_node_i.shape[-1]
    w, b = mlp["lin0"]["w"], mlp["lin0"]["b"]
    ai = jnp.dot(a_node_i, w[:d], preferred_element_type=a_node_i.dtype)
    aj = jnp.dot(a_node_j, w[d:2 * d], preferred_element_type=a_node_i.dtype)
    if batch.edge_src_perm is None:
        gi, gj = ai[batch.edge_dst], aj[batch.edge_src]
    else:
        gi = segment.gather_edges(ai, batch.edge_dst,
                                  pallas_ok=batch.pallas_seg_ok,
                                  sorted_idx=True)
        gj = segment.gather_edges(aj, batch.edge_src, batch.edge_src_perm,
                                  batch.pallas_seg_ok,
                                  idx_sorted=batch.edge_src_sorted)
    pre = gi + gj + edge_term @ w[2 * d:] + b
    return nn.linear(mlp["lin1"], jax.nn.silu(pre))


def conv_apply(p, state, x, edge_attr, batch: CrystalBatch, cfg: ModelConfig,
               training: bool, ep_axis: Optional[str] = None,
               edge_stat_axes=(), node_stat_axes=()):
    """Gated single-head attention conv (comformer_conv.py:71-99).

    Fused path: the key/msg MLPs have exactly CartNet's edge-phase shape
    (two MLPs over [a_dst ‖ a_src ‖ e] sharing the endpoint gathers), so the
    same Pallas window kernel computes both without [E, 3d] HBM tensors —
    xi = [k@Wk_i ‖ v@Wm_i], xj = [k@Wk_j ‖ v@Wm_j] makes the kernel's
    (gate, sender) == (key_j, msg). The gated aggregation then runs through
    sigma_segsum (env = q-gather handled outside; BN stays two-pass since
    it normalizes alpha = q_dst * key_j, not a kernel output).
    """
    dst = batch.edge_dst
    d = x.shape[-1]
    halo = batch.halo_send_idx is not None
    if halo:
        # halo layout (parallel/halo.py): nodes sharded over ep. Boundary x
        # rows are exchanged ONCE at d width; key/value projections then run
        # over the [local ‖ recv] table so edge_src gathers stay
        # member-local. dst — and with it q, the gated aggregation, and the
        # node-level BN — only ever touches the owned block.
        from cartnet_tpu.parallel.halo import halo_recv_rows
        send_idx = batch.halo_send_idx.reshape(
            batch.halo_send_idx.shape[-2:])
        n_per = x.shape[0]
        recv = halo_recv_rows(x, send_idx, batch.halo_empty, ep_axis)
        table = jnp.concatenate([x, recv], axis=0)
        k_t = nn.linear(p["lin_key"], table)
        v_t = nn.linear(p["lin_value"], table)
        k, v = k_t[:n_per], v_t[:n_per]
        n_src = table.shape[0]
    else:
        k = nn.linear(p["lin_key"], x)
        v = nn.linear(p["lin_value"], x)
        k_t, v_t = k, v
        n_src = None
    q = nn.linear(p["lin_query"], x)
    e = nn.linear(p["lin_edge"], edge_attr)

    from cartnet_tpu.ops import dispatch
    fused = dispatch.edge_fuse_active(
        batch.num_edges, batch.num_nodes, d, x.dtype.itemsize,
        num_src_nodes=n_src, c_src=batch.src_band,
        plans=batch.edge_fuse_ok and batch.edge_dst_lo is not None)
    if fused:
        from cartnet_tpu.ops.pallas import edge_kernels as ek
        from cartnet_tpu.ops.pallas.segment_kernels import on_tpu
        wk, bk = p["key_update"]["lin0"]["w"], p["key_update"]["lin0"]["b"]
        wm, bm = p["msg_update"]["lin0"]["w"], p["msg_update"]["lin0"]["b"]
        xi = jnp.concatenate([jnp.dot(k, wk[:d], preferred_element_type=k.dtype),
                              jnp.dot(v, wm[:d], preferred_element_type=k.dtype)],
                             axis=1)
        xj = jnp.concatenate([jnp.dot(k_t, wk[d:2 * d],
                                      preferred_element_type=k.dtype),
                              jnp.dot(v_t, wm[d:2 * d],
                                      preferred_element_type=k.dtype)],
                             axis=1)
        we = jnp.concatenate([wk[2 * d:], wm[2 * d:]], axis=1)
        b = jnp.concatenate([bk, bm])
        key_j, msg, _, _, _ = ek.edge_phase(
            xi, xj, e, we, b,
            p["key_update"]["lin1"]["w"], p["key_update"]["lin1"]["b"],
            p["msg_update"]["lin1"]["w"], p["msg_update"]["lin1"]["b"],
            batch.edge_dst, batch.edge_src, batch.edge_mask,
            batch.edge_dst_lo, batch.edge_src_lo, batch.edge_src_nblk,
            batch.src_band, not on_tpu())
    else:
        key_j = _split3(p["key_update"], k, k_t, e, batch)
        msg = _split3(p["msg_update"], v, v_t, e, batch)

    if batch.edge_src_perm is None:
        q_dst = q[dst]
    else:
        q_dst = segment.gather_edges(q, dst, pallas_ok=batch.pallas_seg_ok,
                                     sorted_idx=True)
    alpha = q_dst * key_j / math.sqrt(d)

    sigma_fused = False
    if batch.pallas_seg_ok:
        from cartnet_tpu.models.cartnet import _FORCE_SIGMA_INTERPRET
        from cartnet_tpu.ops.pallas.segment_kernels import (C_WINDOW, on_tpu,
                                                            sigma_segsum)
        from cartnet_tpu.ops.pallas.edge_kernels import C_DST, T_EDGES
        E, N = batch.num_edges, batch.num_nodes
        if dispatch.sigma_active(E, d, N,
                                 interpret_ok=_FORCE_SIGMA_INTERPRET):
            from cartnet_tpu.nn.norm import masked_bn_scale_shift
            scale, shift, bn_att_s = masked_bn_scale_shift(
                p["bn_att"], state["bn_att"], alpha, batch.edge_mask,
                training=training, momentum=cfg.bn_momentum, eps=cfg.bn_eps,
                axis_names=edge_stat_axes)
            ids_eff = jnp.where(batch.edge_mask, dst, N).astype(jnp.int32)
            lo = ((ids_eff[::T_EDGES] // 16) * 16).astype(jnp.int32)
            c_win = C_DST if batch.edge_fuse_ok else C_WINDOW
            ones_env = jnp.ones((E, 1), alpha.dtype)
            # e_in = 0: the conv has no edge residual; the kernel's e_out
            # (= sigma) is unused and DCE'd at the consumer level
            _, out = sigma_segsum(alpha, scale, shift, ones_env, msg,
                                  jnp.zeros_like(msg), ids_eff, lo, N,
                                  c_win, not on_tpu())
            sigma_fused = True

    if not sigma_fused:
        alpha, bn_att_s = masked_batch_norm(p["bn_att"], state["bn_att"],
                                            alpha, batch.edge_mask,
                                            training=training,
                                            momentum=cfg.bn_momentum,
                                            eps=cfg.bn_eps,
                                            axis_names=edge_stat_axes)
        msg = msg * jax.nn.sigmoid(alpha)
        # to_halo's interior-first window permutation breaks ACROSS-window
        # dst sortedness — fall back to unsorted scatter then
        out = segment.masked_segment_sum(msg, dst, batch.edge_mask,
                                         batch.num_nodes,
                                         sorted_ids=batch.halo_interior_nt
                                         == 0,
                                         pallas_ok=batch.pallas_seg_ok)
    if ep_axis is not None and not halo:
        # replicated-node layout: partial aggregates all-reduce over ep.
        # halo layout owns dst locally — the segment-sum IS the full
        # aggregate, no collective needed.
        out = jax.lax.psum(out, ep_axis)
    out = nn.linear_mxu_bias(p["lin_concate"], out)
    out, bn_s = masked_batch_norm(p["bn"], state["bn"], out, batch.node_mask,
                                  training=training, momentum=cfg.bn_momentum,
                                  eps=cfg.bn_eps, axis_names=node_stat_axes)
    return jax.nn.softplus(x + out), {"bn": bn_s, "bn_att": bn_att_s}


# ------------------------------------------------------- ComformerConv_edge

def conv_edge_init(key, d: int, dtype):
    keys = jax.random.split(key, 12)
    p = {"lin_key": nn.torch_linear_init(keys[0], d, d, True, dtype),
         "lin_query": nn.torch_linear_init(keys[1], d, d, True, dtype),
         "lin_value": nn.torch_linear_init(keys[2], d, d, True, dtype),
         "lin_edge": nn.torch_linear_init(keys[3], d, d, False, dtype),
         "lin_concate": nn.torch_linear_init(keys[4], d, d, True, dtype),
         "key_update": nn.mlp_init(keys[5], [3 * d, d, d], True, dtype),
         "msg_update": nn.mlp_init(keys[6], [3 * d, d, d], True, dtype)}
    for i, name in enumerate(["key_e1", "key_e2", "key_e3",
                              "value_e1", "value_e2", "value_e3"]):
        p[name] = nn.torch_linear_init(keys[7 + i // 2], d, d, True, dtype)
    bn_p, bn_s = batch_norm_init(d, dtype)
    bn_att_p, bn_att_s = batch_norm_init(d, dtype)
    p["bn"], p["bn_att"] = bn_p, bn_att_p
    return p, {"bn": bn_s, "bn_att": bn_att_s}


def conv_edge_apply(p, state, edge_attr, edge_nei_len, edge_nei_angle,
                    edge_mask, cfg: ModelConfig, training: bool,
                    edge_stat_axes=()):
    """Edge update over the 3 lattice channels (comformer_conv.py:156-193).

    edge_attr [E, d]; edge_nei_len / edge_nei_angle are CHANNEL-MAJOR flat
    [3E, d] (rows i*E + e) — every tensor in the chain stays rank-2 with the
    natural {1,0} layout. The earlier rank-3 [E,3,d] formulation cost
    ~0.6 ms/step of {2,0,1}-layout copies and HBM-inefficient fusions
    (xprof round 5). [E, 3, d] inputs (tests, oracles) are converted.
    """
    d = edge_attr.shape[-1]
    E = edge_attr.shape[0]
    if edge_nei_len.ndim == 3:
        edge_nei_len = edge_nei_len.transpose(1, 0, 2).reshape(3 * E, d)
    if edge_nei_angle.ndim == 3:
        edge_nei_angle = edge_nei_angle.transpose(1, 0, 2).reshape(3 * E, d)
    q = nn.linear(p["lin_query"], edge_attr)                     # [E,d]
    kx = nn.linear(p["lin_key"], edge_attr)
    vx = nn.linear(p["lin_value"], edge_attr)
    ky = jnp.concatenate(
        [nn.linear(p[f"key_e{i + 1}"], edge_nei_len[i * E:(i + 1) * E])
         for i in range(3)], axis=0)                             # [3E,d]
    vy = jnp.concatenate(
        [nn.linear(p[f"value_e{i + 1}"], edge_nei_len[i * E:(i + 1) * E])
         for i in range(3)], axis=0)
    exy = nn.linear(p["lin_edge"], edge_nei_angle)               # [3E,d]

    # first MLP layers over [x ‖ y ‖ exy] as block matmuls: the x block is
    # identical across the 3 lattice channels, so project it ONCE per edge
    # and tile — no [E,3,3d] concat ever hits HBM (xprof: those f32
    # concat fusions were ~1.5 ms/step at bench shapes)
    def _pre3(mlp, x2d, y2d):
        w, b = mlp["lin0"]["w"], mlp["lin0"]["b"]
        px = jnp.dot(x2d, w[:d], preferred_element_type=x2d.dtype)
        return (jnp.tile(px, (3, 1))
                + jnp.dot(y2d, w[d:2 * d], preferred_element_type=x2d.dtype)
                + jnp.dot(exy, w[2 * d:], preferred_element_type=x2d.dtype)
                + b)

    key = nn.linear(p["key_update"]["lin1"],
                    jax.nn.silu(_pre3(p["key_update"], kx, ky)))
    alpha = (jnp.tile(q, (3, 1)) * key) / math.sqrt(d)           # [3E,d]
    mask3 = jnp.tile(edge_mask, 3)
    alpha, bn_att_s = masked_batch_norm(
        p["bn_att"], state["bn_att"], alpha, mask3,
        training=training, momentum=cfg.bn_momentum, eps=cfg.bn_eps,
        axis_names=edge_stat_axes)
    msg = nn.linear(p["msg_update"]["lin1"],
                    jax.nn.silu(_pre3(p["msg_update"], vx, vy)))
    out3 = nn.linear_mxu_bias(p["lin_concate"], msg * jax.nn.sigmoid(alpha))
    out = out3[:E] + out3[E:2 * E] + out3[2 * E:]                # [E,d]
    out, bn_s = masked_batch_norm(p["bn"], state["bn"], out, edge_mask,
                                  training=training, momentum=cfg.bn_momentum,
                                  eps=cfg.bn_eps, axis_names=edge_stat_axes)
    return jax.nn.softplus(edge_attr + out), {"bn": bn_s, "bn_att": bn_att_s}


# ----------------------------------------------------------------- models

def _rbf_head_init(key, d: int, dtype):
    """RBFExpansion(bins=d) -> Linear -> softplus stack (comformer.py:37-45)."""
    return {"lin": nn.torch_linear_init(key, d, d, True, dtype)}


def _rbf_head_apply(p, x, centers, gamma):
    return jax.nn.softplus(nn.linear(p["lin"], rbf_ops.rbf_expansion(x, centers, gamma)))


def ecomformer_init(key, cfg: ModelConfig):
    d, dtype = cfg.dim_in, cfg.param_dtype
    keys = jax.random.split(key, 8)
    p = {"embedding": nn.embedding_init(keys[0], 119, d, dtype, "normal"),
         "temp_proj": nn.torch_linear_init(keys[1], 1, d, True, dtype),
         "rbf": _rbf_head_init(keys[2], d, dtype)}
    state = {}
    for i in range(3):
        cp, cs = conv_init(keys[3 + i], d, dtype)
        p[f"conv{i}"], state[f"conv{i}"] = cp, cs
    ep, es = equi_block_init(keys[6], cfg, edge_dim=d)
    p["equi"], state["equi"] = ep, es
    p["head"] = (cholesky_head_init(keys[7], cfg) if cfg.cholesky
                 else scalar_head_init(keys[7], cfg))
    centers, gamma = rbf_ops.rbf_expansion_params(-4.0, 0.0, d, dtype)
    p["rbf_centers"], p["rbf_gamma"] = centers, jnp.asarray(gamma, dtype)
    return p, state


def ecomformer_apply(params, state, batch: CrystalBatch, cfg: ModelConfig,
                     training: bool = False, ep_axis: Optional[str] = None,
                     edge_stat_axes=(), node_stat_axes=()):
    dt = cfg.compute_dtype
    params = nn.cast_params(params, dt, cfg.param_dtype)
    t = nn.linear(params["temp_proj"], batch.temperature[:, None].astype(dt))
    # one-hot MXU lookup/gather: take's VJP is a serial scatter (see
    # nn.embedding_onehot / PERF_NOTES round-3 xprof)
    x = (nn.embedding_onehot(params["embedding"], batch.z, dt)
         + nn.gather_rows_onehot(t, batch.graph_id, batch.num_graphs, dt))
    efeat = -0.75 / jnp.maximum(batch.cart_dist.astype(dt), 1e-6)
    e = _rbf_head_apply(params["rbf"], efeat, params["rbf_centers"],
                        params["rbf_gamma"])
    new_state = {}
    kw = dict(training=training, ep_axis=ep_axis,
              edge_stat_axes=edge_stat_axes, node_stat_axes=node_stat_axes)
    x, new_state["conv0"] = conv_apply(params["conv0"], state["conv0"], x, e,
                                       batch, cfg, **kw)
    x, new_state["equi"] = equi_block_apply(params["equi"], state["equi"], x, e,
                                            batch, cfg, training, ep_axis,
                                            node_stat_axes)
    x, new_state["conv1"] = conv_apply(params["conv1"], state["conv1"], x, e,
                                       batch, cfg, **kw)
    x, new_state["conv2"] = conv_apply(params["conv2"], state["conv2"], x, e,
                                       batch, cfg, **kw)
    if cfg.cholesky:
        pred, mask = cholesky_head_apply(params["head"], x), batch.non_h_mask
    else:
        halo = batch.halo_send_idx is not None
        pred = scalar_head_apply(params["head"], x, batch,
                                 psum_axis=ep_axis if halo else None)
        mask = batch.graph_mask
    return pred, mask, new_state


def icomformer_init(key, cfg: ModelConfig):
    d, dtype = cfg.dim_in, cfg.param_dtype
    keys = jax.random.split(key, 10)
    p = {"embedding": nn.embedding_init(keys[0], 119, d, dtype, "normal"),
         "temp_proj": nn.torch_linear_init(keys[1], 1, d, True, dtype),
         "rbf": _rbf_head_init(keys[2], d, dtype),
         "rbf_angle": _rbf_head_init(keys[3], d, dtype)}
    state = {}
    for i in range(4):
        cp, cs = conv_init(keys[4 + i], d, dtype)
        p[f"conv{i}"], state[f"conv{i}"] = cp, cs
    ep_, es = conv_edge_init(keys[8], d, dtype)
    p["edge_update"], state["edge_update"] = ep_, es
    p["head"] = (cholesky_head_init(keys[9], cfg) if cfg.cholesky
                 else scalar_head_init(keys[9], cfg))
    centers, gamma = rbf_ops.rbf_expansion_params(-4.0, 0.0, d, dtype)
    p["rbf_centers"], p["rbf_gamma"] = centers, jnp.asarray(gamma, dtype)
    centers_a, gamma_a = rbf_ops.rbf_expansion_params(-1.0, 1.0, d, dtype)
    p["rbfa_centers"], p["rbfa_gamma"] = centers_a, jnp.asarray(gamma_a, dtype)
    return p, state


def icomformer_apply(params, state, batch: CrystalBatch, cfg: ModelConfig,
                     training: bool = False, ep_axis: Optional[str] = None,
                     edge_stat_axes=(), node_stat_axes=()):
    dt = cfg.compute_dtype
    params = nn.cast_params(params, dt, cfg.param_dtype)
    t = nn.linear(params["temp_proj"], batch.temperature[:, None].astype(dt))
    # one-hot MXU lookup/gather: take's VJP is a serial scatter (see
    # nn.embedding_onehot / PERF_NOTES round-3 xprof)
    x = (nn.embedding_onehot(params["embedding"], batch.z, dt)
         + nn.gather_rows_onehot(t, batch.graph_id, batch.num_graphs, dt))

    dist = jnp.maximum(batch.cart_dist.astype(dt), 1e-6)
    efeat = -0.75 / dist
    # lattice-row features without the [E,3,3] per-edge cell gather (xprof:
    # VMEM-bound multiply_reduce fusions ~300 us/step): compute per-graph
    # row norms and all-graph direction dots, then select per edge with a
    # [E, G] one-hot (G is tiny) — identical values
    G = batch.num_graphs
    cell = batch.cell.astype(dt)                                 # [G,3,3]
    row_norm_g = jnp.linalg.norm(cell, axis=-1)                  # [G,3]
    # per-edge graph id WITHOUT a gather (xprof: the s32 graph_id[src]
    # gather ran ~100 us/step serial): PBC edges never cross crystals, so
    # the edge's graph is the one whose node range contains dst — a
    # vectorized searchsorted over the G per-graph start rows
    N = batch.num_nodes
    narange = jnp.arange(N, dtype=jnp.int32)
    garange = jnp.arange(G, dtype=jnp.int32)
    starts = jnp.min(
        jnp.where((batch.graph_id[:, None] == garange[None, :])
                  & batch.node_mask[:, None], narange[:, None], N),
        axis=0)                                                  # [G]
    # Assumes collate's contiguous node ranges (graph g owns rows
    # starts[g]..starts[g+1]) with only TRAILING graphs empty, so `starts`
    # is sorted. Clamp: pad edges whose dst lands below starts[0] (or any
    # stray id) must map to a real graph, not gid -1 — an all-zero one-hot
    # would make row_norm 0 and blow nei_len_feat up to -7.5e5 on masked
    # pad edges.
    if batch.halo_send_idx is not None:
        # halo layout: the member's node rows are an arbitrary contiguous
        # window of the dp slice, so `starts` is not sorted (absent graphs
        # sentinel to N regardless of id) — searchsorted is invalid. dst is
        # member-local; one small s32 gather gives the edge's graph exactly.
        gid_e = jnp.clip(batch.graph_id[batch.edge_dst], 0,
                         G - 1).astype(jnp.int32)
    else:
        gid_e = jnp.clip(
            jnp.searchsorted(starts, batch.edge_dst, side="right") - 1, 0,
            G - 1).astype(jnp.int32)
    oh_g = (gid_e[:, None] == garange[None, :]).astype(dt)
    row_norm = jnp.dot(oh_g, row_norm_g,
                       preferred_element_type=dt)                # [E,3]
    nei_len_feat = -0.75 / jnp.maximum(row_norm, 1e-6)
    # cosine between each lattice row and the edge direction (comformer.py:18-23)
    dirs = batch.cart_dir.astype(dt)
    cos_all = jnp.dot(dirs, cell.reshape(G * 3, 3).T,
                      preferred_element_type=dt)                 # [E, G*3]
    cos_raw = jnp.einsum("eg,egr->er", oh_g,
                         cos_all.reshape(-1, G, 3))              # [E,3]
    cosang = cos_raw / (
        jnp.maximum(row_norm, 1e-6) *
        jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-6))
    cosang = jnp.clip(cosang, -1.0, 1.0)

    e = _rbf_head_apply(params["rbf"], efeat, params["rbf_centers"],
                        params["rbf_gamma"])
    # channel-major flat [3E] features -> [3E, d] rbf heads: keeps the
    # conv_edge chain rank-2 (see conv_edge_apply)
    nei_len = _rbf_head_apply(params["rbf"], nei_len_feat.T.reshape(-1),
                              params["rbf_centers"], params["rbf_gamma"])
    nei_ang = _rbf_head_apply(params["rbf_angle"], cosang.T.reshape(-1),
                              params["rbfa_centers"], params["rbfa_gamma"])

    new_state = {}
    kw = dict(training=training, ep_axis=ep_axis,
              edge_stat_axes=edge_stat_axes, node_stat_axes=node_stat_axes)
    x, new_state["conv0"] = conv_apply(params["conv0"], state["conv0"], x, e,
                                       batch, cfg, **kw)
    e, new_state["edge_update"] = conv_edge_apply(
        params["edge_update"], state["edge_update"], e, nei_len, nei_ang,
        batch.edge_mask, cfg, training, edge_stat_axes)
    for i in (1, 2, 3):
        x, new_state[f"conv{i}"] = conv_apply(params[f"conv{i}"],
                                              state[f"conv{i}"], x, e,
                                              batch, cfg, **kw)
    if cfg.cholesky:
        pred, mask = cholesky_head_apply(params["head"], x), batch.non_h_mask
    else:
        halo = batch.halo_send_idx is not None
        pred = scalar_head_apply(params["head"], x, batch,
                                 psum_axis=ep_axis if halo else None)
        mask = batch.graph_mask
    return pred, mask, new_state
