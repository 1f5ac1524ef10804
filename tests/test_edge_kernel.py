"""Fused Pallas edge-phase kernel (interpret mode): forward and custom-VJP
gradients must match the unfused gather+MLP composition on real edges."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.ops.pallas.edge_kernels import (C_DST, C_SRC, T_EDGES,
                                                 edge_fuse_shapes_ok,
                                                 edge_phase,
                                                 edge_windows_ok)

D = 128
N = 512


@pytest.fixture(scope="module")
def setup():
    recs = synthetic_dataset(3, mean_atoms=60, radius=5.0, adp=False, seed=5)
    e_real = sum(len(r["edge_src"]) for r in recs)
    E = -(-e_real // T_EDGES) * T_EDGES
    batch = collate(recs, N, E, 3)
    dst = np.asarray(batch.edge_dst)
    src = np.asarray(batch.edge_src)
    mask = np.asarray(batch.edge_mask)
    ok, dst_lo, src_lo, src_nblk = edge_windows_ok(dst, src, mask, N)
    assert ok, "synthetic batch must satisfy the band condition"
    key = jax.random.key(0)
    ks = jax.random.split(key, 10)
    mk = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.3
    args = dict(
        xi=mk(ks[0], N, 2 * D), xj=mk(ks[1], N, 2 * D), e=mk(ks[2], E, D),
        we=mk(ks[3], D, 2 * D), b=mk(ks[4], 2 * D),
        w1g=mk(ks[5], D, D), b1g=mk(ks[6], D),
        w1a=mk(ks[7], D, D), b1a=mk(ks[8], D))
    return (args, jnp.asarray(dst.astype(np.int32)),
            jnp.asarray(src.astype(np.int32)), jnp.asarray(dst_lo),
            jnp.asarray(src_lo), jnp.asarray(src_nblk), jnp.asarray(mask))


def _ref(a, dst, src):
    pre = (a["xi"][dst] + a["xj"][src]
           + jnp.dot(a["e"], a["we"]) + a["b"])
    h = jax.nn.silu(pre)
    gate = jnp.dot(h[:, :D], a["w1g"]) + a["b1g"]
    sender = jnp.dot(h[:, D:], a["w1a"]) + a["b1a"]
    return gate, sender


def test_forward_matches_reference(setup):
    a, dst, src, dst_lo, src_lo, src_nblk, mask = setup
    assert int(np.asarray(src_nblk).max()) >= 1  # block plan is real
    gate_k, sender_k, e_res, _, _ = edge_phase(
        a["xi"], a["xj"], a["e"], a["we"], a["b"],
        a["w1g"], a["b1g"], a["w1a"], a["b1a"],
        dst, src, mask, dst_lo, src_lo, src_nblk, interpret=True)
    gate_r, sender_r = _ref(a, dst, src)
    m = np.asarray(mask)
    np.testing.assert_array_equal(np.asarray(e_res), np.asarray(a["e"]))
    np.testing.assert_allclose(np.asarray(gate_k)[m], np.asarray(gate_r)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sender_k)[m],
                               np.asarray(sender_r)[m], rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_reference_grads(setup):
    a, dst, src, dst_lo, src_lo, src_nblk, mask = setup
    E = a["e"].shape[0]
    key = jax.random.key(7)
    cg = jax.random.normal(key, (E, D)) * mask[:, None]
    cs = jax.random.normal(jax.random.split(key)[0], (E, D)) * mask[:, None]
    ce = jax.random.normal(jax.random.split(key, 3)[2], (E, D))
    names = list(a.keys())

    def loss_kernel(*vals):
        aa = dict(zip(names, vals))
        g, s, er, _, _ = edge_phase(
            aa["xi"], aa["xj"], aa["e"], aa["we"], aa["b"],
            aa["w1g"], aa["b1g"], aa["w1a"], aa["b1a"],
            dst, src, mask, dst_lo, src_lo, src_nblk, interpret=True)
        # the e_res cotangent exercises the fused de accumulation in the bwd
        # kernel (residual add folded into de)
        return jnp.sum(g * cg) + jnp.sum(s * cs) + jnp.sum(er * ce)

    def loss_ref(*vals):
        aa = dict(zip(names, vals))
        g, s = _ref(aa, dst, src)
        return jnp.sum(g * cg) + jnp.sum(s * cs) + jnp.sum(aa["e"] * ce)

    vals = [a[k] for k in names]
    gk = jax.grad(loss_kernel, argnums=tuple(range(len(vals))))(*vals)
    gr = jax.grad(loss_ref, argnums=tuple(range(len(vals))))(*vals)
    for name, k_, r_ in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(k_), np.asarray(r_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_shapes_gate():
    assert edge_fuse_shapes_ok(2 * T_EDGES, 1024, 256)
    assert not edge_fuse_shapes_ok(2 * T_EDGES + 1, 1024, 256)
    assert not edge_fuse_shapes_ok(2 * T_EDGES, C_SRC - 8, 256)  # N < C_SRC
    assert not edge_fuse_shapes_ok(2 * T_EDGES, 1024, 192)  # lane align


def test_windows_ok_rejects_wide_spans():
    e = T_EDGES
    dst = np.arange(e, dtype=np.int64) % (C_DST * 3)  # unsorted wide span
    dst.sort()
    src = np.zeros(e, np.int64)
    mask = np.ones(e, bool)
    ok, _, _, _ = edge_windows_ok(dst, src, mask, C_DST * 3)
    assert not ok


def test_model_fused_path_matches_unfused():
    """Full CartNet loss + grads: fused edge-phase (interpret) == XLA path."""
    from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
    from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
    from cartnet_tpu.train.loop import loss_fn
    recs = synthetic_dataset(3, mean_atoms=60, radius=5.0, adp=True, seed=9)
    e_real = sum(len(r["edge_src"]) for r in recs)
    E = -(-e_real // T_EDGES) * T_EDGES
    batch = collate(recs, N, E, 3)
    assert batch.edge_fuse_ok  # fuse plan exists
    cfg = Config(model=ModelConfig(dim_in=D, dim_rbf=16, num_layers=2,
                                   cholesky=True),
                 data=DataConfig(max_nodes=N, max_edges=E, max_graphs=3),
                 optim=OptimConfig(lr=1e-3))
    assert edge_fuse_shapes_ok(E, N, D, 4)
    params, bn = cartnet_init(jax.random.key(2), cfg.model)

    def loss_of(p, b):
        return loss_fn(p, bn, b, cartnet_apply, cfg, True)[0]

    batch_unfused = batch.replace(edge_fuse_ok=False)
    lf, gf = jax.value_and_grad(loss_of)(params, batch)
    lu, gu = jax.value_and_grad(loss_of)(params, batch_unfused)
    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_u = jax.tree_util.tree_leaves_with_path(gu)
    for (kp, a), (_, b) in zip(flat_f, flat_u):  # same treedef -> same order
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-5, err_msg=str(kp))


def test_collate_edge_align_semantics():
    """Aligned collate: no window crosses a graph; masked semantics equal."""
    from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
    from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
    from cartnet_tpu.train.loop import loss_fn
    recs = synthetic_dataset(3, mean_atoms=60, radius=5.0, adp=True, seed=13)
    per = [-(-len(r["edge_src"]) // T_EDGES) * T_EDGES for r in recs]
    E = sum(per)
    b = collate(recs, N, E, 3, edge_align=T_EDGES)
    # each graph's segment occupies whole windows
    gid_of_edge = np.asarray(b.graph_id)[np.asarray(b.edge_dst)]
    emask = np.asarray(b.edge_mask)
    for t in range(E // T_EDGES):
        sl = slice(t * T_EDGES, (t + 1) * T_EDGES)
        gids = gid_of_edge[sl][emask[sl]]
        assert len(np.unique(gids)) <= 1, f"window {t} crosses graphs"
    # ids stay monotone (sorted fast path) incl. interior pads
    assert (np.diff(np.asarray(b.edge_dst)) >= 0).all()
    assert int(emask.sum()) == sum(len(r["edge_src"]) for r in recs)
    assert b.edge_fuse_ok  # fuse plan valid under alignment

    # model semantics identical to the unaligned batch (real edges only)
    E2 = -(-sum(len(r["edge_src"]) for r in recs) // T_EDGES) * T_EDGES
    b0 = collate(recs, N, E2, 3, edge_align=0)
    cfg = Config(model=ModelConfig(dim_in=D, dim_rbf=16, num_layers=2,
                                   cholesky=True),
                 data=DataConfig(max_nodes=N, max_edges=E, max_graphs=3),
                 optim=OptimConfig(lr=1e-3))
    params, bn = cartnet_init(jax.random.key(4), cfg.model)
    # compare on the XLA path (strip fuse plans) — alignment itself must be
    # semantics-neutral
    la = loss_fn(params, bn, b.replace(edge_fuse_ok=False),
                 cartnet_apply, cfg, True)[0]
    lu = loss_fn(params, bn, b0.replace(edge_fuse_ok=False),
                 cartnet_apply, cfg, True)[0]
    np.testing.assert_allclose(float(la), float(lu), rtol=1e-6)


def test_upgrade_src_band_reclamps_soundly():
    """Widening a batch's src band (stack/dp group max) must keep every
    real src id inside [slo', slo' + band) and produce identical kernel
    outputs — the re-clamp near the table end is the subtle case."""
    from cartnet_tpu.data.batching import upgrade_src_band
    from cartnet_tpu.ops.pallas.edge_kernels import (SRC_BLK, edge_phase_fwd,
                                                     plan_edge_windows)
    rng = np.random.RandomState(11)
    n, d, E = 512, 128, 2 * T_EDGES
    # src ids concentrated near the END of the table so the 128-band plan
    # clamps slo near n-128 and widening to 384 forces slo' = n-384
    dst = np.sort(rng.randint(0, 100, E)).astype(np.int32)
    src = np.sort(rng.randint(n - 90, n, E)).astype(np.int32)
    mask = np.ones(E, bool)
    ok, dlo, slo, nblk, band = plan_edge_windows(dst, src, mask, n)
    assert ok and band == SRC_BLK
    from cartnet_tpu.data.schema import CrystalBatch
    b = CrystalBatch(
        z=np.zeros(n, np.int32), pos=np.zeros((n, 3), np.float32),
        graph_id=np.zeros(n, np.int32), node_mask=np.ones(n, bool),
        non_h_mask=np.ones(n, bool), edge_src=jnp.asarray(src),
        edge_dst=jnp.asarray(dst), cart_dir=np.zeros((E, 3), np.float32),
        cart_dist=np.zeros(E, np.float32), edge_mask=mask,
        cell=np.eye(3, dtype=np.float32)[None], temperature=np.zeros(1),
        graph_mask=np.ones(1, bool), y=np.zeros(1, np.float32),
        edge_dst_lo=jnp.asarray(dlo), edge_src_lo=jnp.asarray(slo),
        edge_src_nblk=jnp.asarray(nblk), src_band=int(band),
        edge_fuse_ok=True)
    up = upgrade_src_band(b, 384)
    assert up.src_band == 384
    slo_up = np.asarray(up.edge_src_lo)
    assert (slo_up + 384 <= n).all()
    assert (slo_up <= np.asarray(slo)).all()
    # kernel outputs identical across bands (one-hot gathers are exact)
    key = jax.random.key(1)
    ks = jax.random.split(key, 9)
    mk = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.2
    args = [mk(ks[0], n, 2 * D), mk(ks[1], n, 2 * D), mk(ks[2], E, D),
            mk(ks[3], D, 2 * D), mk(ks[4], 2 * D), mk(ks[5], D, D),
            mk(ks[6], D), mk(ks[7], D, D), mk(ks[8], D)]
    em = jnp.asarray(mask)
    g1, s1, _, _, _ = edge_phase_fwd(*args, jnp.asarray(dst),
                                     jnp.asarray(src), em,
                                     b.edge_dst_lo, b.edge_src_lo,
                                     b.edge_src_nblk,
                                     c_src=b.src_band, interpret=True)
    g2, s2, _, _, _ = edge_phase_fwd(*args, jnp.asarray(dst),
                                     jnp.asarray(src), em,
                                     up.edge_dst_lo, up.edge_src_lo,
                                     up.edge_src_nblk, c_src=384,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-6, atol=1e-6)


def test_window_moments_and_their_grads(setup):
    """Kernel-emitted Welford partials == direct masked window moments of
    the gate, and their cotangents flow back into every input correctly
    (the bwd kernel's dgate folding)."""
    a, dst, src, dst_lo, src_lo, src_nblk, mask = setup
    names = list(a.keys())

    def moments_kernel(*vals):
        aa = dict(zip(names, vals))
        _, _, _, s1w, m2w = edge_phase(
            aa["xi"], aa["xj"], aa["e"], aa["we"], aa["b"],
            aa["w1g"], aa["b1g"], aa["w1a"], aa["b1a"],
            dst, src, mask, dst_lo, src_lo, src_nblk, interpret=True)
        return s1w, m2w

    def moments_ref(*vals):
        aa = dict(zip(names, vals))
        g, _ = _ref(aa, dst, src)
        nt = g.shape[0] // T_EDGES
        gw = g.reshape(nt, T_EDGES, -1)
        mf = mask.reshape(nt, T_EDGES, 1).astype(g.dtype)
        n_w = jnp.sum(mf, axis=1)
        s1 = jnp.sum(gw * mf, axis=1)
        mean_w = s1 / jnp.maximum(n_w, 1.0)
        m2 = jnp.sum(jnp.square((gw - mean_w[:, None, :]) * mf), axis=1)
        return s1, m2

    vals = [a[k] for k in names]
    s1k, m2k = moments_kernel(*vals)
    s1r, m2r = moments_ref(*vals)
    np.testing.assert_allclose(np.asarray(s1k), np.asarray(s1r),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m2k), np.asarray(m2r),
                               rtol=1e-4, atol=1e-3)

    # gradients of a scalar touching BOTH moment outputs
    key = jax.random.key(3)
    c1 = jax.random.normal(key, s1k.shape)
    c2 = jax.random.normal(jax.random.split(key)[1], m2k.shape)

    def loss_k(*vals):
        s1, m2 = moments_kernel(*vals)
        return jnp.sum(s1 * c1) + jnp.sum(m2 * c2)

    def loss_r(*vals):
        s1, m2 = moments_ref(*vals)
        return jnp.sum(s1 * c1) + jnp.sum(m2 * c2)

    gk = jax.grad(loss_k, argnums=tuple(range(len(vals))))(*vals)
    gr = jax.grad(loss_r, argnums=tuple(range(len(vals))))(*vals)
    for name, k_, r_ in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(k_), np.asarray(r_),
                                   rtol=3e-4, atol=3e-4, err_msg=name)
