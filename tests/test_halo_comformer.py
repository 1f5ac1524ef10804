"""Halo edge partitioning for the Comformer family (8 virtual CPU devices).

Round 5 closes the last parallelism partial (VERDICT r4 coverage table):
the dst-owned halo layout of parallel/halo.py now also drives

  * ComformerConv — boundary x rows exchanged once per conv, key/value
    projections over the [local ‖ recv] table (models/comformer.py);
  * the eComformer equivariant block — scatter-mean onto edge SOURCES via
    the reverse all_to_all (parallel/halo.py::halo_scatter_back);
  * iComformer's per-edge lattice features — graph ids from the local dst
    gather (the searchsorted trick is invalid on member node windows).

Each test checks halo loss/grads == the single-device step for BOTH a
graph-snapped batch (empty halo) and a single crystal genuinely split
across ep members (non-empty halo, the CP analogue).
"""

import numpy as np
import pytest

import jax

from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig, \
    ParallelConfig
from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models.comformer import (ecomformer_apply, ecomformer_init,
                                          icomformer_apply, icomformer_init)
from cartnet_tpu.parallel.halo import to_halo
from cartnet_tpu.parallel.mesh import make_mesh
from cartnet_tpu.parallel.step import make_parallel_steps, stack_for_shards
from cartnet_tpu.train.loop import build_optimizer, init_train_state, make_steps

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

DP, EP = 2, 4

MODELS = {"ecomformer": (ecomformer_init, ecomformer_apply),
          "icomformer": (icomformer_init, icomformer_apply)}


def _cfg(name):
    return Config(
        model=ModelConfig(name=name, dim_in=16, dim_rbf=8, num_layers=2,
                          cholesky=True),
        data=DataConfig(max_nodes=64, max_edges=512, max_graphs=4),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1),
        parallel=ParallelConfig(dp=DP, ep=EP, halo=True))


def _chain_graph(n=48, seed=7):
    """One spatially-local crystal (atoms on a line, +-2 coupling): contiguous
    index cuts have O(1) boundary — genuinely splits across ep members."""
    rng = np.random.default_rng(seed)
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = np.arange(n, dtype=np.float32)
    src, dst = [], []
    for d in (1, 2):
        a = np.arange(n - d)
        src += [a, a + d]
        dst += [a + d, a]
    src = np.concatenate(src).astype(np.int64)
    dst = np.concatenate(dst).astype(np.int64)
    vec = pos[src] - pos[dst]
    dist = np.linalg.norm(vec, axis=1).astype(np.float32)
    a = rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.3
    return {"z": rng.integers(2, 60, n).astype(np.int32), "pos": pos,
            "cell": np.eye(3, dtype=np.float32) * (n + 10.0),
            "edge_src": src, "edge_dst": dst, "cart_dist": dist,
            "cart_dir": (vec / dist[:, None]).astype(np.float32),
            "temperature": 100.0,
            "y": np.einsum("nij,nkj->nik", a, a)
            + 0.2 * np.eye(3, dtype=np.float32)}


def _split_data():
    """DP slices of one chain crystal each — every slice MUST split over ep."""
    recs = [_chain_graph(seed=7), _chain_graph(seed=8)]
    slices = [collate([r], 64, 512, 4) for r in recs]
    merged = collate(recs, DP * 64, DP * 512, DP * 4)
    return slices, merged


def _snapped_data():
    """4 small crystals per slice — graph-snapped cuts, empty halo."""
    recs = synthetic_dataset(DP * 4, mean_atoms=8, adp=True, seed=0,
                             max_neighbors=14)
    slices = [collate(recs[i * 4:(i + 1) * 4], 64, 2048, 4)
              for i in range(DP)]
    merged = collate(recs, DP * 64, DP * 2048, DP * 4)
    return slices, merged


@pytest.mark.parametrize("name", list(MODELS))
@pytest.mark.parametrize("data_fn", [_snapped_data, _split_data])
def test_comformer_halo_micro_matches_single_device(name, data_fn):
    init_fn, apply_fn = MODELS[name]
    cfg = _cfg(name)
    slices, merged = data_fn()
    halos = [to_halo(s, EP, h_max=16) for s in slices]
    if data_fn is _split_data:
        assert any(int(np.asarray(h.halo_send_mask).sum()) > 0
                   for h in halos), "split data must exercise a real halo"
    stacked = stack_for_shards(halos, ep=EP)
    mesh = make_mesh(DP, EP)
    opt = build_optimizer(cfg, 4)

    state_p = init_train_state(jax.random.key(0), cfg, init_fn, opt)
    state_s = init_train_state(jax.random.key(0), cfg, init_fn, opt)
    pmicro, _, _ = make_parallel_steps(cfg, apply_fn, opt, mesh, halo=True)
    smicro, _, _ = make_steps(cfg, apply_fn, opt)

    state_p, stats_p = pmicro(state_p, stacked)
    state_s, stats_s = smicro(state_s, merged)
    np.testing.assert_allclose(float(stats_p["loss"]), float(stats_s["loss"]),
                               rtol=1e-4)
    # tolerance rationale: see tests/test_parallel_comformer.py — untrained
    # Comformer losses are O(100), so f32 noise floors scale with the loss
    scale = max(1.0, float(stats_s["loss"]))
    for gp, gs in zip(jax.tree.leaves(state_p.grad_accum),
                      jax.tree.leaves(state_s.grad_accum)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   rtol=1e-2, atol=2e-5 * scale)
    for bp, bs in zip(jax.tree.leaves(state_p.bn_state),
                      jax.tree.leaves(state_s.bn_state)):
        np.testing.assert_allclose(np.asarray(bp), np.asarray(bs),
                                   rtol=1e-4, atol=1e-6 * scale)


def test_icomformer_halo_fused_chunk_matches_micro():
    """The in-shard_map lax.scan epoch (make_parallel_fused_chunk, halo=True)
    must reproduce the per-batch halo micro/update cadence for the Comformer
    family too — same params and BN state after one accumulation window."""
    import jax.numpy as jnp
    from cartnet_tpu.parallel.step import make_parallel_fused_chunk
    init_fn, apply_fn = MODELS["icomformer"]
    cfg = _cfg("icomformer").replace(
        optim=OptimConfig(lr=1e-3, batch_accumulation=2))
    mk = lambda recs: stack_for_shards(
        [to_halo(collate([r], 64, 512, 4), EP, h_max=16) for r in recs],
        ep=EP)
    b1 = mk([_chain_graph(seed=7), _chain_graph(seed=8)])
    b2 = mk([_chain_graph(seed=9), _chain_graph(seed=10)])
    # one traced scan: align the static halo flags across the two batches
    hempty = b1.halo_empty and b2.halo_empty
    hint = min(b1.halo_interior_nt, b2.halo_interior_nt)
    b1 = b1.replace(halo_empty=hempty, halo_interior_nt=hint)
    b2 = b2.replace(halo_empty=hempty, halo_interior_nt=hint)
    mesh = make_mesh(DP, EP)
    opt = build_optimizer(cfg, 4)

    s_u = init_train_state(jax.random.key(2), cfg, init_fn, opt)
    s_f = init_train_state(jax.random.key(2), cfg, init_fn, opt)
    micro, update, _ = make_parallel_steps(cfg, apply_fn, opt, mesh,
                                           halo=True)
    chunk = make_parallel_fused_chunk(cfg, apply_fn, opt, 2, mesh, halo=True)

    for b in (b1, b2):
        s_u, _ = micro(s_u, b)
    s_u = update(s_u)
    stacked2 = jax.tree.map(lambda x, y: jnp.stack([x, y]), b1, b2)
    s_f, _ = chunk(s_f, stacked2)

    assert int(s_u.step) == int(s_f.step) == 1
    for a, b in zip(jax.tree.leaves(s_u.params), jax.tree.leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_u.bn_state),
                    jax.tree.leaves(s_f.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", list(MODELS))
def test_comformer_halo_eval_matches_single_device(name):
    init_fn, apply_fn = MODELS[name]
    cfg = _cfg(name)
    slices, merged = _split_data()
    stacked = stack_for_shards([to_halo(s, EP, h_max=16) for s in slices],
                               ep=EP)
    mesh = make_mesh(DP, EP)
    opt = build_optimizer(cfg, 4)
    state = init_train_state(jax.random.key(1), cfg, init_fn, opt)
    _, _, peval = make_parallel_steps(cfg, apply_fn, opt, mesh, halo=True)
    _, _, seval = make_steps(cfg, apply_fn, opt)

    pred_p, mask_p, stats_p = peval(state.params, state.bn_state, stacked)
    pred_s, mask_s, stats_s = seval(state.params, state.bn_state, merged)
    np.testing.assert_allclose(float(stats_p["MAE"]), float(stats_s["MAE"]),
                               rtol=1e-4)
    # same multiset of per-atom predictions (member blocks reorder rows)
    got = np.asarray(pred_p)[np.asarray(mask_p)]
    want = np.asarray(pred_s)[np.asarray(mask_s)]
    order_g = np.lexsort(got.reshape(len(got), -1).T)
    order_w = np.lexsort(want.reshape(len(want), -1).T)
    np.testing.assert_allclose(got[order_g], want[order_w], rtol=1e-3,
                               atol=1e-5 * max(1.0, float(stats_s["MAE"])))
