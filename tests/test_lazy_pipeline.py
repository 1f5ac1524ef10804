"""Memory-bounded streaming pipeline (reference streams per-refcode .pt via
DataLoader workers, loader/loader.py:115-123; round-1 eagerly materialized the
whole split). Verifies: lazy ADP views feed BatchPipeline correctly, pad
sizing runs off the counts sidecar, large eval splits skip batch caching, and
a full-dataset-scale (50k-record) epoch iterates under a fixed RSS budget."""

import os

import numpy as np
import pytest

from cartnet_tpu.data.pipeline import BatchPipeline, record_counts


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 2**20


class SynthLazy:
    """50k-scale lazy record source: deterministic ring graphs, built on
    __getitem__ (no radius-graph cost so the test stays fast)."""

    def __init__(self, n, atoms=10):
        self.n, self.atoms = n, atoms

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if not (0 <= i < self.n):
            raise IndexError(i)
        rng = np.random.default_rng(i)
        k = self.atoms
        src = np.arange(k, dtype=np.int64)
        dst = (src + 1) % k
        src2 = np.concatenate([src, dst])
        dst2 = np.concatenate([dst, src])
        order = np.argsort(dst2, kind="stable")
        d = rng.uniform(1.0, 2.0, 2 * k).astype(np.float32)
        v = rng.normal(size=(2 * k, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return {"z": rng.integers(1, 80, k).astype(np.int32),
                "pos": rng.uniform(0, 5, (k, 3)).astype(np.float32),
                "cell": np.eye(3, dtype=np.float32) * 5,
                "edge_src": src2[order], "edge_dst": dst2[order],
                "cart_dist": d[order], "cart_dir": v[order],
                "temperature": 0.0,
                "y": np.float32(rng.normal())}

    def counts(self):
        n = np.full(self.n, self.atoms, np.int64)
        return n, 2 * n


def test_counts_path_avoids_materialization():
    recs = SynthLazy(50_000)
    nodes, edges = record_counts(recs)
    assert len(nodes) == 50_000 and edges.sum() == 50_000 * 20


def test_large_eval_pipeline_skips_batch_cache():
    small = BatchPipeline(SynthLazy(64), 4, 256, 1024)
    assert small.cache  # tiny eval split: caching is the win
    big = BatchPipeline(SynthLazy(2_000_000), 4, 4096, 65536)
    assert not big.cache  # ADP-scale: caching would pin GBs


@pytest.mark.parametrize("workers", [0, 2])
def test_50k_epoch_under_rss_budget(workers):
    recs = SynthLazy(50_000)
    pipe = BatchPipeline(recs, 64, shuffle=True, seed=0, workers=workers,
                         prefetch=2)
    start = _rss_mb()
    seen_nodes = 0
    peak_delta = 0.0
    for i, b in enumerate(pipe):
        seen_nodes += int(b.node_mask.sum())
        if i % 100 == 0:
            peak_delta = max(peak_delta, _rss_mb() - start)
    assert seen_nodes == 50_000 * 10
    peak_delta = max(peak_delta, _rss_mb() - start)
    # materialized split would be ~50k * (record bytes) >> budget; streaming
    # holds only prefetch+batch working set
    assert peak_delta < 256, f"RSS grew {peak_delta:.0f} MB"


def test_lazy_adp_records_and_counts_sidecar(tmp_path):
    """LazyRecords over real .pt files: streaming get + sidecar counts."""
    from cartnet_tpu.data.adp import ADPDataset, LazyRecords
    from cartnet_tpu.data.synthetic import random_crystal
    from tests.test_datasets import _save_adp_pt
    rng = np.random.default_rng(5)
    root = tmp_path / "data"
    root.mkdir()
    names = []
    for i in range(6):
        rec = random_crystal(rng, int(rng.integers(4, 9)), adp=True)
        _save_adp_pt(root / f"R{i}.pt", rec)
        names.append(f"R{i}")
    csv = tmp_path / "train_files.csv"
    csv.write_text("\n".join(names) + "\n")
    ds = ADPDataset(str(root), str(csv))
    lazy = LazyRecords(ds)
    assert len(lazy) == 6
    nodes, edges = lazy.counts()
    for i in range(6):
        r = lazy[i]
        assert len(r["z"]) == nodes[i] and len(r["edge_src"]) == edges[i]
    # sidecar cached next to the data dir; second call is pure read
    sidecars = list(tmp_path.glob("sizes_*train_files.npy"))
    assert len(sidecars) == 1
    nodes2, _ = LazyRecords(ds).counts()
    np.testing.assert_array_equal(nodes, nodes2)
    # limited view
    lim = LazyRecords(ds, limit=3)
    assert len(lim) == 3 and len(lim.counts()[0]) == 3
    # feeds a pipeline end to end
    pipe = BatchPipeline(lim, 2)
    batches = list(pipe)
    assert sum(int(b.graph_mask.sum()) for b in batches) == 3


def test_bucketed_pipeline_fill_floor_and_coverage():
    """Size-quantile buckets: every record seen exactly once per epoch, and
    average edge fill beats the single-shape pipeline on a heavy size tail
    (VERDICT round-1: worst-case padding can silently halve throughput)."""
    rng = np.random.default_rng(0)

    def rec(k):
        src = np.arange(k, dtype=np.int64)
        dst = (src + 1) % k
        order = np.argsort(dst, kind="stable")
        v = rng.normal(size=(k, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return {"z": np.full(k, 6, np.int32),
                "pos": rng.uniform(0, 5, (k, 3)).astype(np.float32),
                "cell": np.eye(3, dtype=np.float32) * 5,
                "edge_src": src[order], "edge_dst": dst[order],
                "cart_dist": np.ones(k, np.float32), "cart_dir": v[order],
                "temperature": 0.0, "y": np.float32(rng.normal())}

    # heavy tail: mostly small graphs, a few 20x bigger
    recs = [rec(int(rng.integers(8, 16))) for _ in range(180)]
    recs += [rec(int(rng.integers(200, 260))) for _ in range(20)]
    total_edges = sum(len(r["edge_src"]) for r in recs)

    def avg_fill(pipe):
        pad = real = 0
        zsum = 0
        for b in pipe:
            pad += b.edge_mask.shape[0]
            real += int(b.edge_mask.sum())
            zsum += int(b.z[b.node_mask].sum())
        assert real == total_edges  # full coverage
        return real / pad, zsum

    flat = BatchPipeline(recs, 8, shuffle=True, seed=1)
    bucketed = BatchPipeline(recs, 8, shuffle=True, seed=1, buckets=4)
    fill_flat, _ = avg_fill(flat)
    fill_bucket, _ = avg_fill(bucketed)
    assert len(bucketed) >= len(flat)  # ceil per bucket
    assert fill_bucket > 2 * fill_flat, (fill_flat, fill_bucket)
    # NB: the absolute fill here is bounded by the 512-edge pad rounding at
    # toy scale (96 real edges/batch); at ADP scale (~20k edges/batch) the
    # rounding term is <3% and the bucket fill is the binding factor.
    # deterministic epoch composition for a fixed seed
    b1 = [int(b.edge_mask.sum()) for b in BatchPipeline(recs, 8, shuffle=True,
                                                        seed=2, buckets=4)]
    b2 = [int(b.edge_mask.sum()) for b in BatchPipeline(recs, 8, shuffle=True,
                                                        seed=2, buckets=4)]
    assert b1 != sorted(b1)  # bucket order actually shuffles
    # same seed -> same epoch; rng state advances across epochs inside one
    # pipeline, so compare two fresh pipelines
    assert b1 == b2


# ------------------------------------------------------- bandwidth reorder

def _edge_fingerprint(rec):
    """Node-labeling-invariant edge multiset: rows keyed by endpoint
    positions + geometry (positions identify atoms regardless of ids)."""
    pos = np.asarray(rec["pos"])
    rows = np.concatenate([
        pos[np.asarray(rec["edge_src"])], pos[np.asarray(rec["edge_dst"])],
        np.asarray(rec["cart_dist"])[:, None], np.asarray(rec["cart_dir"])],
        axis=1)
    return rows[np.lexsort(rows.T[::-1])]


def test_bandwidth_reorder_is_exact_relabeling():
    from cartnet_tpu.data.batching import bandwidth_reorder
    from cartnet_tpu.data.synthetic import synthetic_dataset
    for rec in synthetic_dataset(3, mean_atoms=60, radius=5.0, adp=True,
                                 seed=3):
        out = bandwidth_reorder(rec)
        # atoms are a permutation: (z, pos, y) rows ride together
        a = np.concatenate([np.asarray(rec["z"])[:, None],
                            np.asarray(rec["pos"]),
                            np.asarray(rec["y"]).reshape(len(rec["z"]), 9)], 1)
        b = np.concatenate([np.asarray(out["z"])[:, None],
                            np.asarray(out["pos"]),
                            np.asarray(out["y"]).reshape(len(out["z"]), 9)], 1)
        np.testing.assert_array_equal(a[np.lexsort(a.T[::-1])],
                                      b[np.lexsort(b.T[::-1])])
        # edges are the same multiset under the relabeling
        np.testing.assert_allclose(_edge_fingerprint(rec),
                                   _edge_fingerprint(out), rtol=0, atol=0)


def test_bandwidth_reorder_model_equivalent():
    """Relabeling atoms must not change per-graph predictions (the model is
    permutation-equivariant; scalar head is permutation-invariant)."""
    import jax
    from cartnet_tpu.config import ModelConfig
    from cartnet_tpu.data.batching import bandwidth_reorder, collate
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
    recs = synthetic_dataset(3, mean_atoms=24, radius=5.0, adp=False, seed=7)
    cfg = ModelConfig(dim_in=32, dim_rbf=8, num_layers=2, cholesky=False)
    params, state = cartnet_init(jax.random.key(0), cfg)
    b0 = collate(recs, 128, 4096, 4)
    b1 = collate([bandwidth_reorder(r) for r in recs], 128, 4096, 4)
    p0, m0, _ = cartnet_apply(params, state, b0, cfg, training=True)
    p1, m1, _ = cartnet_apply(params, state, b1, cfg, training=True)
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    np.testing.assert_allclose(np.asarray(p0)[np.asarray(m0)],
                               np.asarray(p1)[np.asarray(m1)],
                               rtol=2e-4, atol=2e-5)


def test_pipeline_reorder_defaults_to_edge_aligned():
    recs = list(SynthLazy(8, atoms=24))
    assert BatchPipeline(recs, 4, 128, 1024, edge_align=512).reorder
    assert not BatchPipeline(recs, 4, 128, 1024, edge_align=0).reorder
    # batches still come out well-formed with reorder forced on
    pipe = BatchPipeline(recs, 4, 128, 1024, edge_align=0, reorder=True)
    b = next(iter(pipe))
    assert int(b.edge_mask.sum()) == 4 * 48
