"""Batch pipeline: shuffle, augment, collate to static shapes.

Equivalent of the reference's PyG DataLoaders (/root/reference/loader/
loader.py:114-124: train shuffled, val/test not; per-item transforms in CPU
workers) — but emitting static padded CrystalBatches sized once for the whole
dataset (one XLA compilation, no recompile storms; pad waste is reported).
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

from cartnet_tpu.data.adp import augment_record
from cartnet_tpu.data.batching import bandwidth_reorder, collate
from cartnet_tpu.data.schema import CrystalBatch


def record_counts(records) -> tuple:
    """(node_counts, edge_counts) arrays for a record source.

    Lazy datasets (ADP-scale) expose a ``counts()`` method backed by a
    sidecar cache so sizing never materializes the records."""
    if hasattr(records, "counts"):
        return records.counts()
    nodes = np.array([len(r["z"]) for r in records])
    edges = np.array([len(r["edge_src"]) for r in records])
    return nodes, edges


def edge_align_for(edges: np.ndarray) -> int:
    """Window-align each graph's edge segment when graphs are large enough
    that the padding tax is small vs the fused-kernel band win (ADP-scale);
    small-graph datasets (jarvis/megnet) stay unaligned."""
    from cartnet_tpu.ops.pallas.edge_kernels import T_EDGES
    return T_EDGES if len(edges) and float(np.mean(edges)) >= 2 * T_EDGES else 0


def choose_pad_sizes_from_counts(nodes: np.ndarray, edges: np.ndarray,
                                 batch_size: int, node_multiple: int = 128,
                                 edge_multiple: int = 512,
                                 safety: float = 1.0, edge_align: int = 0):
    """``node_multiple``/``edge_multiple`` scale with the mesh: an ep-sharded
    edge axis must split into whole Pallas windows (E % ep*T_EDGES == 0) and a
    halo node axis into aligned member blocks (N % 8*ep == 0)."""
    if edge_align:
        edges = (-(-np.asarray(edges) // edge_align)) * edge_align
    return _choose_pad_sizes_from_counts(nodes, edges, batch_size,
                                         node_multiple, edge_multiple, safety)


def _choose_pad_sizes_from_counts(nodes: np.ndarray, edges: np.ndarray,
                                  batch_size: int, node_multiple: int = 128,
                                  edge_multiple: int = 512,
                                  safety: float = 1.0):
    """Static (max_nodes, max_edges) covering the worst batch of this dataset.

    Uses the max over a sliding sum of the ``batch_size`` largest graphs —
    conservative upper bound, rounded to hardware-friendly multiples.
    """
    nodes = np.sort(np.asarray(nodes))[::-1]
    edges = np.sort(np.asarray(edges))[::-1]
    worst_n = int(nodes[:batch_size].sum() * safety)
    worst_e = int(edges[:batch_size].sum() * safety)
    max_nodes = -(-max(worst_n, 1) // node_multiple) * node_multiple
    max_edges = -(-max(worst_e, 1) // edge_multiple) * edge_multiple
    avg_n = nodes.mean() * batch_size
    avg_e = edges.mean() * batch_size
    logging.info("pad sizes: nodes %d (avg fill %.0f%%), edges %d (avg fill %.0f%%)",
                 max_nodes, 100 * avg_n / max_nodes,
                 max_edges, 100 * avg_e / max_edges)
    return max_nodes, max_edges


def choose_pad_sizes(records, batch_size: int,
                     node_multiple: int = 128, edge_multiple: int = 512,
                     safety: float = 1.0):
    nodes, edges = record_counts(records)
    return choose_pad_sizes_from_counts(nodes, edges, batch_size,
                                        node_multiple, edge_multiple, safety)


class BatchPipeline:
    """Iterates padded batches over a list of GraphRecords."""

    # eval-batch caching is skipped above this estimated footprint so an
    # ADP-scale (23k-crystal) test split never pins GBs of collated batches
    CACHE_BUDGET_BYTES = 2 << 30

    def __init__(self, records, batch_size: int,
                 max_nodes: Optional[int] = None, max_edges: Optional[int] = None,
                 shuffle: bool = False, augment: bool = False,
                 rotate_targets: bool = True, seed: int = 0,
                 drop_last: bool = False, prefetch: int = 2,
                 cache: Optional[bool] = None, workers: int = 0,
                 buckets: int = 1, edge_align: Optional[int] = None,
                 node_multiple: int = 128, edge_multiple: int = 512,
                 reorder: Optional[bool] = None):
        """``buckets`` > 1: records are split into size quantiles (by edge
        count), each bucket padded to ITS OWN worst batch — bounds the pad
        waste a heavy size tail causes under a single global shape, at the
        cost of one XLA compilation per bucket. Bucket order is shuffled per
        epoch; batches never mix buckets."""
        self.records = records
        self.batch_size = batch_size
        self.buckets = max(1, buckets)
        self._bucket_idx: Optional[List[np.ndarray]] = None
        self._bucket_sizes: Optional[List[tuple]] = None
        if (edge_align is None or self.buckets > 1
                or max_nodes is None or max_edges is None):
            nodes, edges = record_counts(records)
            if edge_align is None:
                edge_align = edge_align_for(edges)
        self.edge_align = edge_align or 0
        # RCM atom relabeling narrows the fused edge kernel's src band
        # (batching.bandwidth_reorder); only worth the host work where the
        # band matters, i.e. on window-aligned (ADP-scale) datasets
        self.reorder = bool(self.edge_align) if reorder is None else reorder
        if self.buckets > 1:
            order = np.argsort(edges, kind="stable")
            self._bucket_idx = [b for b in np.array_split(order, self.buckets)
                                if len(b)]
            self._bucket_sizes = [
                choose_pad_sizes_from_counts(nodes[b], edges[b], batch_size,
                                             node_multiple, edge_multiple,
                                             edge_align=self.edge_align)
                for b in self._bucket_idx]
            max_nodes = max(s[0] for s in self._bucket_sizes)
            max_edges = max(s[1] for s in self._bucket_sizes)
        elif max_nodes is None or max_edges is None:
            max_nodes, max_edges = choose_pad_sizes_from_counts(
                nodes, edges, batch_size, node_multiple, edge_multiple,
                edge_align=self.edge_align)
        self.max_nodes, self.max_edges = max_nodes, max_edges
        self.shuffle = shuffle
        self.augment = augment
        self.rotate_targets = rotate_targets
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.workers = workers
        # static eval pipelines (no shuffle/augment) collate once, reuse
        # forever — unless the cached epoch would blow the memory budget
        if cache is None:
            est = len(self) * self._batch_nbytes()
            cache = (not shuffle and not augment
                     and est < self.CACHE_BUDGET_BYTES)
        self.cache = cache
        self._cached: Optional[List[CrystalBatch]] = None
        self._rng = np.random.default_rng(seed)

    def _batch_nbytes(self) -> int:
        """Rough collated-batch footprint (f32 fields + masks + indices)."""
        return self.max_nodes * 64 + self.max_edges * 33

    def __len__(self):
        if self._bucket_idx is not None:
            div = (lambda n: n // self.batch_size) if self.drop_last else (
                lambda n: -(-n // self.batch_size))
            return sum(div(len(b)) for b in self._bucket_idx)
        n = len(self.records)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _fetch(self, idxs) -> List[dict]:
        if self.workers > 1:
            from concurrent.futures import ThreadPoolExecutor
            if not hasattr(self, "_pool"):
                self._pool = ThreadPoolExecutor(self.workers)
            return list(self._pool.map(self.records.__getitem__, idxs))
        return [self.records[j] for j in idxs]

    def _emit(self, order, mn, me) -> Iterator[CrystalBatch]:
        bs = self.batch_size
        stop = (len(order) // bs) * bs if self.drop_last else len(order)
        for i in range(0, stop, bs):
            recs = self._fetch(order[i:i + bs])
            if self.augment:
                recs = [augment_record(r, self._rng, self.rotate_targets)
                        for r in recs]
            if self.reorder:
                recs = [bandwidth_reorder(r) for r in recs]
            yield collate(recs, mn, me, bs, edge_align=self.edge_align)

    def bucket_batch_counts(self):
        """Batches per bucket (a single pseudo-bucket when unbucketed) —
        lets dp super-batch consumers (runner.ShardedPipeline) compute their
        exact step count: groups never span a bucket boundary."""
        div = (lambda n: n // self.batch_size) if self.drop_last else (
            lambda n: -(-n // self.batch_size))
        if self._bucket_idx is not None:
            return [div(len(b)) for b in self._bucket_idx]
        return [div(len(self.records))]

    def _make_batches(self) -> Iterator[tuple]:
        """Yields (bucket_id, batch) pairs; bucket_id is stable across epochs
        (shuffle permutes visit ORDER, not identity)."""
        if self._bucket_idx is not None:
            border = np.arange(len(self._bucket_idx))
            if self.shuffle:
                self._rng.shuffle(border)
            for bi in border:
                order = self._bucket_idx[bi].copy()
                if self.shuffle:
                    self._rng.shuffle(order)
                for b in self._emit(order, *self._bucket_sizes[bi]):
                    yield int(bi), b
            return
        order = np.arange(len(self.records))
        if self.shuffle:
            self._rng.shuffle(order)
        for b in self._emit(order, self.max_nodes, self.max_edges):
            yield 0, b

    def iter_with_bucket(self) -> Iterator[tuple]:
        """(bucket_id, batch) pairs with the same cache/prefetch behavior as
        plain iteration."""
        if self.cache:
            if self._cached is None:
                self._cached = list(self._make_batches())
            yield from self._cached
            return
        if self.prefetch <= 0:
            yield from self._make_batches()
            return
        # background-thread collation so host batch prep overlaps device steps
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        done = object()

        def producer():
            try:
                for pair in self._make_batches():
                    q.put(pair)
            finally:
                q.put(done)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is done:
                break
            yield item
        t.join()

    def __iter__(self) -> Iterator[CrystalBatch]:
        for _, b in self.iter_with_bucket():
            yield b
