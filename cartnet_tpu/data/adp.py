"""ADP dataset importer: per-refcode ``.pt`` graphs -> GraphRecords.

Runtime equivalent of /root/reference/dataset/datasetADP.py (the licensed-CSD
ETL itself, extract_csd_data.py, is out of scope — data must be pre-extracted):

  * temperature standardization with the reference's hard-coded train stats
    mean=192.1785, std=81.2135 (datasetADP.py:17-18,43-45);
  * ``non_H_mask = z != 1`` (:49);
  * optional hydrogen removal with edge re-indexing — vectorized numpy instead
    of the reference's Python dict loop (:52-72);
  * optional lattice canonicalization for iComformer, conjugating y and
    rotating cart_dir (:75-80);
  * optional SO(3) augmentation y <- RᵀyR, cart_dir <- cart_dir R,
    cell <- cell R (:33-39) — applied at batch time by the pipeline.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from cartnet_tpu.data.lattice import optimize_lattice

TRAIN_TEMP_MEAN = 192.1785
TRAIN_TEMP_STD = 81.2135


def load_refcodes(csv_path: str) -> List[str]:
    with open(csv_path) as f:
        return [line.strip() for line in f if line.strip()]


def load_pt_raw(path: str) -> dict:
    """Read one reference-format ``.pt`` graph (torch CPU), unprocessed."""
    import torch
    data = torch.load(path, map_location="cpu", weights_only=False)
    return {
        "z": np.asarray(data.x, np.int32).reshape(-1),
        "pos": np.asarray(data.pos, np.float32),
        "cell": np.asarray(data.cell, np.float32).reshape(3, 3),
        "edge_src": np.asarray(data.edge_index[0], np.int64),
        "edge_dst": np.asarray(data.edge_index[1], np.int64),
        "cart_dist": np.asarray(data.cart_dist, np.float32).reshape(-1),
        "cart_dir": np.asarray(data.cart_dir, np.float32),
        "y": np.asarray(data.y, np.float32),
        "temperature": float(np.asarray(data.temperature).reshape(-1)[0]),
    }


def load_pt_record(path: str, standarize_temp: bool = True,
                   hydrogens: bool = True, optimize_cell: bool = False) -> dict:
    """Read one reference-format ``.pt`` graph (torch CPU) into a GraphRecord."""
    return process_adp_record(load_pt_raw(path), standarize_temp, hydrogens,
                              optimize_cell)


def re_edge_record(rec: dict, radius: float, max_neighbors: int) -> dict:
    """Recompute the edge set with a max-neighbor cap on the RAW (pre-H-
    removal) graph — the Comformer-on-ADP detour (reference
    dataset/utils.py:456-486 compute_knn + loader/loader.py:24-28)."""
    from cartnet_tpu.data.radius_graph import radius_graph_pbc
    src, dst, dist, cart_dir = radius_graph_pbc(
        rec["pos"].astype(np.float64), rec["cell"].astype(np.float64),
        radius, max_neighbors)
    out = dict(rec)
    out["edge_src"] = src.astype(np.int64)
    out["edge_dst"] = dst.astype(np.int64)
    out["cart_dist"] = dist.astype(np.float32)
    out["cart_dir"] = cart_dir.astype(np.float32)
    return out


def process_adp_record(rec: dict, standarize_temp: bool = True,
                       hydrogens: bool = True,
                       optimize_cell: bool = False) -> dict:
    rec = dict(rec)
    rec["temperature_og"] = rec["temperature"]
    if standarize_temp:
        rec["temperature"] = (rec["temperature"] - TRAIN_TEMP_MEAN) / TRAIN_TEMP_STD
    if not hydrogens:
        rec = remove_hydrogens(rec)
    if optimize_cell:
        new_cell, rot = optimize_lattice(rec["cell"])
        rec["cell_og"] = rec["cell"]
        rec["cell"] = new_cell.astype(np.float32)
        # reference quirk kept verbatim (datasetADP.py:79-80): cart_dir @ R and
        # y -> RᵀyR, although the cell itself was rotated with @ Rᵀ — dir and
        # y stay mutually consistent, the cell frame does not.
        rot32 = rot.astype(np.float32)
        rec["cart_dir"] = rec["cart_dir"] @ rot32
        rec["y"] = np.einsum("ji,njk,kl->nil", rot32, rec["y"],
                             rot32).astype(np.float32)
    return rec


def remove_hydrogens(rec: dict) -> dict:
    """Drop H atoms and their incident edges, re-indexing (vectorized)."""
    keep = rec["z"] != 1
    new_index = np.cumsum(keep) - 1  # old -> new position
    e_keep = keep[rec["edge_src"]] & keep[rec["edge_dst"]]
    out = dict(rec)
    out["z"] = rec["z"][keep]
    out["pos"] = rec["pos"][keep]
    out["edge_src"] = new_index[rec["edge_src"][e_keep]]
    out["edge_dst"] = new_index[rec["edge_dst"][e_keep]]
    out["cart_dist"] = rec["cart_dist"][e_keep]
    out["cart_dir"] = rec["cart_dir"][e_keep]
    if np.ndim(rec["y"]) == 3:
        out["y"] = rec["y"][keep]
    return out


def augment_record(rec: dict, rng: np.random.Generator,
                   rotate_targets: bool = True) -> dict:
    """SO(3) augmentation (datasetADP.py:33-39 / figshare_dataset.py:43-48)."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)
    out = dict(rec)
    out["cart_dir"] = rec["cart_dir"] @ R
    out["cell"] = rec["cell"] @ R
    if rotate_targets and np.ndim(rec["y"]) == 3:
        out["y"] = np.einsum("ji,njk,kl->nil", R, rec["y"], R).astype(np.float32)
    return out


class ADPDataset:
    """Lazy per-refcode loader mirroring DatasetADP (datasetADP.py:12-87).

    ``max_neighbors``/``radius``: when set (> 0), every record's edge set is
    recomputed under the neighbor cap before any processing, mirroring the
    reference's compute_knn re-edging for Comformer-on-ADP runs
    (dataset/utils.py:456-486); results are cached per refcode in a sibling
    ``data_<k>_<radius>`` dir like the reference's cache layout.
    """

    def __init__(self, root: str, refcodes_csv: str, standarize_temp=True,
                 hydrogens=True, augment=False, optimize_cell=False,
                 max_neighbors: Optional[int] = None, radius: float = 5.0):
        self.root = root
        self.refcodes = load_refcodes(refcodes_csv)
        self.standarize_temp = standarize_temp
        self.hydrogens = hydrogens
        self.augment = augment
        self.optimize_cell = optimize_cell
        self._csv_name = os.path.splitext(os.path.basename(refcodes_csv))[0]
        self.max_neighbors = (max_neighbors if max_neighbors
                              and max_neighbors > 0 else None)
        self.radius = radius
        if self.max_neighbors:
            self.knn_dir = os.path.join(
                os.path.dirname(os.path.normpath(root)) or ".",
                f"data_{self.max_neighbors}_{radius}")
            os.makedirs(self.knn_dir, exist_ok=True)

    def __len__(self):
        return len(self.refcodes)

    def _load_raw(self, refcode: str) -> dict:
        rec = load_pt_raw(os.path.join(self.root, refcode + ".pt"))
        if not self.max_neighbors:
            return rec
        cache = os.path.join(self.knn_dir, refcode + ".npz")
        if os.path.exists(cache):
            with np.load(cache) as z:
                rec.update({k: z[k] for k in ("edge_src", "edge_dst",
                                              "cart_dist", "cart_dir")})
            return rec
        rec = re_edge_record(rec, self.radius, self.max_neighbors)
        np.savez(cache, edge_src=rec["edge_src"], edge_dst=rec["edge_dst"],
                 cart_dist=rec["cart_dist"], cart_dir=rec["cart_dir"])
        return rec

    def get(self, idx: int, rng: Optional[np.random.Generator] = None) -> dict:
        rec = process_adp_record(self._load_raw(self.refcodes[idx]),
                                 self.standarize_temp, self.hydrogens,
                                 self.optimize_cell)
        if self.augment and rng is not None:
            rec = augment_record(rec, rng)
        return rec


class LazyRecords:
    """Memory-bounded Sequence[GraphRecord] view over an ADPDataset.

    The reference streams per-refcode ``.pt`` lazily through DataLoader
    workers (datasetADP.py:42, loader/loader.py:115-123); this is the
    equivalent for BatchPipeline — records are loaded on __getitem__, never
    materialized as a whole split. ``counts()`` serves pad sizing from a
    one-time sidecar scan cached next to the data dir.
    """

    def __init__(self, dataset: ADPDataset, limit: Optional[int] = None):
        self.dataset = dataset
        self.n = len(dataset) if limit is None else min(limit, len(dataset))

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int) -> dict:
        if not (0 <= idx < self.n):
            raise IndexError(idx)
        return self.dataset.get(idx)

    def counts(self):
        """(node_counts, edge_counts) for pad sizing, sidecar-cached."""
        ds = self.dataset
        tag = (f"sizes_h{int(ds.hydrogens)}_k{ds.max_neighbors or -1}"
               f"_r{ds.radius}")
        base = os.path.basename(os.path.normpath(
            getattr(ds, "_csv_name", "split")))
        cache = os.path.join(os.path.dirname(os.path.normpath(ds.root)) or ".",
                             f"{tag}_{base}.npy")
        if os.path.exists(cache):
            arr = np.load(cache)
            if len(arr) >= self.n:
                return arr[:self.n, 0], arr[:self.n, 1]
        arr = np.zeros((self.n, 2), np.int64)
        for i in range(self.n):
            rec = ds.get(i)
            arr[i] = (len(rec["z"]), len(rec["edge_src"]))
        try:
            np.save(cache, arr)
        except OSError:  # read-only data dir: sizing still works, uncached
            pass
        return arr[:, 0], arr[:, 1]
