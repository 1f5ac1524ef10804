"""Frozen learnable-ADP fixture dataset ("adpfix").

Zero-egress stand-in for the licensed CSD ADP benchmark
(/root/reference/README.md:95, dataset/datasetADP.py): ~240 random crystals
with a deterministic, SO(3)-equivariant, temperature- and Z-dependent ADP
ground truth (data/synthetic.py::learnable_adp_y) that a trained model must
actually LEARN — unlike the pure-noise `synthetic` targets used for smoke
runs. The structures (z, pos, cell, temperature) and their y tensors are
frozen in a committed .npz; graphs are rebuilt at load time by the
production radius-graph builder (bit-identical C++/numpy, tested), so the
loader also exercises the real ETL path.

Split is fixed by position: first 200 train, next 20 val, last 20 test.
Temperature standardization applies the reference's hard-coded ADP train
stats (dataset/datasetADP.py:17-18) for product-path parity.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from cartnet_tpu.data.radius_graph import radius_graph_pbc
from cartnet_tpu.data.synthetic import learnable_adp_y

FIXTURE_PATH = os.path.join(os.path.dirname(__file__), "fixtures",
                            "adpfix.npz")
TEMP_MEAN, TEMP_STD = 192.1785, 81.2135  # dataset/datasetADP.py:17-18
N_TRAIN, N_VAL, N_TEST = 200, 20, 20
RADIUS = 5.0


def generate_structures(num: int = N_TRAIN + N_VAL + N_TEST, seed: int = 77,
                        mean_atoms: int = 40) -> List[dict]:
    """Random periodic structures + frozen learnable y (run once by
    scripts/make_adpfix.py; the committed npz is the source of truth)."""
    rng = np.random.default_rng(seed)
    recs = []
    for _ in range(num):
        n = max(6, int(rng.normal(mean_atoms, mean_atoms * 0.25)))
        vol = n / 0.045
        a = vol ** (1.0 / 3.0)
        cell = (np.eye(3) * a
                + rng.uniform(-0.1 * a, 0.1 * a, (3, 3)) * (1 - np.eye(3)))
        pos = rng.uniform(0, 1, (n, 3)) @ cell
        z = rng.integers(1, 84, n).astype(np.int32)
        temp = float(rng.uniform(20, 500))
        src, dst, dist, cart_dir = radius_graph_pbc(pos, cell, RADIUS)
        y = learnable_adp_y(z, src, dst, dist, cart_dir, temp, RADIUS)
        recs.append({"z": z, "pos": pos.astype(np.float32),
                     "cell": cell.astype(np.float32), "temperature": temp,
                     "y": y})
    return recs


def save_fixture(path: str = FIXTURE_PATH) -> None:
    recs = generate_structures()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    flat = {}
    for i, r in enumerate(recs):
        for k in ("z", "pos", "cell", "y"):
            flat[f"{k}_{i}"] = r[k]
        flat[f"temperature_{i}"] = np.float32(r["temperature"])
    flat["num"] = np.int32(len(recs))
    np.savez_compressed(path, **flat)


def load_fixture(path: str = FIXTURE_PATH, standarize_temp: bool = True,
                 limit=None) -> Tuple[List[dict], List[dict], List[dict]]:
    """Load the frozen structures, rebuild graphs, return (train, val, test)."""
    with np.load(path) as f:
        num = int(f["num"])
        recs = []
        for i in range(num):
            z = f[f"z_{i}"]
            pos = f[f"pos_{i}"].astype(np.float64)
            cell = f[f"cell_{i}"].astype(np.float64)
            temp = float(f[f"temperature_{i}"])
            src, dst, dist, cart_dir = radius_graph_pbc(pos, cell, RADIUS)
            t_in = ((temp - TEMP_MEAN) / TEMP_STD) if standarize_temp else temp
            recs.append({
                "z": z.astype(np.int32), "pos": pos.astype(np.float32),
                "cell": f[f"cell_{i}"],
                "edge_src": src, "edge_dst": dst, "cart_dist": dist,
                "cart_dir": cart_dir, "temperature": t_in,
                "y": f[f"y_{i}"]})
    train = recs[:N_TRAIN]
    val = recs[N_TRAIN:N_TRAIN + N_VAL]
    test = recs[N_TRAIN + N_VAL:]
    if limit:
        train, val, test = train[:limit], val[:max(limit // 4, 2)], \
            test[:max(limit // 4, 2)]
    return train, val, test
