"""Aggregation CLI over synthetic stats.json trees."""

import json
import os

import numpy as np

from cartnet_tpu.aggregate import aggregate, load_last_stats


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_aggregate_multi_seed(tmp_path):
    for seed, mae in enumerate([0.5, 0.6, 0.7, 0.8]):
        _write(str(tmp_path / "Run" / str(seed) / "test" / "stats.json"),
               [{"epoch": 0, "MAE": 9.9, "loss": 9.9},
                {"epoch": 1, "MAE": mae, "loss": mae, "iou": 0.8 + seed / 100}])
    out = aggregate("Run", [0, 1, 2, 3], str(tmp_path))
    np.testing.assert_allclose(out["MAE"]["mean"], 0.65)
    np.testing.assert_allclose(out["MAE"]["max"], 0.8)
    np.testing.assert_allclose(out["iou"]["mean"], 0.815)
    assert out["MAE"]["n"] == 4


def test_last_line_wins(tmp_path):
    p = str(tmp_path / "s.json")
    _write(p, [{"MAE": 1.0}, {"MAE": 0.25}])
    assert load_last_stats(p)["MAE"] == 0.25
