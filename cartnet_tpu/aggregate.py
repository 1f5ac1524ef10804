"""Multi-seed result aggregation CLI.

Equivalent of /root/reference/test_metrics.py / test_metrics_adp.py: read
``results/<name>/<seed>/test/stats.json`` across seeds and print mean/std/
max/min per metric (MAE always; S12/IoU and friends when present).

Usage: python -m cartnet_tpu.aggregate --name CartNet [--seeds 0 1 2 3]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import numpy as np


def load_last_stats(path: str) -> Dict:
    """stats.json is append-per-epoch JSONL; the last line is the final eval."""
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    return json.loads(lines[-1])


def aggregate(name: str, seeds: List[int], results_dir: str = "results",
              split: str = "test") -> Dict[str, Dict[str, float]]:
    rows = []
    for seed in seeds:
        p = os.path.join(results_dir, name, str(seed), split, "stats.json")
        if not os.path.exists(p):
            print(f"warning: missing {p}")
            continue
        rows.append(load_last_stats(p))
    if not rows:
        raise FileNotFoundError(f"no {split} stats for {name} in {results_dir}")
    keys = sorted(set().union(*[r.keys() for r in rows])
                  - {"epoch", "lr", "time_epoch"})
    out = {}
    for k in keys:
        vals = np.array([r[k] for r in rows if k in r], dtype=np.float64)
        out[k] = {"mean": float(vals.mean()), "std": float(vals.std()),
                  "max": float(vals.max()), "min": float(vals.min()),
                  "n": int(len(vals))}
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3])
    ap.add_argument("--results_dir", default="results")
    ap.add_argument("--split", default="test")
    args = ap.parse_args(argv)
    stats = aggregate(args.name, args.seeds, args.results_dir, args.split)
    for k, v in stats.items():
        print(f"{k:<24} mean {v['mean']:.6g}  std {v['std']:.3g}  "
              f"max {v['max']:.6g}  min {v['min']:.6g}  (n={v['n']})")


if __name__ == "__main__":
    main()
