"""Generate tests/fixtures/jarvis_sample.json — a 100-record sample in the
REAL jarvis dft_3d_2021 figshare schema (hand-captured field layout from
jarvis-tools' dft_3d records: jid / formula / spg / atoms{lattice_mat,
coords, elements, abc, angles, cartesian, props} / per-target scalars with
"na" sentinels for missing values). Drives the split-parity and ingest tests
without the 800 MB download. Deterministic; rerunning reproduces the file."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "jarvis_sample.json")

ELEMENTS = ["Si", "O", "Al", "Ga", "As", "N", "C", "Ti", "Zn", "Se", "Mg",
            "Cu", "Fe", "S"]


def main():
    rng = np.random.default_rng(2026)
    records = []
    for i in range(100):
        n = int(rng.integers(2, 12))
        a = float(3.0 + rng.uniform(0, 4))
        lat = (np.eye(3) * a
               + rng.uniform(-0.3, 0.3, (3, 3)) * (1 - np.eye(3)))
        frac = rng.uniform(0, 1, (n, 3))
        elems = [ELEMENTS[int(k)] for k in rng.integers(0, len(ELEMENTS), n)]
        abc = [float(np.linalg.norm(lat[r])) for r in range(3)]

        def ang(u, v):
            c = float(np.dot(lat[u], lat[v])
                      / (np.linalg.norm(lat[u]) * np.linalg.norm(lat[v])))
            return float(np.degrees(np.arccos(np.clip(c, -1, 1))))

        rec = {
            "jid": f"JVASP-{1000 + i}",
            "spg_number": int(rng.integers(1, 231)),
            "spg_symbol": "P1",
            "formula": "".join(sorted(set(elems))),
            "func": "OptB88vdW",
            "elements": sorted(set(elems)),
            "atoms": {
                "lattice_mat": lat.tolist(),
                "coords": frac.tolist(),
                "elements": elems,
                "abc": abc,
                "angles": [ang(1, 2), ang(0, 2), ang(0, 1)],
                "cartesian": False,
                "props": [""] * n,
            },
            # the real payload marks missing targets with the string "na"
            "formation_energy_peratom": round(float(rng.normal(-1.5, 1.0)), 5),
            "optb88vdw_total_energy": round(float(rng.normal(-8, 3)), 5),
            "optb88vdw_bandgap": (round(float(abs(rng.normal(1, 1))), 4)
                                  if rng.random() > 0.1 else "na"),
            "mbj_bandgap": (round(float(abs(rng.normal(1.5, 1))), 4)
                            if rng.random() > 0.4 else "na"),
            "ehull": (round(float(abs(rng.normal(0.1, 0.1))), 5)
                      if rng.random() > 0.15 else "na"),
            "magmom_outcar": round(float(abs(rng.normal(0, 1))), 4),
            "density": round(float(rng.uniform(2, 8)), 3),
        }
        records.append(rec)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(records, f)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
