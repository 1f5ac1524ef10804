"""Dataset layer: jarvis split parity, ADP processing, ETL math, lattice."""

import json
import os

import numpy as np
import pytest

from cartnet_tpu.data import csd_etl
from cartnet_tpu.data.adp import (augment_record, process_adp_record,
                                  remove_hydrogens)
from cartnet_tpu.data.jarvis import (atoms_to_record, build_dataset,
                                     filter_by_target, split_123)
from cartnet_tpu.data.lattice import optimize_lattice
from cartnet_tpu.data.pipeline import BatchPipeline, choose_pad_sizes
from cartnet_tpu.data.synthetic import random_crystal


def test_split_123_matches_reference_protocol():
    """Must equal random.seed(123) shuffle with the reference's slicing
    (loader/loader.py:130-141)."""
    import random
    n = 97
    tr, va, te = split_123(n)
    ids = list(np.arange(n))
    random.seed(123)
    random.shuffle(ids)
    n_val = n_test = int(n * 0.1)
    n_train = n - 2 * n_val
    assert tr == ids[:n_train]
    assert va == ids[-(n_val + n_test):-n_test]
    assert te == ids[-n_test:]
    assert sorted(tr + va + te) == list(range(n))


def test_filter_by_target_drops_na():
    data = [{"t": 1.0}, {"t": None}, {"t": "na"}, {"t": float("nan")},
            {"t": 2.5}, {"t": [1.0, 2.0]}]
    dat, targets = filter_by_target(data, "t")
    assert len(dat) == 3
    assert targets[0] == 1.0 and targets[1] == 2.5
    assert isinstance(targets[2], np.ndarray)


def test_atoms_to_record_frac_and_cart():
    atoms_cart = {"lattice_mat": (np.eye(3) * 6).tolist(),
                  "coords": [[0, 0, 0], [3, 0, 0]],
                  "elements": ["Si", "O"], "cartesian": True}
    rec = atoms_to_record(atoms_cart, 1.23, radius=4.0)
    assert rec["z"].tolist() == [14, 8]
    assert rec["y"] == 1.23
    assert len(rec["edge_src"]) > 0
    atoms_frac = dict(atoms_cart, coords=[[0, 0, 0], [0.5, 0, 0]],
                      cartesian=False)
    rec2 = atoms_to_record(atoms_frac, 1.23, radius=4.0)
    np.testing.assert_allclose(rec2["pos"], rec["pos"], atol=1e-6)


def test_build_dataset_from_local_raw(tmp_path):
    """Ingest pipeline end-to-end from a local figshare-style JSON."""
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    entries = []
    for i in range(12):
        n = int(rng.integers(2, 6))
        entries.append({
            "atoms": {"lattice_mat": (np.eye(3) * 5 + rng.normal(0, .1, (3, 3))).tolist(),
                      "coords": rng.uniform(0, 5, (n, 3)).tolist(),
                      "elements": ["Si"] * n, "cartesian": True},
            "formation_energy_peratom": float(rng.normal()) if i != 3 else "na",
        })
    with open(raw / "dft_3d_2021.json", "w") as f:
        json.dump(entries, f)
    tr, va, te = build_dataset("jarvis", "formation_energy_peratom",
                              str(tmp_path))
    assert len(tr) + len(va) + len(te) == 11  # one filtered
    assert all("edge_src" in r for r in tr)
    # cached reload identical
    tr2, va2, te2 = build_dataset("jarvis", "formation_energy_peratom",
                                  str(tmp_path))
    np.testing.assert_array_equal(tr[0]["z"], tr2[0]["z"])
    np.testing.assert_allclose(tr[0]["y"], tr2[0]["y"])


def test_remove_hydrogens_reindexes_edges():
    rec = random_crystal(np.random.default_rng(0), 12, adp=True)
    rec["z"][::3] = 1  # some hydrogens
    out = remove_hydrogens(rec)
    assert (out["z"] != 1).all()
    assert out["edge_src"].max(initial=0) < len(out["z"])
    assert out["edge_dst"].max(initial=0) < len(out["z"])
    assert len(out["cart_dist"]) == len(out["edge_src"])
    assert out["y"].shape[0] == len(out["z"])
    # surviving edges connect the same physical atoms
    keep = rec["z"] != 1
    old2new = np.cumsum(keep) - 1
    ekeep = keep[rec["edge_src"]] & keep[rec["edge_dst"]]
    np.testing.assert_array_equal(out["edge_src"],
                                  old2new[rec["edge_src"][ekeep]])


def test_process_adp_record_standardizes_temperature():
    rec = random_crystal(np.random.default_rng(1), 8, adp=True)
    rec["temperature"] = 300.0
    out = process_adp_record(rec)
    np.testing.assert_allclose(out["temperature"],
                               (300.0 - 192.1785) / 81.2135, rtol=1e-5)
    assert out["temperature_og"] == 300.0


def test_augment_rotates_consistently():
    rec = random_crystal(np.random.default_rng(2), 8, adp=True)
    rng = np.random.default_rng(3)
    out = augment_record(rec, rng)
    # distances preserved; y spectrum preserved (conjugation by rotation)
    np.testing.assert_allclose(
        np.linalg.norm(out["cart_dir"], axis=1),
        np.linalg.norm(rec["cart_dir"], axis=1), atol=1e-5)
    np.testing.assert_allclose(np.linalg.eigvalsh(out["y"]),
                               np.linalg.eigvalsh(rec["y"]), rtol=2e-4,
                               atol=1e-6)


def test_optimize_lattice_properties():
    rng = np.random.default_rng(4)
    cell = np.array([[6.0, 0, 0], [1.0, 5.0, 0], [-2.0, 1.0, 7.0]])
    new, rot = optimize_lattice(cell)
    # right-handed, canonical frame
    assert np.dot(np.cross(new[0], new[1]), new[2]) > 0
    assert abs(new[0][1]) < 1e-9 and abs(new[0][2]) < 1e-9  # a1 || x
    assert abs(new[1][2]) < 1e-9                             # a2 in xy
    # rotation is orthonormal; volume preserved
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(abs(np.linalg.det(new)),
                               abs(np.linalg.det(cell)), rtol=1e-6)


def test_frac_to_cart_matrix_cubic_and_volume():
    m = csd_etl.frac_to_cart_matrix(5, 5, 5, 90, 90, 90)
    np.testing.assert_allclose(m, np.eye(3) * 5, atol=1e-9)
    m2 = csd_etl.frac_to_cart_matrix(5, 6, 7, 80, 95, 100)
    vol = 5 * 6 * 7 * np.sqrt(
        1 - np.cos(np.radians(80)) ** 2 - np.cos(np.radians(95)) ** 2
        - np.cos(np.radians(100)) ** 2
        + 2 * np.cos(np.radians(80)) * np.cos(np.radians(95))
        * np.cos(np.radians(100)))
    np.testing.assert_allclose(abs(np.linalg.det(m2)), vol, rtol=1e-9)


def test_adp_cif_to_cart_identity_cell():
    u = np.array([[0.02, 0.003, 0.001], [0.003, 0.025, 0.002],
                  [0.001, 0.002, 0.018]])
    got = csd_etl.adp_cif_to_cart(u, np.eye(3))
    np.testing.assert_allclose(got, u, atol=1e-12)
    # batched form agrees with single
    got_b = csd_etl.adp_cif_to_cart(u[None], np.diag([5.0, 6.0, 7.0]))
    got_s = csd_etl.adp_cif_to_cart(u, np.diag([5.0, 6.0, 7.0]))
    np.testing.assert_allclose(got_b[0], got_s, rtol=1e-12)


def test_dedup_positions():
    pos = np.array([[0, 0, 0], [1, 1, 1], [0, 0, 0.00001], [2, 2, 2]])
    keep = csd_etl.dedup_positions(pos)
    assert keep.tolist() == [0, 1, 3]


def test_pipeline_shuffle_and_augment_determinism():
    recs = [random_crystal(np.random.default_rng(i), 8, adp=True)
            for i in range(8)]
    p1 = BatchPipeline(recs, 4, shuffle=True, augment=True, seed=7)
    p2 = BatchPipeline(recs, 4, shuffle=True, augment=True, seed=7)
    b1 = list(p1)
    b2 = list(p2)
    assert len(b1) == 2
    np.testing.assert_array_equal(np.asarray(b1[0].z), np.asarray(b2[0].z))
    np.testing.assert_allclose(np.asarray(b1[0].cart_dir),
                               np.asarray(b2[0].cart_dir))
    # second epoch differs (fresh shuffle/rotations)
    b1b = list(p1)
    assert not np.allclose(np.asarray(b1[0].cart_dir),
                           np.asarray(b1b[0].cart_dir))


def test_megnet_bulk_shear_pickle_splits(tmp_path):
    """bulk/shear megnet load PRE-SPLIT pickles with the usable-target filter
    and no seed-123 reshuffle (reference loader/loader.py:44-79)."""
    import pickle
    rng = np.random.default_rng(1)

    def entry(val):
        n = int(rng.integers(2, 5))
        return {"atoms": {"lattice_mat": (np.eye(3) * 5).tolist(),
                          "coords": rng.uniform(0, 5, (n, 3)).tolist(),
                          "elements": ["Si"] * n, "cartesian": True},
                "bulk modulus": val}

    splits = {"train": [entry(float(i)) for i in range(6)] + [entry(None)],
              "val": [entry(10.0), entry(float("nan"))],
              "test": [entry(20.0), entry("na"), entry(21.0)]}
    for sname, entries in splits.items():
        with open(tmp_path / f"bulk_megnet_{sname}.pkl", "wb") as f:
            pickle.dump(entries, f)

    tr, va, te = build_dataset("megnet", "bulk modulus", str(tmp_path))
    assert (len(tr), len(va), len(te)) == (6, 1, 2)  # filtered per split
    # split order preserved (no reshuffle): targets are the values in order
    assert [float(r["y"]) for r in tr] == [0., 1., 2., 3., 4., 5.]
    assert [float(r["y"]) for r in te] == [20.0, 21.0]
    # cached reload identical
    tr2, _, _ = build_dataset("megnet", "bulk modulus", str(tmp_path))
    assert [float(r["y"]) for r in tr2] == [float(r["y"]) for r in tr]
    # missing files give the actionable error
    with pytest.raises(FileNotFoundError, match="figshare"):
        build_dataset("megnet", "shear modulus", str(tmp_path))


def _save_adp_pt(path, rec):
    """Write a reference-format per-refcode .pt (attribute-style graph)."""
    import torch
    from types import SimpleNamespace
    data = SimpleNamespace(
        x=torch.tensor(rec["z"], dtype=torch.long),
        pos=torch.tensor(rec["pos"]),
        cell=torch.tensor(rec["cell"]).reshape(1, 3, 3),
        edge_index=torch.tensor(
            np.stack([rec["edge_src"], rec["edge_dst"]])),
        cart_dist=torch.tensor(rec["cart_dist"]).unsqueeze(-1),
        cart_dir=torch.tensor(rec["cart_dir"]),
        y=torch.tensor(rec["y"]),
        temperature=torch.tensor([rec.get("temperature", 200.0)]))
    torch.save(data, path)


def test_adp_knn_re_edging_matches_radius_graph(tmp_path):
    """Comformer-on-ADP re-edging: ADPDataset(max_neighbors=k) must replace
    the stored edges with radius_graph_pbc(..., k) of the RAW (pre-H-removal)
    graph, and cache like the reference's data_<k>_<r>/ dir
    (dataset/utils.py:456-486, loader/loader.py:24-28)."""
    from cartnet_tpu.data.adp import ADPDataset
    from cartnet_tpu.data.radius_graph import radius_graph_pbc
    rng = np.random.default_rng(3)
    root = tmp_path / "data"
    root.mkdir()
    refcodes = []
    for i in range(3):
        rec = random_crystal(rng, int(rng.integers(6, 12)), adp=True)
        rec["z"][0] = 1  # ensure at least one H so removal matters
        name = f"REF{i:03d}"
        _save_adp_pt(root / f"{name}.pt", rec)
        refcodes.append(name)
    csv = tmp_path / "train_files.csv"
    csv.write_text("\n".join(refcodes) + "\n")

    k, radius = 3, 5.0
    ds = ADPDataset(str(root), str(csv), hydrogens=True, max_neighbors=k,
                    radius=radius)
    for i, name in enumerate(refcodes):
        got = ds.get(i)
        raw = torch_raw = None
        from cartnet_tpu.data.adp import load_pt_raw
        raw = load_pt_raw(str(root / f"{name}.pt"))
        src, dst, dist, cdir = radius_graph_pbc(
            raw["pos"].astype(np.float64), raw["cell"].astype(np.float64),
            radius, k)
        np.testing.assert_array_equal(got["edge_src"], src)
        np.testing.assert_array_equal(got["edge_dst"], dst)
        np.testing.assert_allclose(got["cart_dist"], dist, rtol=1e-6)
        # the cap binds (degeneracy tolerance may keep ties: reference
        # get_max_neighbors_mask, dataset/utils.py:240-360)
        assert len(got["edge_src"]) <= len(raw["edge_src"])
    # cache dir mirrors the reference layout and is reused
    cache = tmp_path / f"data_{k}_{radius}"
    assert cache.is_dir() and len(list(cache.glob("*.npz"))) == 3
    got2 = ds.get(0)
    np.testing.assert_array_equal(got2["edge_src"], ds.get(0)["edge_src"])

    # H-removal composes AFTER re-edging (reference order): no H left, edges
    # re-indexed within the capped edge set
    ds_noh = ADPDataset(str(root), str(csv), hydrogens=False, max_neighbors=k,
                        radius=radius)
    rec_noh = ds_noh.get(0)
    assert (rec_noh["z"] != 1).all()
    assert len(rec_noh["edge_src"]) <= len(ds.get(0)["edge_src"])

    # CartNet path (max_neighbors=None) keeps the stored edges
    ds_plain = ADPDataset(str(root), str(csv), hydrogens=True)
    raw0 = load_pt_raw(str(root / f"{refcodes[0]}.pt"))
    np.testing.assert_array_equal(ds_plain.get(0)["edge_src"],
                                  raw0["edge_src"])


def test_figshare_ingest_end_to_end(tmp_path):
    """The full figshare ingest path (raw JSON -> filter -> seed-123 split ->
    graph build -> npz cache) executed against a pre-placed fixture — the
    code path real runs take when the download cache is hand-populated
    (reference loader/loader.py:84-141 + figshare_dataset.py:50-76)."""
    import json as _json
    from cartnet_tpu.data import jarvis as J
    rng = np.random.default_rng(5)
    entries = []
    for i in range(30):
        n = int(rng.integers(2, 6))
        entries.append({
            "atoms": {
                "lattice_mat": (np.eye(3) * (4.0 + i % 3)).tolist(),
                "coords": (rng.random((n, 3)) * 3.0).tolist(),
                "elements": ["Si"] * n,
                "cartesian": True,
            },
            "formation_energy_peratom": float(rng.normal()),
        })
    # unusable targets must be dropped (loader.py:90-96)
    entries[3]["formation_energy_peratom"] = "na"
    entries[7]["formation_energy_peratom"] = None
    entries[11]["formation_energy_peratom"] = float("nan")
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "dft_3d_2021.json").write_text(_json.dumps(entries))

    tr, va, te = J.build_dataset("jarvis", "formation_energy_peratom",
                                 str(tmp_path))
    usable = 27
    assert len(tr) + len(va) + len(te) == usable
    assert len(va) == int(usable * 0.1) and len(te) == int(usable * 0.1)
    r = tr[0]
    assert r["z"].dtype == np.int32 and (r["z"] == 14).all()
    assert r["cart_dir"].shape == (len(r["edge_src"]), 3)
    assert np.isfinite(r["y"])
    # second call loads the npz cache (no raw re-read) and round-trips
    tr2, _, _ = J.build_dataset("jarvis", "formation_energy_peratom",
                                str(tmp_path))
    np.testing.assert_array_equal(tr2[0]["z"], tr[0]["z"])
    np.testing.assert_allclose(tr2[0]["cart_dist"], tr[0]["cart_dist"])


def test_figshare_ingest_from_zip(tmp_path):
    """A hand-placed <name>.zip is unzipped instead of downloaded — the
    figshare archives ship zipped (figshare_dataset.py download path)."""
    import json as _json
    import zipfile
    from cartnet_tpu.data import jarvis as J
    entries = [{
        "atoms": {"lattice_mat": (np.eye(3) * 4.0).tolist(),
                  "coords": [[0.0, 0.0, 0.0], [1.2, 1.1, 1.3]],
                  "elements": ["C", "O"], "cartesian": True},
        "formation_energy_peratom": -1.5,
    }] * 12
    raw = tmp_path / "raw"
    raw.mkdir()
    with zipfile.ZipFile(raw / "dft_3d_2021.zip", "w") as zf:
        zf.writestr("dft_3d_2021.json", _json.dumps(entries))
    data = J.load_raw("jarvis", str(tmp_path))
    assert len(data) == 12
    assert (raw / "dft_3d_2021.json").exists()  # extracted beside the zip
