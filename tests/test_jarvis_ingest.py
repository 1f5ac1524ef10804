"""Figshare ingest hardening: real-schema sample fixture, seed-123 split
parity with pinned literals, archive integrity checking, resume logic."""

import json
import os
import random
import zipfile

import numpy as np
import pytest

from cartnet_tpu.data import jarvis as J

SAMPLE = os.path.join(os.path.dirname(__file__), "fixtures",
                      "jarvis_sample.json")


@pytest.fixture(scope="module")
def sample():
    with open(SAMPLE) as f:
        return json.load(f)


def test_sample_is_real_schema(sample):
    """The committed fixture mirrors the dft_3d_2021 payload layout
    (jarvis-tools dft_3d records; reference figshare_dataset.py:53-68)."""
    assert len(sample) == 100
    r = sample[0]
    for k in ("jid", "formula", "atoms", "formation_energy_peratom",
              "optb88vdw_bandgap", "mbj_bandgap", "ehull"):
        assert k in r
    a = r["atoms"]
    for k in ("lattice_mat", "coords", "elements", "abc", "angles",
              "cartesian", "props"):
        assert k in a
    assert np.asarray(a["lattice_mat"]).shape == (3, 3)
    assert len(a["coords"]) == len(a["elements"])
    # missing targets use the reference's "na" sentinel somewhere in the file
    assert any(x["mbj_bandgap"] == "na" for x in sample)


def test_filter_and_split_literals(sample):
    """Pinned split: filter_by_target + seed-123 shuffle on the sample must
    reproduce these frozen literals (protocol: loader.py:130-141)."""
    dat, targets = J.filter_by_target(sample, "formation_energy_peratom")
    assert len(dat) == 100
    tr, va, te = J.split_123(len(dat))
    assert (len(tr), len(va), len(te)) == (80, 10, 10)
    assert list(map(int, tr[:6])) == [87, 29, 63, 50, 84, 93]
    # targets with "na" rows dropped
    dat_m, _ = J.filter_by_target(sample, "mbj_bandgap")
    assert len(dat_m) == 62
    tr_m, va_m, te_m = J.split_123(len(dat_m))
    assert (len(tr_m), len(va_m), len(te_m)) == (50, 6, 6)
    assert list(map(int, tr_m[:6])) == [22, 56, 30, 31, 25, 38]


def test_split_matches_reference_protocol_inline(sample):
    """split_123 == the reference's literal protocol, re-executed here with
    the stdlib alone (bitwise: CPython's Mersenne shuffle is deterministic)."""
    n = 88
    ids = list(range(n))
    random.seed(123)
    random.shuffle(ids)
    n_val = n_test = int(n * 0.1)
    n_train = n - n_val - n_test
    tr, va, te = J.split_123(n)
    assert list(map(int, tr)) == ids[:n_train]
    assert list(map(int, va)) == ids[-(n_val + n_test):-n_test]
    assert list(map(int, te)) == ids[-n_test:]


def test_end_to_end_sample_ingest(tmp_path, sample):
    """Full build_dataset against the sample placed as the raw JSON: filter,
    split, frac->cart graph build."""
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "dft_3d_2021.json").write_text(json.dumps(sample))
    tr, va, te = J.build_dataset("jarvis", "formation_energy_peratom",
                                 str(tmp_path), 5.0, -1)
    assert (len(tr), len(va), len(te)) == (80, 10, 10)
    r = tr[0]
    assert r["edge_src"].shape == r["edge_dst"].shape
    assert np.isfinite(r["cart_dist"]).all()
    assert isinstance(r["y"], float)


def test_verify_archive_crc_and_sha(tmp_path, monkeypatch):
    zp = tmp_path / "dft_3d_2021.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("d.json", json.dumps([{"a": 1}]))
    # no pin: crc-only
    assert J.verify_archive("dft_3d_2021", str(zp)) == "crc-only"
    # correct pin via env
    good = J._sha256(str(zp))
    monkeypatch.setenv("CARTNET_FIGSHARE_SHA256_DFT_3D_2021", good)
    assert J.verify_archive("dft_3d_2021", str(zp)) == "sha256-ok"
    # wrong pin: hard failure
    monkeypatch.setenv("CARTNET_FIGSHARE_SHA256_DFT_3D_2021", "0" * 64)
    with pytest.raises(IOError, match="checksum mismatch"):
        J.verify_archive("dft_3d_2021", str(zp))
    # corrupt zip: CRC failure
    monkeypatch.delenv("CARTNET_FIGSHARE_SHA256_DFT_3D_2021")
    data = bytearray(zp.read_bytes())
    # member payload starts right after the 30-byte local header + the
    # 6-byte "d.json" name — flip a payload byte so the stored CRC fails
    data[40] ^= 0xFF
    bad = tmp_path / "bad.zip"
    bad.write_bytes(bytes(data))
    with pytest.raises((IOError, zipfile.BadZipFile)):
        J.verify_archive("dft_3d_2021", str(bad))


def test_fetch_resume_promotes_completed_part(tmp_path, monkeypatch):
    """A .part file at full length + a 416 response promotes to dest
    without re-downloading."""
    import urllib.error
    dest = tmp_path / "x.zip"
    part = tmp_path / "x.zip.part"
    part.write_bytes(b"PAYLOAD")

    def fake_urlopen(req, timeout=0):
        raise urllib.error.HTTPError(req.full_url, 416, "range", {}, None)

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    J._fetch_with_resume("http://example.invalid/x.zip", str(dest))
    assert dest.read_bytes() == b"PAYLOAD"
    assert not part.exists()


def test_fetch_resume_appends_from_offset(tmp_path, monkeypatch):
    """Range request resumes at the .part offset and validates total size."""
    dest = tmp_path / "y.zip"
    part = tmp_path / "y.zip.part"
    part.write_bytes(b"0123")
    seen = {}

    class Resp:
        status = 206
        headers = {"Content-Length": "4"}
        _chunks = [b"4567"]

        def read(self, n):
            return self._chunks.pop() if self._chunks else b""

    def fake_urlopen(req, timeout=0):
        seen["range"] = req.get_header("Range")
        return Resp()

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    J._fetch_with_resume("http://example.invalid/y.zip", str(dest))
    assert seen["range"] == "bytes=4-"
    assert dest.read_bytes() == b"01234567"
