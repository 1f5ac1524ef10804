"""Per-epoch ADP metrics in the DEFAULT run (reference
train/metrics.py:183-238): volume_percentage_error + similarity_index at
every train/val epoch, iou added at final test, all batch-weighted by atom
count, landing in stats.json so aggregate.py reproduces the reference's
headline ADP table fields (test_metrics_adp.py:17-43)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartnet_tpu.train import metrics as M


def _spd(rng, n, scale=1.0):
    a = rng.normal(size=(n, 3, 3)) * scale
    return np.einsum("nij,nkj->nik", a, a) + 0.3 * np.eye(3)


def test_adp_stat_sums_match_unmasked_reference_math():
    rng = np.random.default_rng(0)
    pred, true = _spd(rng, 7), _spd(rng, 7)
    # garbage rows beyond the mask must not poison the sums (NaN * 0 == NaN)
    pred_pad = np.concatenate([pred, np.zeros((3, 3, 3))])
    true_pad = np.concatenate([true, np.full((3, 3, 3), np.nan)])
    mask = np.arange(10) < 7
    vol, sim, n = M.adp_stat_sums(jnp.asarray(pred_pad), jnp.asarray(true_pad),
                                  jnp.asarray(mask))
    assert int(n) == 7
    want_vol = np.asarray(M.get_error_volume(jnp.asarray(pred),
                                             jnp.asarray(true))).sum()
    want_sim = np.asarray(M.get_similarity_index(jnp.asarray(pred),
                                                 jnp.asarray(true))).sum()
    np.testing.assert_allclose(float(vol), want_vol, rtol=1e-5)
    np.testing.assert_allclose(float(sim), want_sim, rtol=1e-5)
    assert np.isfinite(float(vol)) and np.isfinite(float(sim))


def test_masked_iou_sum_matches_dense_iou():
    rng = np.random.default_rng(1)
    pred, true = _spd(rng, 5, 0.5), _spd(rng, 5, 0.5)
    pred_pad = np.concatenate([pred, np.zeros((2, 3, 3))])
    true_pad = np.concatenate([true, np.zeros((2, 3, 3))])
    mask = np.arange(7) < 5
    s, n = M.masked_iou_sum(jnp.asarray(pred_pad), jnp.asarray(true_pad),
                            jnp.asarray(mask), chunk=4, num_points=32)
    want = np.asarray(M.compute_3d_iou(jnp.asarray(pred), jnp.asarray(true),
                                       num_points=32)).sum()
    assert int(n) == 5
    np.testing.assert_allclose(float(s), want, rtol=1e-5)


def test_cli_adp_run_writes_headline_table_fields(tmp_path):
    """A default cholesky run's stats.json must carry the reference table
    fields: every epoch has volume_percentage_error + similarity_index; the
    test epoch additionally has iou; params is present (logger/logger.py:42).
    """
    from cartnet_tpu.aggregate import aggregate
    from cartnet_tpu.cli import main
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        main(["--cpu", "--dataset", "synthetic", "--model", "CartNet",
              "--cholesky", "--dim_in", "16", "--dim_rbf", "8",
              "--num_layers", "1", "--epochs", "2", "--batch", "2",
              "--limit", "8", "--name", "adp_metrics", "--seed", "0"])
    finally:
        os.chdir(cwd)
    runs = {}
    for split in ("train", "val", "test"):
        p = tmp_path / "results" / "adp_metrics" / "0" / split / "stats.json"
        with open(p) as f:
            runs[split] = [json.loads(ln) for ln in f.read().splitlines()]
    for split in ("train", "val"):
        for epoch_stats in runs[split]:
            assert np.isfinite(epoch_stats["volume_percentage_error"])
            assert np.isfinite(epoch_stats["similarity_index"])
            assert epoch_stats["params"] > 0
            assert "iou" not in epoch_stats  # test-time only
    final = runs["test"][-1]
    for k in ("MAE", "similarity_index", "iou", "volume_percentage_error"):
        assert np.isfinite(final[k]), k
    assert 0.0 <= final["iou"] <= 1.0

    # aggregate.py reproduces the reference table fields from this run
    agg = aggregate("adp_metrics", [0],
                    results_dir=str(tmp_path / "results"))
    for k in ("MAE", "similarity_index", "iou"):
        assert k in agg and np.isfinite(agg[k]["mean"])
