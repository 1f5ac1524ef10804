"""Analytic scaling-efficiency predictors (scripts/scaling_bench.py):
hand-checked literals + limiting behavior."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.scaling_bench import predict_efficiency, predict_replicated

EPS1, EDGES, NODES, DIM, LAYERS, PARAMS = 8.0e6, 16000, 1536, 256, 4, 2.5e6


def test_single_device_is_unity():
    r = predict_replicated(EPS1, EDGES, NODES, DIM, LAYERS, PARAMS, 1, 1)
    assert r["predicted_efficiency"] == 1.0
    np.testing.assert_allclose(r["predicted_edges_per_sec"], EPS1, rtol=1e-6)


def test_replicated_psum_literal():
    """ep=4, no dp: per-layer psum = 2*(3/4)*N*d*4 bytes each way, fwd+bwd,
    over 90 GB/s: t_ep = 2*2*0.75*1536*256*4/90e9 s; eff = t/(t+4*t_ep)."""
    t_step = EDGES / EPS1
    t_ep = 2.0 * (2.0 * 0.75 * NODES * DIM * 4) / 90e9
    want = t_step / (t_step + LAYERS * t_ep)
    r = predict_replicated(EPS1, EDGES, NODES, DIM, LAYERS, PARAMS, 1, 4)
    np.testing.assert_allclose(r["predicted_efficiency"], want, atol=1e-4)


def test_halo_fully_hidden_when_comm_small():
    """Comm time below the interior-overlap budget -> zero exposed cost."""
    r = predict_efficiency(EPS1, EDGES, NODES, DIM, LAYERS, PARAMS,
                           halo_bytes_per_layer=100_000,
                           boundary_frac=0.3, hidden_frac=0.6, dp=1, ep=8)
    assert r["predicted_efficiency"] == 1.0
    assert r["t_ep_exposed_ms_per_layer"] == 0.0


def test_halo_exposed_when_comm_large():
    """Comm beyond the hidden budget is charged; efficiency drops below 1
    and decreases monotonically with byte volume."""
    r1 = predict_efficiency(EPS1, EDGES, NODES, DIM, LAYERS, PARAMS,
                            halo_bytes_per_layer=100_000_000,
                            boundary_frac=0.3, hidden_frac=0.1, dp=1, ep=8)
    r2 = predict_efficiency(EPS1, EDGES, NODES, DIM, LAYERS, PARAMS,
                            halo_bytes_per_layer=200_000_000,
                            boundary_frac=0.3, hidden_frac=0.1, dp=1, ep=8)
    assert r1["predicted_efficiency"] < 1.0
    assert r2["predicted_efficiency"] < r1["predicted_efficiency"]


def test_dp_allreduce_amortized_by_accum():
    """Grad all-reduce charges per optimizer step: accum=16 costs 16x less
    than accum=1; 2-host goes over DCN and costs more than 1-host ICI."""
    r16 = predict_replicated(EPS1, EDGES, NODES, DIM, LAYERS, PARAMS, 8, 1,
                             hosts=2, accum=16)
    r1 = predict_replicated(EPS1, EDGES, NODES, DIM, LAYERS, PARAMS, 8, 1,
                            hosts=2, accum=1)
    np.testing.assert_allclose(r1["t_dp_ms"], 16 * r16["t_dp_ms"], rtol=1e-6)
    ici = predict_replicated(EPS1, EDGES, NODES, DIM, LAYERS, PARAMS, 8, 1,
                             hosts=1, accum=16)
    assert ici["t_dp_ms"] < r16["t_dp_ms"]
