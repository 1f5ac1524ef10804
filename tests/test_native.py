"""Native C++ radius-graph builder: build, parity with numpy, speed."""

import time

import numpy as np
import pytest

from cartnet_tpu.data.radius_graph import radius_graph_pbc
from cartnet_tpu.native import get_native


@pytest.fixture(scope="module")
def native():
    mod = get_native()
    if mod is None:
        pytest.skip("native toolchain unavailable")
    return mod


def _rand(n, seed=0, a=6.0):
    rng = np.random.default_rng(seed)
    cell = np.eye(3) * a + rng.uniform(-0.5, 0.5, (3, 3)) * (1 - np.eye(3))
    pos = rng.uniform(0, 1, (n, 3)) @ cell
    return pos, cell


@pytest.mark.parametrize("n,radius,cap", [(7, 5.0, None), (16, 4.0, None),
                                          (20, 5.0, 6), (1, 3.5, None)])
def test_native_matches_numpy_exactly(native, n, radius, cap):
    pos, cell = _rand(n, seed=n)
    s1, d1, t1, r1 = radius_graph_pbc(pos, cell, radius, cap, backend="numpy")
    s2, d2, t2, r2 = radius_graph_pbc(pos, cell, radius, cap, backend="native")
    assert len(s1) == len(s2)
    np.testing.assert_array_equal(s1, s2)  # identical edge ORDER too
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(t1, t2, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(r1, r2, rtol=1e-5, atol=1e-6)


def test_native_is_faster_on_adp_scale(native):
    pos, cell = _rand(194, seed=1, a=18.0)
    t0 = time.perf_counter()
    radius_graph_pbc(pos, cell, 5.0, backend="numpy")
    t_np = time.perf_counter() - t0
    radius_graph_pbc(pos, cell, 5.0, backend="native")  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        radius_graph_pbc(pos, cell, 5.0, backend="native")
    t_nat = (time.perf_counter() - t0) / 5
    assert t_nat < t_np, (t_nat, t_np)


def test_auto_backend_works():
    pos, cell = _rand(10, seed=2)
    s, d, t, r = radius_graph_pbc(pos, cell, 4.0)
    assert len(s) > 0
    np.testing.assert_allclose(np.linalg.norm(r, axis=1), 1.0, atol=1e-5)
