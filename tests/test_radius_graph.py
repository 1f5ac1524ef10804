"""radius_graph_pbc vs brute-force oracle + cap semantics."""

import numpy as np

from cartnet_tpu.data.radius_graph import (brute_force_radius_graph,
                                           radius_graph_pbc)


def _edge_set(src, dst, dist):
    return {(int(s), int(d), round(float(x), 4)) for s, d, x in zip(src, dst, dist)}


def test_matches_brute_force_cubic():
    rng = np.random.default_rng(0)
    cell = np.eye(3) * 4.0
    pos = rng.uniform(0, 4.0, (6, 3))
    src, dst, dist, cdir = radius_graph_pbc(pos, cell, 5.0)
    bsrc, bdst, bdist, bdir = brute_force_radius_graph(pos, cell, 5.0, rep=3)
    assert _edge_set(src, dst, dist) == _edge_set(bsrc, bdst, bdist)


def test_matches_brute_force_triclinic():
    rng = np.random.default_rng(1)
    cell = np.array([[5.0, 0, 0], [1.2, 4.4, 0], [-0.7, 0.9, 6.1]])
    pos = rng.uniform(0, 1, (5, 3)) @ cell
    src, dst, dist, cdir = radius_graph_pbc(pos, cell, 4.0)
    bsrc, bdst, bdist, _ = brute_force_radius_graph(pos, cell, 4.0, rep=3)
    assert _edge_set(src, dst, dist) == _edge_set(bsrc, bdst, bdist)


def test_direction_is_dst_minus_imaged_src_unit():
    cell = np.eye(3) * 10.0
    pos = np.array([[0.0, 0, 0], [3.0, 0, 0]])
    src, dst, dist, cdir = radius_graph_pbc(pos, cell, 4.0)
    # only the direct pair (no images within 4A of a 10A cell interior pair)
    assert len(src) == 2
    for s, d, dd, v in zip(src, dst, dist, cdir):
        want = (pos[d] - pos[s]) / np.linalg.norm(pos[d] - pos[s])
        np.testing.assert_allclose(v, want, atol=1e-6)
        np.testing.assert_allclose(dd, 3.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(cdir, axis=1), 1.0, atol=1e-6)


def test_self_image_edges_exist():
    # a single atom in a small cell sees its own periodic images
    cell = np.eye(3) * 3.0
    pos = np.zeros((1, 3))
    src, dst, dist, _ = radius_graph_pbc(pos, cell, 3.5)
    assert len(src) >= 6  # 6 face neighbors at 3.0
    assert (dist >= 2.99).all()


def test_max_neighbors_soft_cap():
    rng = np.random.default_rng(2)
    cell = np.eye(3) * 6.0
    pos = rng.uniform(0, 6.0, (20, 3))
    src_u, dst_u, dist_u, _ = radius_graph_pbc(pos, cell, 5.0, None)
    src_c, dst_c, dist_c, _ = radius_graph_pbc(pos, cell, 5.0, 5)
    counts = np.bincount(dst_c, minlength=20)
    # soft cap: at most max_n plus degeneracy ties within 0.01 of sq-dist
    assert counts.max() >= 1
    for a in range(20):
        d_all = np.sort(dist_u[dst_u == a] ** 2)
        if len(d_all) > 5:
            cutoff = d_all[5] + 0.01
            want = (d_all <= cutoff).sum()
            assert counts[a] == want
    # capped edges are a subset of uncapped
    su = _edge_set(src_u, dst_u, dist_u)
    sc = _edge_set(src_c, dst_c, dist_c)
    assert sc <= su


def test_uncapped_when_under_threshold():
    rng = np.random.default_rng(3)
    cell = np.eye(3) * 8.0
    pos = rng.uniform(0, 8.0, (4, 3))
    a = radius_graph_pbc(pos, cell, 3.0, None)
    b = radius_graph_pbc(pos, cell, 3.0, 100)
    assert _edge_set(a[0], a[1], a[2]) == _edge_set(b[0], b[1], b[2])
