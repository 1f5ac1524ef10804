"""Windowed Pallas segment-sum kernel vs numpy oracle (interpreter mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartnet_tpu.data.batching import _windows_ok, collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.ops.pallas.segment_kernels import (C_WINDOW, T_EDGES,
                                                    pallas_shapes_ok,
                                                    segment_sum_sorted_window)


def _mkdata(e_real, n, d, seed=0, max_id_step=2):
    rng = np.random.default_rng(seed)
    e_pad = -(-e_real // T_EDGES) * T_EDGES
    steps = (rng.random(e_real) < 0.3).astype(np.int64)  # avg degree ~3.3
    ids = np.minimum(np.cumsum(steps), n - 1).astype(np.int32)
    ids_eff = np.full(e_pad, n, np.int32)
    ids_eff[:e_real] = ids
    vals = np.zeros((e_pad, d), np.float32)
    vals[:e_real] = rng.normal(size=(e_real, d)).astype(np.float32)
    # pad rows get garbage on purpose: the kernel must drop/spill them
    vals[e_real:] = 1e6
    return vals, ids_eff, e_real


def test_kernel_matches_oracle():
    n, d = 512, 256
    vals, ids_eff, e_real = _mkdata(1900, n, d)
    assert _windows_ok(np.minimum(ids_eff, n - 1), ids_eff < n)
    out = segment_sum_sorted_window(jnp.asarray(vals), jnp.asarray(ids_eff), n,
                                    interpret=True)
    want = np.zeros((n, d), np.float32)
    np.add.at(want, ids_eff[:e_real], vals[:e_real])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-4)


def test_kernel_all_pad_window():
    """A trailing window of only pads must contribute nothing."""
    n, d = 256, 128
    vals, ids_eff, e_real = _mkdata(400, n, d)  # 400 real, 624 pads (2 windows)
    out = segment_sum_sorted_window(jnp.asarray(vals), jnp.asarray(ids_eff), n,
                                    interpret=True)
    want = np.zeros((n, d), np.float32)
    np.add.at(want, ids_eff[:e_real], vals[:e_real])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-4)


def test_windows_ok_detects_span_violation():
    ids = np.zeros(T_EDGES, np.int32)
    ids[-1] = C_WINDOW  # span == C -> violation
    mask = np.ones(T_EDGES, bool)
    assert not _windows_ok(ids, mask)
    ids[-1] = C_WINDOW - 1
    assert _windows_ok(ids, mask)


def test_collate_sets_pallas_flag_and_monotone_pad_ids():
    recs = synthetic_dataset(3, mean_atoms=20, radius=5.0, adp=False, seed=0)
    b = collate(recs, 128, 4096, 4)
    dst = np.asarray(b.edge_dst)
    assert (np.diff(dst) >= 0).all()  # monotone incl. pad tail
    assert bool(b.pallas_seg_ok) in (True, False)
    src_sorted = np.asarray(b.edge_src)[np.asarray(b.edge_src_perm)]
    assert (np.diff(src_sorted) >= 0).all()


def test_shapes_gate():
    assert pallas_shapes_ok(17408, 512, 1024)
    assert not pallas_shapes_ok(17407, 512, 1024)   # not divisible
    assert not pallas_shapes_ok(17408, 200, 1024)   # lane misaligned
    assert not pallas_shapes_ok(17408, 512, 200000)  # VMEM blowout


def test_masked_pallas_value_and_grad_match_xla(monkeypatch):
    """Value AND gradient of the pallas masked segment sum == XLA path."""
    import cartnet_tpu.ops.pallas.segment_kernels as sk
    orig = sk.segment_sum_sorted_window
    monkeypatch.setattr(sk, "segment_sum_sorted_window",
                        lambda v, i, ns: orig(v, i, ns, interpret=True))

    n, d = 256, 128
    vals, ids_eff, e_real = _mkdata(700, n, d, seed=3)
    ids = jnp.asarray(np.minimum(ids_eff, n - 1))
    mask = jnp.asarray(ids_eff < n)
    v = jnp.asarray(vals)

    def loss_pallas(v):
        return jnp.sum(sk.masked_segment_sum_pallas(v, ids, mask, n) ** 2)

    def loss_xla(v):
        m = mask.astype(v.dtype)[:, None]
        return jnp.sum(jax.ops.segment_sum(v * m, ids, num_segments=n) ** 2)

    np.testing.assert_allclose(float(loss_pallas(v)), float(loss_xla(v)),
                               rtol=1e-4)
    gp = jax.grad(loss_pallas)(v)
    gx = jax.grad(loss_xla)(v)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4,
                               atol=1e-4)
