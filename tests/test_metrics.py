"""ADP metric parity vs independent torch oracles of the reference formulas."""

import numpy as np
import torch

import jax.numpy as jnp

from cartnet_tpu.train import metrics as M


def _spd(rng, n, scale=1.0):
    m = rng.normal(size=(n, 3, 3)) * scale
    return (m @ m.transpose(0, 2, 1) + 0.3 * np.eye(3)).astype(np.float32)


def test_masked_mae_mse():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(6, 3, 3)).astype(np.float32)
    true = rng.normal(size=(6, 3, 3)).astype(np.float32)
    mask = np.array([1, 1, 1, 1, 0, 0], bool)
    mae, mse = M.masked_mae_mse(jnp.asarray(pred), jnp.asarray(true),
                                jnp.asarray(mask))
    want_mae = torch.nn.L1Loss()(torch.tensor(pred[:4]), torch.tensor(true[:4]))
    want_mse = torch.nn.MSELoss()(torch.tensor(pred[:4]), torch.tensor(true[:4]))
    np.testing.assert_allclose(float(mae), float(want_mae), rtol=1e-6)
    np.testing.assert_allclose(float(mse), float(want_mse), rtol=1e-6)


def test_volume_and_error_volume():
    rng = np.random.default_rng(1)
    pred, true = _spd(rng, 7), _spd(rng, 7)
    v = np.asarray(M.get_volume(jnp.asarray(pred)))
    want_v = (4 / 3) * np.pi * np.sqrt(np.linalg.det(pred))
    np.testing.assert_allclose(v, want_v, rtol=1e-5)
    # reference formula incl. its pred/true naming quirk (metrics.py:56-58):
    # err = |V(pred) - V(true)| / (V(pred) + eps)
    err = np.asarray(M.get_error_volume(jnp.asarray(pred), jnp.asarray(true)))
    vp, vt = want_v, (4 / 3) * np.pi * np.sqrt(np.linalg.det(true))
    np.testing.assert_allclose(err, np.abs(vp - vt) / (vp + 1e-8), rtol=1e-4)


def test_similarity_index_oracle():
    rng = np.random.default_rng(2)
    pred, true = _spd(rng, 9), _spd(rng, 9)
    got = np.asarray(M.get_similarity_index(jnp.asarray(pred), jnp.asarray(true)))
    tp, tt = torch.tensor(pred, dtype=torch.float64), torch.tensor(true, dtype=torch.float64)
    num = 2 ** 1.5 * torch.linalg.det(torch.linalg.inv(tt) @ torch.linalg.inv(tp)) ** 0.25
    den = torch.linalg.det(torch.linalg.inv(tt) + torch.linalg.inv(tp)) ** 0.5
    want = (100 * (1 - num / den)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    # identical matrices -> S12 == 0
    same = np.asarray(M.get_similarity_index(jnp.asarray(pred), jnp.asarray(pred)))
    np.testing.assert_allclose(same, 0.0, atol=1e-3)


def test_kl_zero_for_identical():
    rng = np.random.default_rng(3)
    a = _spd(rng, 5)
    kl = np.asarray(M.get_kl(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(kl, 0.0, atol=1e-4)
    b = _spd(rng, 5)
    assert (np.asarray(M.get_kl(jnp.asarray(b), jnp.asarray(a))) > -1e-5).all()


def test_3d_iou_against_torch_oracle():
    rng = np.random.default_rng(4)
    pred, true = _spd(rng, 3, 0.5), _spd(rng, 3, 0.5)
    got = np.asarray(M.compute_3d_iou(jnp.asarray(pred), jnp.asarray(true)))

    # independent torch oracle of metrics.py:96-180 (64^3 voxel IoU)
    def masks(cov):
        g = torch.linspace(-1, 1, 64)
        xg, yg, zg = torch.meshgrid(g, g, g, indexing="ij")
        pts = torch.stack((xg, yg, zg), dim=-1).reshape(-1, 3).double()
        inv = torch.linalg.inv(torch.tensor(cov).double())
        d2 = torch.einsum("pi,nij,pj->np", pts, inv, pts)
        return (torch.sqrt(torch.clamp(d2, min=0)) < 1).reshape(len(cov), 64, 64, 64)

    npred = np.linalg.norm(pred, axis=(1, 2))
    ntrue = np.linalg.norm(true, axis=(1, 2))
    norm = np.maximum(npred, ntrue)[:, None, None]
    mp, mt = masks(pred / norm), masks(true / norm)
    inter = (mp & mt).float().sum((1, 2, 3))
    union = (mp | mt).float().sum((1, 2, 3))
    want = ((inter + 1e-8) / (union + 1e-8)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3)
    # identical -> IoU 1
    one = np.asarray(M.compute_3d_iou(jnp.asarray(pred), jnp.asarray(pred)))
    np.testing.assert_allclose(one, 1.0, atol=1e-6)
