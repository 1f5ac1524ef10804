"""Losses and ADP evaluation metrics (pure jnp, vectorized).

Parity targets in /root/reference/train/metrics.py:
  * compute_loss (:15-28) — masked MAE/MSE means over real elements;
  * get_volume / get_error_volume (:30-58);
  * get_similarity_index S12 (:76-94);
  * compute_3D_IoU via 64^3 Mahalanobis voxelization (:96-180);
  * get_KL between zero-mean Gaussians (:60-74).

All 3x3 linear algebra uses closed forms (ops/linalg3) so everything jits and
vmaps; the IoU voxel grid is evaluated as one batched einsum instead of the
reference's per-matrix meshgrid loop.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from cartnet_tpu.ops.linalg3 import det3, frobenius3, inv3

SMOOTH = 1e-8


def masked_mae_mse(pred, true, mask):
    """Masked elementwise MAE/MSE means.

    pred/true: [..., *] with leading mask-aligned axis; mask: [M] bool.
    Equivalent to the reference's l1_loss/mse_loss over the real (unpadded)
    selection (train/metrics.py:26-28).
    """
    m = mask.astype(jnp.float32)
    m = m.reshape(m.shape + (1,) * (pred.ndim - m.ndim))
    diff = (pred.astype(jnp.float32) - true.astype(jnp.float32)) * m
    count = jnp.maximum(jnp.sum(m) * math.prod(pred.shape[mask.ndim:]), 1.0)
    mae = jnp.sum(jnp.abs(diff)) / count
    mse = jnp.sum(diff * diff) / count
    return mae, mse


def get_volume(u):
    """Ellipsoid volume 4/3 pi sqrt(det U) for [..., 3, 3].

    det clamped at 0: U is SPD by construction (Cholesky head), but the f32
    cofactor det of a near-singular U can land at -1e-12, and sqrt(-0) NaN
    would poison the epoch's masked mean."""
    return (4.0 / 3.0) * jnp.pi * jnp.sqrt(jnp.maximum(det3(u), 0.0))


def get_error_volume(pred, true):
    """|V(pred) - V(true)| / (V(pred)+eps) — reference arg-order quirk included
    (reference names the pred volume ``volume_true``, metrics.py:56-58)."""
    vp = get_volume(pred)
    vt = get_volume(true)
    return jnp.abs(vp - vt) / (vp + SMOOTH)


def get_similarity_index(pred, true):
    """S12 similarity in percent (doi:10.1107/S0108768106020787).

    S12 is scale-invariant — S(aT, aP) == S(T, P) for any a > 0 (both
    det(T⁻¹P⁻¹)^¼ and det(T⁻¹+P⁻¹)^½ scale as a^(-3/2)) — so both matrices
    are first normalized by the true matrix's mean diagonal. The reference
    (train/metrics.py:76-94) evaluates the raw formula, which overflows f32
    when U entries sit well below the ~1e-2 Å² ADP scale (det(T⁻¹+P⁻¹) can
    exceed f32 max); the normalized form is mathematically identical and
    stays finite."""
    scale = 3.0 / jnp.maximum(
        jnp.trace(true, axis1=-2, axis2=-1), 1e-12)[..., None, None]
    pred = pred * scale
    true = true * scale
    # inverse-free algebraic form: det(T⁻¹P⁻¹) = 1/(detT·detP) and
    # det(T⁻¹+P⁻¹) = det(T+P)/(detT·detP), so
    #     S12 = 100·(1 − 2^{3/2}·(detT·detP)^{1/4} / det(T+P)^{1/2})
    # — identical to the reference formula but with no inv3 (whose f32
    # cofactor cancellation on near-rank-deficient untrained predictions
    # produced ±inf/NaN and poisoned masked epoch means). All three dets are
    # of SPD matrices; Minkowski (det(A+B)^{1/3} ≥ detA^{1/3}+detB^{1/3})
    # gives det(T+P) ≥ detT+detP — a valid lower bound that also rescues
    # f32 cancellation in the T+P cofactor det.
    dt = jnp.maximum(det3(true), 1e-30)
    dp = jnp.maximum(det3(pred), 1e-30)
    dsum = jnp.maximum(det3(true + pred), dt + dp)
    num = 2.0 ** 1.5 * (dt * dp) ** 0.25
    return 100.0 * (1.0 - num / dsum ** 0.5)


def get_kl(pred, true):
    """KL(N(0,true) || N(0,pred)) for batched 3x3 SPD (metrics.py:60-74)."""
    ip = inv3(pred)
    tr = jnp.trace(jnp.matmul(ip, true), axis1=-2, axis2=-1)
    logdet = jnp.log(det3(pred) / det3(true))
    return 0.5 * (tr - 3.0 + logdet)


def _safe33(u, mask):
    """Replace pad rows of a [N,3,3] stack with I so det/inv stay finite.

    Pad predictions/targets are garbage/zeros; any NaN/Inf they produce would
    poison masked reductions (NaN * 0 == NaN)."""
    eye = jnp.eye(3, dtype=u.dtype)
    return jnp.where(mask[:, None, None], u, eye)


def adp_stat_sums(pred, true, mask):
    """Masked sums of the per-epoch ADP metrics the reference logs at every
    train/val epoch (volume_percentage_error + similarity_index,
    /root/reference/train/metrics.py:183-238).

    Returns (vol_sum, sim_sum, count) so callers can weight/psum exactly like
    the reference's batch_size-weighted CustomLogger accumulation
    (logger/logger.py:69-89, batch_size == number of target atoms)."""
    p = _safe33(pred.astype(jnp.float32), mask)
    t = _safe33(true.astype(jnp.float32), mask)
    mf = mask.astype(jnp.float32)
    vol = jnp.sum(get_error_volume(p, t) * mf)
    sim = jnp.sum(get_similarity_index(p, t) * mf)
    return vol, sim, jnp.sum(mf)


def masked_iou_sum(pred, true, mask, chunk: int = 128, num_points: int = 64):
    """Masked (sum, count) of the voxelized 3D IoU, chunked over atoms.

    One [N, 64^3] map would be ~GBs at padded batch sizes; lax.map evaluates
    fixed-size [chunk, 64^3] blocks sequentially so peak memory stays at
    chunk * num_points^3 * (f32 + 2 bool). Test-time only (reference runs IoU
    only at test, train/metrics.py:201-214)."""
    n = pred.shape[0]
    pad = (-n) % chunk
    p = _safe33(pred.astype(jnp.float32), mask)
    t = _safe33(true.astype(jnp.float32), mask)
    mf = mask.astype(jnp.float32)
    if pad:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (pad, 3, 3))
        p = jnp.concatenate([p, eye])
        t = jnp.concatenate([t, eye])
        mf = jnp.concatenate([mf, jnp.zeros((pad,), jnp.float32)])
    nc = p.shape[0] // chunk
    p = p.reshape(nc, chunk, 3, 3)
    t = t.reshape(nc, chunk, 3, 3)
    mc = mf.reshape(nc, chunk)

    def body(args):
        pc, tc, m = args
        return jnp.sum(compute_3d_iou(pc, tc, num_points) * m)

    sums = jax.lax.map(body, (p, t, mc))
    return jnp.sum(sums), jnp.sum(mf)


def _ellipsoid_masks(u, num_points: int = 64):
    """Boolean voxel masks of unit-cube ellipsoids, [n, P, P, P].

    Mahalanobis distance xᵀ U⁻¹ x < 1 over a linspace(-1,1) grid — one fused
    einsum for the whole batch (reference builds per-matrix grids,
    metrics.py:114-152).
    """
    g = jnp.linspace(-1.0, 1.0, num_points)
    pts = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"), axis=-1).reshape(-1, 3)
    inv = inv3(u)
    # d2[n, p] = pts[p] @ inv[n] @ pts[p]
    d2 = jnp.einsum("pi,nij,pj->np", pts, inv, pts)
    return (d2 < 1.0).reshape(u.shape[0], num_points, num_points, num_points)


def compute_3d_iou(pred, true, num_points: int = 64):
    """Voxelized ellipsoid IoU in [0,1], per matrix pair (metrics.py:155-180)."""
    np_ = frobenius3(pred)
    nt = frobenius3(true)
    norm = jnp.where(np_ > nt, np_, nt)[..., None, None]
    mp = _ellipsoid_masks(pred / norm, num_points)
    mt = _ellipsoid_masks(true / norm, num_points)
    inter = jnp.sum(mp & mt, axis=(1, 2, 3)).astype(jnp.float32)
    union = jnp.sum(mp | mt, axis=(1, 2, 3)).astype(jnp.float32)
    return (inter + SMOOTH) / (union + SMOOTH)
