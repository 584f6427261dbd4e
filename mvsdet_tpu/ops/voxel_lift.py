"""Depth-weighted 2D->3D voxel feature lifting.

TPU-native re-design of `backproject_Weigh`
(ref: projects/NeRF-Det/nerfdet/mvsdet.py:1372-1492).  The reference runs
a python loop over views with boolean fancy-indexing per depth
hypothesis; the math is fully independent across views (each loop
iteration only updates row i of `valid`), so here it becomes one
vectorised per-view computation scanned over views (bounded memory, and
exactly the formulation that view-parallel sharding psums over ICI).

Per view i and voxel v (voxel centre p_v):
  (x, y, z) = round(K[R|t]_i p_v)              # nearest-pixel, :1388-1390
  valid0    = in-bounds and z > 0              # :1391
  window_k  = valid0 and |z - d_k(y, x)| < voxel_size_z   # :1407-1408
  valid     = valid0 and any_k window_k        # :1416-1427
  w         = max_k window_k * prob_norm_k(y,x)  # :1411,1422
  contrib   = w * feat_i(y, x)                 # :1459-1460
Aggregated over views: mean = sum_i contrib / (sum_i valid + 1e-8),
zeroed where no view sees the voxel (mvsdet.py:511-515, 681-682).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mvsdet_tpu.utils.precision import feinsum


def _pixel_weights(projection: jnp.ndarray, est_depth: jnp.ndarray,
                   prob_norm: jnp.ndarray, points: jnp.ndarray,
                   voxel_size_z: float, h: int, w: int):
    """One view's (pix, weight, valid) per voxel — everything except the
    (V, C) feature gather (which the Pallas path moves onto the MXU).

    Returns:
      pix: (V,) int32 flat clipped pixel index.
      weight: (V,) max in-window hypothesis probability (0 if invalid).
      valid: (V,) bool.
    """
    homo = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1)
    p = feinsum("ij,vj->vi", projection, homo)                # (V, 3)
    z = p[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    x = jnp.round(p[:, 0] / z_safe).astype(jnp.int32)
    y = jnp.round(p[:, 1] / z_safe).astype(jnp.int32)
    valid0 = (x >= 0) & (y >= 0) & (x < w) & (y < h) & (z > 0)

    pix = jnp.clip(y, 0, h - 1) * w + jnp.clip(x, 0, w - 1)   # (V,)
    # one packed row gather instead of two takes sharing one index set
    # (contiguous 2K-float rows amortise to row DMAs; also shrinks the
    # multi-take-shared-index pattern the TPU backend miscompiles under
    # vmap — see module docstring)
    k = est_depth.shape[-1]
    dp = jnp.concatenate([est_depth.reshape(h * w, k),
                          prob_norm.reshape(h * w, k)], axis=1)
    rows = jnp.take(dp, pix, axis=0)                          # (V, 2K)
    d_k, p_k = rows[:, :k], rows[:, k:]

    window = (valid0[:, None]
              & (z[:, None] > d_k - voxel_size_z)
              & (z[:, None] < d_k + voxel_size_z))            # (V, K)
    valid = jnp.any(window, axis=1)
    weight = jnp.max(jnp.where(window, p_k, 0.0), axis=1)     # (V,)
    return pix, weight, valid


def _lift_single_view(feat: jnp.ndarray, projection: jnp.ndarray,
                      est_depth: jnp.ndarray, prob_norm: jnp.ndarray,
                      points: jnp.ndarray, voxel_size_z: float):
    """One view's weighted voxel contribution.

    Args:
      feat: (H, W, C) feature map (already cropped/masked to valid pixels).
      projection: (3, 4) K[R|t] at feature resolution.
      est_depth: (H, W, K) top-k z-depth hypotheses.
      prob_norm: (H, W, K) hypothesis probabilities, normalised over K.
      points: (V, 3) voxel centres.
      voxel_size_z: z window half-width (reference uses voxel_size[-1]).

    Returns:
      contrib: (V, C) prob-weighted features.
      valid: (V,) bool — in-frustum and inside some depth window.
    """
    h, w, c = feat.shape
    pix, weight, valid = _pixel_weights(projection, est_depth, prob_norm,
                                        points, voxel_size_z, h, w)
    feat_flat = feat.reshape(h * w, c)
    gathered = jnp.take(feat_flat, pix, axis=0)               # (V, C)
    contrib = gathered * weight[:, None]
    return contrib, valid


def lift_features_to_voxels(
    features: jnp.ndarray,
    projections: jnp.ndarray,
    est_depth: jnp.ndarray,
    est_prob: jnp.ndarray,
    points: jnp.ndarray,
    voxel_size_z: float,
    view_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aggregate depth-weighted per-view features into the voxel grid.

    Scans over views (one (V, C) contribution live at a time); under view
    sharding each device scans its local views and the two outputs are
    psum-reduced.

    Args:
      features: (N, H, W, C).
      projections: (N, 3, 4).
      est_depth: (N, H, W, K) top-k z-depths.
      est_prob: (N, H, W, K) hypothesis probabilities (will be normalised
        over K per pixel, matching mvsdet.py:1395-1396).
      points: (V, 3) voxel centres.
      voxel_size_z: z window half-width.
      view_mask: optional (N,) bool; False views contribute nothing
        (static-shape padding of the view axis).

    Returns:
      volume_sum: (V, C) sum of weighted contributions over views.
      valid_count: (V,) float number of views whose depth window contains
        the voxel.  Callers form the mean as
        ``volume_sum / (valid_count + 1e-8)`` zeroed where count == 0
        (mvsdet.py:511-515).
    """
    n = features.shape[0]
    v = points.shape[0]
    c = features.shape[-1]
    prob_norm = est_prob / (jnp.sum(est_prob, axis=-1, keepdims=True) + 1e-12)
    if view_mask is None:
        view_mask = jnp.ones((n,), bool)

    def body(carry, inputs):
        vol, cnt = carry
        feat, proj, d, p, m = inputs
        contrib, valid = _lift_single_view(feat, proj, d, p, points,
                                           voxel_size_z)
        mf = m.astype(vol.dtype)
        # features may arrive bf16 (halves the gather traffic; lossless
        # when they are the backbone's own bf16 output), but the
        # 40-view accumulation always carries fp32
        vol = vol + contrib.astype(vol.dtype) * mf
        cnt = cnt + valid.astype(cnt.dtype) * mf
        return (vol, cnt), None

    init = (jnp.zeros((v, c), jnp.float32), jnp.zeros((v,), jnp.float32))
    (vol, cnt), _ = jax.lax.scan(
        body, init, (features, projections, est_depth, prob_norm, view_mask))
    return vol, cnt


def lift_features_to_voxels_pallas(
    features: jnp.ndarray,
    projections: jnp.ndarray,
    est_depth: jnp.ndarray,
    est_prob: jnp.ndarray,
    points: jnp.ndarray,
    voxel_size_z: float,
    view_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as `lift_features_to_voxels`, with the (V, C)
    feature gather fused into the Pallas MXU one-hot kernel
    (ops/pallas/lift_kernel.py).  The per-view projection / z-window /
    weight math stays in XLA (small tensors) and remains differentiable
    to est_prob through the kernel's custom VJP.
    """
    from mvsdet_tpu.ops.pallas.lift_kernel import weighted_gather_sum

    n, h, w, c = features.shape
    prob_norm = est_prob / (jnp.sum(est_prob, axis=-1, keepdims=True) + 1e-12)

    # Scan, not vmap: on the real-TPU backend the vmapped lowering of
    # this projection + round + z-window composite produced wrongly-
    # fused comparisons — ~3.5% of (view, voxel) window bits flipped
    # with margins far beyond fp32 noise, while the scan lowering
    # matches a float64 host oracle exactly (diagnosed on-chip, round 4;
    # see experiments/lift_profile_tpu.txt).  The scan also matches the
    # XLA lift path's lowering, so both backends agree bit-for-bit on
    # (pix, weight, valid).
    def body(_, xs):
        proj, d, p = xs
        return None, _pixel_weights(proj, d, p, points, voxel_size_z, h, w)

    _, (pix, weight, valid) = jax.lax.scan(
        body, None, (projections, est_depth, prob_norm))
    if view_mask is not None:
        mf = view_mask.astype(weight.dtype)[:, None]
        weight = weight * mf
        valid = valid & view_mask[:, None]
    vol = weighted_gather_sum(features.reshape(n, h * w, c), pix, weight)
    cnt = jnp.sum(valid.astype(jnp.float32), axis=0)
    return vol.astype(features.dtype), cnt


def lift_diagnostics(
    projections: jnp.ndarray,
    est_depth: jnp.ndarray,
    est_prob: jnp.ndarray,
    points: jnp.ndarray,
    voxel_size_z: float,
    gt_depth: jnp.ndarray,
    depth_expect: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GT-depth-assisted lift diagnostics (the reference's debug branch,
    mvsdet.py:1436-1492, surfaced as `weight_gap` / `src_rmse` on each
    prediction, mvsdet.py:1053-1058).

    Per view, every in-frustum voxel gets a "GT validity" bit — is its
    camera z within one voxel_z of the GT depth at its pixel — and the
    gap is the MSE between that bit and the voxel's lifted probability
    weight, averaged over in-frustum voxels then views.  `src_rmse` is
    the MSE between the depth expectation map and GT depth over valid
    pixels (the reference computes MSE despite the name, :1446-1448).

    Args:
      projections: (N, 3, 4); est_depth/est_prob: (N, H, W, K);
      points: (V, 3); gt_depth: (N, H, W) at feature resolution
      (0 = invalid); depth_expect: (N, H, W).

    Returns:
      (weight_gap, src_rmse) scalars.
    """
    prob_norm = est_prob / (jnp.sum(est_prob, axis=-1, keepdims=True) + 1e-12)
    h, w = gt_depth.shape[1:3]

    def one_view(proj, d, p, gt):
        homo = jnp.concatenate([points, jnp.ones_like(points[:, :1])],
                               axis=-1)
        pp = feinsum("ij,vj->vi", proj, homo)
        z = pp[:, 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        x = jnp.round(pp[:, 0] / z_safe).astype(jnp.int32)
        y = jnp.round(pp[:, 1] / z_safe).astype(jnp.int32)
        valid0 = (x >= 0) & (y >= 0) & (x < w) & (y < h) & (z > 0)
        pix = jnp.clip(y, 0, h - 1) * w + jnp.clip(x, 0, w - 1)
        d_k = jnp.take(d.reshape(h * w, -1), pix, axis=0)
        p_k = jnp.take(p.reshape(h * w, -1), pix, axis=0)
        window = (valid0[:, None]
                  & (z[:, None] > d_k - voxel_size_z)
                  & (z[:, None] < d_k + voxel_size_z))
        weight = jnp.max(jnp.where(window, p_k, 0.0), axis=1)
        gt_z = jnp.take(gt.reshape(-1), pix)
        gt_valid = (valid0 & (z > gt_z - voxel_size_z)
                    & (z < gt_z + voxel_size_z)).astype(jnp.float32)
        gap = (jnp.sum(jnp.where(valid0, (gt_valid - weight) ** 2, 0.0))
               / jnp.maximum(jnp.sum(valid0), 1))
        return gap

    gaps = jax.lax.map(lambda args: one_view(*args),
                       (projections, est_depth, prob_norm, gt_depth))
    weight_gap = jnp.mean(gaps)
    mask = gt_depth > 0
    src_rmse = (jnp.sum(jnp.where(mask, (depth_expect - gt_depth) ** 2, 0.0))
                / jnp.maximum(jnp.sum(mask), 1))
    return weight_gap, src_rmse


def finalize_volume(volume_sum: jnp.ndarray,
                    valid_count: jnp.ndarray) -> jnp.ndarray:
    """View-mean with empty voxels zeroed (mvsdet.py:511-515, 681-682)."""
    mean = volume_sum / (valid_count[:, None] + 1e-8)
    return jnp.where(valid_count[:, None] > 0, mean, 0.0)
