"""Plane-sweep cost volume: homography warp + variance aggregation.

TPU-native re-design of the reference's MVSNet-style sweep
(ref: projects/NeRF-Det/nerfdet/mvsdet.py:438-467 and
mvs_models/module.py:105-146):

  * the per-neighbour python loop + cuDNN grid_sample becomes one batched
    jnp computation vmapped over (view, neighbour);
  * the running sum / square-sum accumulators become a closed-form
    variance over the (k+1) member volumes;
  * layout is channels-last (N, D, H, W, C) so the trailing C=256 axis
    maps onto TPU lanes.

The XLA gather path here is the correctness reference; the fast path on
real TPU hardware is `mvsdet_tpu.ops.plane_sweep_mxu`, which rewrites
the homography warp as two shear matmuls so it rides the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvsdet_tpu.utils.precision import feinsum

from mvsdet_tpu.ops.sampling import bilinear_sample, torch_grid_sample_skew


def homography_coords(rel_proj: jnp.ndarray, depth_values: jnp.ndarray,
                      height: int, width: int) -> jnp.ndarray:
    """Source-view pixel coordinates for every (depth, ref-pixel).

    Matches module.py:115-140: p = R @ (x, y, 1) * d + t, xy = p[:2]/p[2],
    with rel_proj = src_proj @ inv(ref_proj).

    Args:
      rel_proj: (4, 4) relative projection.
      depth_values: (D,) plane depths.
      height, width: ref feature-map size.

    Returns:
      (D, H, W, 2) source pixel coordinates (x, y).
    """
    rot = rel_proj[:3, :3]
    trans = rel_proj[:3, 3]
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xs)
    xyz = jnp.stack([xs, ys, ones], axis=-1)                  # (H, W, 3)
    rot_xyz = feinsum("ij,hwj->hwi", rot, xyz)             # (H, W, 3)
    proj = (rot_xyz[None] * depth_values[:, None, None, None]
            + trans[None, None, None, :])                     # (D, H, W, 3)
    z = proj[..., 2:3]
    # Reference divides without guarding; guard only against exact zero to
    # avoid NaNs (the resulting huge coords fall outside and sample zero).
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return proj[..., :2] / z_safe


def homography_warp(src_feat: jnp.ndarray, rel_proj: jnp.ndarray,
                    depth_values: jnp.ndarray,
                    torch_compat: bool = False) -> jnp.ndarray:
    """Warp one source feature map onto the ref view's depth planes.

    Equivalent to `homo_warping` (module.py:105-146) for a single
    (ref, src) pair, channels-last.

    Args:
      src_feat: (H, W, C) source-view features.
      rel_proj: (4, 4) src_proj @ inv(ref_proj).
      depth_values: (D,).
      torch_compat: reproduce the reference's align_corners skew exactly
        (see `torch_grid_sample_skew`); default samples at the corrected
        pixel coordinates.

    Returns:
      (D, H, W, C) warped volume (zeros outside the source image).
    """
    h, w, _ = src_feat.shape
    coords = homography_coords(rel_proj, depth_values, h, w)
    if torch_compat:
        coords = torch_grid_sample_skew(coords, h, w)
    return bilinear_sample(src_feat, coords)


def _scan_warp(nei_feat: jnp.ndarray, rel: jnp.ndarray,
               depth_values: jnp.ndarray) -> jnp.ndarray:
    """Warp (N, k) (feature, rel-proj) pairs, scanned one pair at a time.

    Scan, not vmap: the real-TPU backend miscompiles batched
    multi-gather composites whose indices are computed in-graph (the
    bilinear sampler's 4 taps share one computed coordinate set) — see
    the on-chip diagnosis in ops/voxel_lift.py.  This is the gather
    ORACLE path (the model default is the MXU shear warp), so being
    trustworthy beats being fast.
    """
    n, k = nei_feat.shape[:2]
    flat_feat = nei_feat.reshape((n * k,) + nei_feat.shape[2:])
    flat_rel = rel.reshape(n * k, 4, 4)

    def body(_, xs):
        feat, r = xs
        return None, homography_warp(feat, r, depth_values)

    _, warped = jax.lax.scan(body, None, (flat_feat, flat_rel))
    return warped.reshape((n, k) + warped.shape[1:])


def plane_sweep_variance(features: jnp.ndarray, proj: jnp.ndarray,
                         neighbor_ids: jnp.ndarray,
                         depth_values: jnp.ndarray) -> jnp.ndarray:
    """Variance cost volume over {ref, k neighbours} for every view.

    Matches the aggregation at mvsdet.py:438-467:
      volume_variance = E[f^2] - E[f]^2 over the (k+1) member volumes,
    where member 0 is the ref feature broadcast over depth and members
    1..k are the warped neighbours.

    Args:
      features: (N, H, W, C) per-view feature maps.
      proj: (N, 4, 4) full projections K @ w2c at feature resolution.
      neighbor_ids: (N, k) int32 plane-sweep partner indices.
      depth_values: (D,) plane depths.

    Returns:
      (N, D, H, W, C) variance volumes.
    """
    n, h, w, c = features.shape
    k = neighbor_ids.shape[1]
    inv_ref = jnp.linalg.inv(proj)                            # (N, 4, 4)
    nei_proj = proj[neighbor_ids]                             # (N, k, 4, 4)
    rel = feinsum("nkij,njl->nkil", nei_proj, inv_ref)     # (N, k, 4, 4)
    nei_feat = features[neighbor_ids]                         # (N, k, H, W, C)

    warped = _scan_warp(nei_feat, rel, depth_values)          # (N, k, D, H, W, C)

    ref = features[:, None, :, :, :]                          # (N,1,H,W,C)
    s = ref + jnp.sum(warped, axis=1)                         # (N, D?, ...)
    # ref broadcasts over D through warped's D axis
    sq = ref**2 + jnp.sum(warped**2, axis=1)
    inv_m = 1.0 / (k + 1)
    mean = s * inv_m
    return sq * inv_m - mean**2


def plane_sweep_variance_for_refs(features: jnp.ndarray, proj: jnp.ndarray,
                                  ref_ids: jnp.ndarray,
                                  neighbor_ids: jnp.ndarray,
                                  depth_values: jnp.ndarray) -> jnp.ndarray:
    """Variance volumes for a subset of reference views.

    Memory-bounded building block: the full (N, D, H, W, C) volume at
    ScanNet scale is ~2.5 GB fp32, so the MVSDet model scans view-chunks
    through sweep + cost-regularisation with only one chunk's volume live
    (the reference instead mutates accumulators in-place at eval,
    mvsdet.py:460-465).

    Args:
      features: (N, H, W, C) ALL views' feature maps (neighbour pool).
      proj: (N, 4, 4) full projections for all views.
      ref_ids: (M,) int indices of the reference views in this chunk.
      neighbor_ids: (M, k) neighbour indices (into the full view set).
      depth_values: (D,).

    Returns:
      (M, D, H, W, C) variance volumes for the chunk.
    """
    k = neighbor_ids.shape[1]
    ref_proj = proj[ref_ids]                                  # (M, 4, 4)
    inv_ref = jnp.linalg.inv(ref_proj)
    nei_proj = proj[neighbor_ids]                             # (M, k, 4, 4)
    rel = feinsum("mkij,mjl->mkil", nei_proj, inv_ref)
    nei_feat = features[neighbor_ids]                         # (M, k, H, W, C)

    warped = _scan_warp(nei_feat, rel, depth_values)          # (M, k, D, H, W, C)

    ref = features[ref_ids][:, None, :, :, :]                 # (M, 1, H, W, C)
    s = ref + jnp.sum(warped, axis=1)
    sq = ref**2 + jnp.sum(warped**2, axis=1)
    inv_m = 1.0 / (k + 1)
    mean = s * inv_m
    return sq * inv_m - mean**2
