"""Camera math: projections, intrinsic scaling, neighbour-view selection.

Pure-jnp re-design of the reference camera handling:
  - projection assembly   (ref: projects/NeRF-Det/nerfdet/mvsdet.py:1124-1156)
  - intrinsic re-scaling  (ref: mvsdet.py:423-428)
  - k-NN neighbour views  (ref: mvsdet.py:43-104)

All functions are batched/vmapped-friendly, fp32, static shapes.
Conventions: ``w2c`` maps world -> camera (the reference's
``lidar2img['extrinsic']`` = inv(axis_align @ lidar2cam), see
scannet_multiview_dataset.py:143-145).  ``intrinsic`` is a 4x4 (or 3x3)
pinhole K at the resolution it was calibrated for.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvsdet_tpu.utils.precision import feinsum


def scale_intrinsics(intrinsic: jnp.ndarray, ratio) -> jnp.ndarray:
    """Scale the first two rows of K by 1/ratio.

    Equivalent to the reference's ``intrinsic[:2] /= ratio``
    (mvsdet.py:426,1139,1146): maps a K calibrated at the original
    resolution onto a feature map ``ratio``x smaller.

    Args:
      intrinsic: (..., 3|4, 3|4) pinhole matrices.
      ratio: scalar or broadcastable array.

    Returns:
      Scaled copy of ``intrinsic``.
    """
    ratio = jnp.asarray(ratio, intrinsic.dtype)
    scale = jnp.ones((intrinsic.shape[-2],), intrinsic.dtype)
    scale = scale.at[:2].set(1.0 / ratio)
    return intrinsic * scale[..., :, None]


def compute_projection(w2c: jnp.ndarray, intrinsic: jnp.ndarray,
                       ratio) -> jnp.ndarray:
    """Per-view world->image projection K[R|t] at feature resolution.

    Equivalent to `MVSDet._compute_projection` (mvsdet.py:1124-1156):
    ``P_i = (K / ratio)[:3,:3] @ E_i[:3]`` giving (N, 3, 4).

    Args:
      w2c: (N, 4, 4) world-to-camera extrinsics.
      intrinsic: (4, 4) shared K or (N, 4, 4) per-view K (ARKit).
      ratio: original-resolution-to-feature-resolution scale factor
        ``ori_h / (img_h / stride)``.

    Returns:
      (N, 3, 4) fp32 projection matrices.
    """
    k = scale_intrinsics(intrinsic, ratio)
    if k.ndim == 2:
        k = jnp.broadcast_to(k[None], (w2c.shape[0],) + k.shape)
    return feinsum("nij,njk->nik", k[:, :3, :3], w2c[:, :3, :4])


def full_projection(w2c: jnp.ndarray, intrinsic: jnp.ndarray) -> jnp.ndarray:
    """4x4 projection ``K @ w2c`` used by the plane sweep.

    Equivalent to `MVSDet.collect_proj`'s ``proj = intr @ w2c``
    (mvsdet.py:259).  ``intrinsic`` must already be at feature resolution.

    Args:
      w2c: (N, 4, 4).
      intrinsic: (4, 4) or (N, 4, 4).

    Returns:
      (N, 4, 4).
    """
    if intrinsic.ndim == 2:
        intrinsic = jnp.broadcast_to(intrinsic[None], w2c.shape)
    return feinsum("nij,njk->nik", intrinsic, w2c)


def world_to_image(points: jnp.ndarray, projection: jnp.ndarray):
    """Project world points through (3,4) projections.

    Args:
      points: (..., 3) world points.
      projection: (3, 4) single projection.

    Returns:
      (xy, z): (..., 2) pixel coordinates and (...,) camera-space depth.
    """
    homo = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    p = feinsum("ij,...j->...i", projection, homo)
    z = p[..., 2]
    xy = p[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-8,
                                jnp.sign(z[..., None]) * 1e-8 + 1e-12,
                                z[..., None])
    return xy, z


def knn_camera_neighbors(positions: jnp.ndarray, k: int,
                         mask_self: bool = True) -> jnp.ndarray:
    """Indices of the k nearest cameras (by center distance) per camera.

    Equivalent to `knn` + `get_nearest_pose_ids(..., 'dist', maskself=True)`
    (mvsdet.py:43-64, 89-93): negative squared euclidean distance, self
    masked to -1e5, top-k by similarity.

    Args:
      positions: (N, 3) camera centers.
      k: neighbours per camera (static).
      mask_self: exclude the camera itself.

    Returns:
      (N, k) int32 neighbour indices.
    """
    sq = jnp.sum(positions**2, axis=-1)
    # -(||a||^2 + ||b||^2 - 2 a.b) = -||a - b||^2
    sim = 2.0 * positions @ positions.T - sq[:, None] - sq[None, :]
    if mask_self:
        n = positions.shape[0]
        sim = sim - jnp.eye(n, dtype=sim.dtype) * 1e5
    _, idx = jax.lax.top_k(sim, k)
    return idx.astype(jnp.int32)


def nearest_pose_ids(tar_c2w: jnp.ndarray, ref_c2w: jnp.ndarray,
                     num_select: int, mask_self: bool = False) -> jnp.ndarray:
    """For each target pose pick the nearest reference poses by camera center.

    Equivalent to `get_nearest_pose_ids` with 'dist' (mvsdet.py:67-104).
    Note the reference clamps ``num_select = min(num_select, num_ref - 1)``;
    here num_select is static and the caller applies the clamp.

    Args:
      tar_c2w: (T, 4, 4) target camera-to-world.
      ref_c2w: (N, 4, 4) reference camera-to-world.
      num_select: k (static).
      mask_self: only meaningful when tar and ref are the same set.

    Returns:
      (T, num_select) int32 indices into the reference set.
    """
    tar = tar_c2w[:, :3, 3]
    ref = ref_c2w[:, :3, 3]
    sq_t = jnp.sum(tar**2, axis=-1)
    sq_r = jnp.sum(ref**2, axis=-1)
    sim = 2.0 * tar @ ref.T - sq_t[:, None] - sq_r[None, :]
    if mask_self:
        t, n = sim.shape
        m = min(t, n)
        sim = sim.at[jnp.arange(m), jnp.arange(m)].add(-1e5)
    _, idx = jax.lax.top_k(sim, num_select)
    return idx.astype(jnp.int32)
