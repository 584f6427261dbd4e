"""Ray and image-grid math.

Pure-jnp equivalents of:
  - ``sample_image_grid``  (ref: gs_src/geometry/projection.py:117-138)
  - ``get_world_rays``     (ref: gs_src/geometry/projection.py:91-114)
  - per-pixel depth scale  (ref: mvsdet.py:1158-1218, 1272-1313)
  - DTU-style ray dirs     (ref: multiview_pipeline.py:10-22)
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from mvsdet_tpu.utils.precision import feinsum


def sample_image_grid(shape: Tuple[int, int], dtype=jnp.float32):
    """Normalised (0,1) pixel-centre coordinates and integer indices.

    Matches gs_src/geometry/projection.py:117-138: coordinate order is
    (x, y) with x along width; centres at (idx + 0.5)/len.

    Returns:
      xy: (H, W, 2) fp coordinates in (0,1), xy order.
      ij: (H, W, 2) int indices, (row, col) order.
    """
    h, w = shape
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    ij = jnp.stack(jnp.meshgrid(rows, cols, indexing="ij"), axis=-1)
    ys = (rows.astype(dtype) + 0.5) / h
    xs = (cols.astype(dtype) + 0.5) / w
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    xy = jnp.stack([xg, yg], axis=-1)
    return xy, ij


def unproject(coords: jnp.ndarray, z: jnp.ndarray,
              intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Unproject 2D coordinates at depth z through inv(K).

    Matches gs_src/geometry/projection.py:74-88 (coordinates are in the
    K's pixel units — normalised if K is normalised).
    """
    homo = jnp.concatenate([coords, jnp.ones_like(coords[..., :1])], axis=-1)
    dirs = feinsum("...ij,...j->...i", jnp.linalg.inv(intrinsics), homo)
    return dirs * z[..., None]


def get_world_rays(coords: jnp.ndarray, c2w: jnp.ndarray,
                   intrinsics: jnp.ndarray):
    """World-space ray origins/directions for image coordinates.

    Matches gs_src/geometry/projection.py:91-114: camera ray through
    inv(K), L2-normalised, rotated to world by c2w; origins = camera
    center.

    Args:
      coords: (..., 2) coordinates in the intrinsics' units.
      c2w: (..., 4, 4) camera-to-world.
      intrinsics: (..., 3, 3).

    Returns:
      (origins, directions), both (..., 3); directions unit-norm.
    """
    d_cam = unproject(coords, jnp.ones(coords.shape[:-1], coords.dtype),
                      intrinsics)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    d_world = feinsum("...ij,...j->...i", c2w[..., :3, :3], d_cam)
    origins = jnp.broadcast_to(c2w[..., :3, 3], d_world.shape)
    return origins, d_world


def depth_scale_map(height: int, width: int,
                    feat_intrinsic: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel z-depth -> ray-depth conversion factor.

    Matches `MVSDet.compute_depth_scale` (mvsdet.py:1158-1187): the z
    component of the unit camera ray through each pixel (identity pose).
    ray_depth = z_depth / scale.

    Args:
      height, width: feature-map size.
      feat_intrinsic: (3, 3) or (4, 4) K at feature resolution, or
        (N, 3, 3)/(N, 4, 4) per-view (ARKit,
        `compute_depth_scale_MultiIntrin` mvsdet.py:1189-1218).

    Returns:
      (H*W, 1) scale if K is single, else (N, H*W, 1).
    """
    k = feat_intrinsic[..., :3, :3]
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=k.dtype),
                          jnp.arange(width, dtype=k.dtype), indexing="ij")
    # reference uses integer pixel coordinates (not +0.5) here
    # (mvsdet.py:1171-1175 builds uv from arange directly)
    uv = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)  # (HW, 2)
    if k.ndim == 3:
        uv = jnp.broadcast_to(uv[None], (k.shape[0],) + uv.shape)
        k = k[:, None]  # broadcast K against the pixel axis
    d = unproject(uv, jnp.ones(uv.shape[:-1], k.dtype), k)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d[..., 2:3]


def pixel_ray_dirs(pixelcoords: jnp.ndarray, intrinsic: jnp.ndarray,
                   rot_c2w: jnp.ndarray) -> jnp.ndarray:
    """DTU-style world ray directions for target-view pixels.

    Matches `get_dtu_raydir` (multiview_pipeline.py:10-22): camera dirs
    ((x-cx)/fx, (y-cy)/fy, 1), normalised, rotated by camrotc2w.

    Args:
      pixelcoords: (..., 2) (x, y) pixel coordinates.
      intrinsic: (3, 3) or (4, 4) K.
      rot_c2w: (3, 3) camera-to-world rotation.

    Returns:
      (..., 3) unit world-space ray directions.
    """
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    x = (pixelcoords[..., 0] - cx) / fx
    y = (pixelcoords[..., 1] - cy) / fy
    d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return feinsum("ij,...j->...i", rot_c2w, d)
