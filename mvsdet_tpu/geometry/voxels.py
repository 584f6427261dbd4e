"""Voxel-grid and depth-plane generation.

Pure-jnp equivalents of:
  - ``get_points``   (ref: projects/NeRF-Det/nerfdet/mvsdet.py:1316-1327 and
                      nerfdet_head.py:21-32)
  - depth plane set  (ref: mvsdet.py:222-226)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def voxel_points(n_voxels: Sequence[int], voxel_size: Sequence[float],
                 origin: jnp.ndarray) -> jnp.ndarray:
    """Voxel-centre world coordinates.

    Matches `get_points` (mvsdet.py:1316-1327): grid index * voxel_size +
    (origin - n_voxels/2 * voxel_size).  NOTE the reference centres are at
    integer grid indices (corner-based), not index+0.5.

    Args:
      n_voxels: (nx, ny, nz) static ints.
      voxel_size: (sx, sy, sz) metres.
      origin: (3,) scene origin (point-cloud centre, possibly jittered).

    Returns:
      (3, nx, ny, nz) fp32 world coordinates.
    """
    nv = jnp.asarray(n_voxels, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)
    grids = jnp.meshgrid(*[jnp.arange(n, dtype=jnp.float32) for n in n_voxels],
                         indexing="ij")
    pts = jnp.stack(grids)  # (3, nx, ny, nz)
    new_origin = origin - nv / 2.0 * vs
    return pts * vs.reshape(3, 1, 1, 1) + new_origin.reshape(3, 1, 1, 1)


def multiscale_voxel_points(featmap_sizes: Sequence[Tuple[int, int, int]],
                            base_voxel_size: Sequence[float],
                            origin: jnp.ndarray):
    """Per-level anchor points for the detection head.

    Matches `NerfDetHead._get_points` (nerfdet_head.py:409-420): level i
    uses voxel_size * 2**i around the same origin.

    Returns:
      list of (Ni, 3) point arrays, one per level.
    """
    out = []
    for i, fs in enumerate(featmap_sizes):
        vs = [s * (2**i) for s in base_voxel_size]
        pts = voxel_points(fs, vs, origin)          # (3, nx, ny, nz)
        out.append(pts.reshape(3, -1).T)            # (N, 3)
    return out


def depth_plane_values(near: float, far: float, num_planes: int) -> jnp.ndarray:
    """Fronto-parallel sweep plane depths.

    Matches mvsdet.py:222-226: ``arange(near, far, (far-near)/D)`` — D
    planes starting at ``near``, spacing ``interval``, excluding ``far``.

    Returns:
      (num_planes,) fp32 z-depths.
    """
    interval = (far - near) / num_planes
    return near + interval * jnp.arange(num_planes, dtype=jnp.float32)
