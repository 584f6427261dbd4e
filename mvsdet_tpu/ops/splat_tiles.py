"""Tile-binned Gaussian-splat renderer (fast path).

Replaces the reference's CUDA tile rasterizer pipeline
(gs_src/model/decoder/cuda_splatting.py:49-138 → diff-gaussian-
rasterization): project → compute splat radii → bin gaussians into
16x16 pixel tiles with fixed per-tile capacity → composite each tile
with the Pallas kernel (ops/pallas/splat_kernel.py).

The CUDA rasterizer builds variable-length per-tile lists with a global
radix sort; on TPU the equivalent is a fixed-capacity top-k per tile:
gaussians are globally depth-sorted once, each tile keeps its first
`capacity` overlapping gaussians (nearest-first), and the rest are
dropped — exact whenever a tile overlaps at most `capacity` splats,
which the capacity is sized for.  The binning gather is plain XLA, so
autodiff scatters tile gradients back to the global gaussian set for
free; the per-tile composite has a custom VJP (Pallas forward, XLA
rematerialised backward).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mvsdet_tpu.geometry.sh import eval_sh_color
from mvsdet_tpu.ops.pallas.splat_kernel import composite_tiles
from mvsdet_tpu.ops.splat import project_gaussians

TILE = 16


def splat_radii(cov_tri: jnp.ndarray) -> jnp.ndarray:
    """3-sigma splat radius in pixels from the 2D covariance.

    Matches the CUDA rasterizer's eigenvalue bound
    (diff-gaussian-rasterization forward: lambda1 = mid +
    sqrt(max(0.1, mid^2 - det)), radius = ceil(3 sqrt(lambda1))).
    """
    a, b, c = cov_tri[:, 0], cov_tri[:, 1], cov_tri[:, 2]
    mid = 0.5 * (a + c)
    det = a * c - b * b
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    return jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))


def bin_gaussians(mean2d: jnp.ndarray, radius: jnp.ndarray,
                  valid: jnp.ndarray, tiles_y: int, tiles_x: int,
                  capacity: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-capacity per-tile gaussian index lists, nearest-first.

    Inputs must already be globally depth-sorted (ascending z) so that
    "first `capacity` overlapping" == "nearest `capacity`".

    Returns:
      idx: (n_tiles, capacity) int32 indices into the sorted arrays.
      slot_valid: (n_tiles, capacity) bool — False for empty slots.
    """
    g = mean2d.shape[0]
    x0 = jnp.floor((mean2d[:, 0] - radius) / TILE).astype(jnp.int32)
    x1 = jnp.floor((mean2d[:, 0] + radius) / TILE).astype(jnp.int32)
    y0 = jnp.floor((mean2d[:, 1] - radius) / TILE).astype(jnp.int32)
    y1 = jnp.floor((mean2d[:, 1] + radius) / TILE).astype(jnp.int32)
    txs = jnp.arange(tiles_x, dtype=jnp.int32)
    tys = jnp.arange(tiles_y, dtype=jnp.int32)
    mask_x = (txs[None, :] >= x0[:, None]) & (txs[None, :] <= x1[:, None])
    mask_y = (tys[None, :] >= y0[:, None]) & (tys[None, :] <= y1[:, None])
    mask = (mask_y[:, :, None] & mask_x[:, None, :]
            & valid[:, None, None])                       # (G, TY, TX)
    mask = mask.reshape(g, tiles_y * tiles_x).T           # (T, G)
    # first-K true entries per tile in depth order: top_k of -position
    big = jnp.int32(g + 1)
    score = jnp.where(mask, -jnp.arange(g, dtype=jnp.int32)[None, :], -big)
    top, _ = jax.lax.top_k(score, min(capacity, g))       # descending
    idx = -top                                            # ascending position
    slot_valid = idx < g
    idx = jnp.minimum(idx, g - 1)
    if capacity > g:
        pad = capacity - g
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        slot_valid = jnp.pad(slot_valid, ((0, 0), (0, pad)))
    return idx, slot_valid


def render_view_tiled(means: jnp.ndarray, covariances: jnp.ndarray,
                      harmonics: jnp.ndarray, opacities: jnp.ndarray,
                      c2w: jnp.ndarray, intrinsics_norm: jnp.ndarray,
                      image_shape: Tuple[int, int],
                      background: Optional[jnp.ndarray] = None,
                      capacity: int = 1024,
                      near_clip: float = 0.2,
                      value_override: Optional[jnp.ndarray] = None,
                      k_chunk: int = 512) -> jnp.ndarray:
    """Tile-rasterized twin of ops.splat.render_view (same signature +
    `capacity`).  Exact vs the oracle when every tile sees at most
    `capacity` gaussians."""
    h, w = image_shape
    tiles_y = -(-h // TILE)
    tiles_x = -(-w // TILE)
    mean2d, conic, z, valid, cov_tri = project_gaussians(
        means, covariances, c2w, intrinsics_norm, image_shape, near_clip)

    if value_override is None:
        cam_pos = c2w[:3, 3]
        dirs = means - cam_pos
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
        values = eval_sh_color(harmonics, dirs)           # (G, 3)
    else:
        values = value_override
    n_ch = values.shape[-1]
    if background is None:
        background = jnp.zeros((n_ch,), values.dtype)

    order = jnp.argsort(jnp.where(valid, z, jnp.inf))
    mean2d_s = mean2d[order]
    conic_s = conic[order]
    val_s = values[order]
    op_s = jnp.where(valid, opacities, 0.0)[order]
    rad_s = splat_radii(cov_tri)[order]
    valid_s = valid[order]

    idx, slot_valid = bin_gaussians(
        jax.lax.stop_gradient(mean2d_s), jax.lax.stop_gradient(rad_s),
        valid_s, tiles_y, tiles_x, capacity)
    idx = jax.lax.stop_gradient(idx)

    cap = idx.shape[1]
    zero_row = jnp.zeros_like(op_s[idx])
    data = jnp.stack([
        mean2d_s[:, 0][idx], mean2d_s[:, 1][idx],
        conic_s[:, 0][idx], conic_s[:, 1][idx], conic_s[:, 2][idx],
        jnp.where(slot_valid, op_s[idx], 0.0),
        zero_row, zero_row,
    ], axis=1)                                            # (T, 8, cap)
    vals = jnp.swapaxes(val_s[idx], 1, 2)                 # (T, C, cap)

    out = composite_tiles(data, vals, tiles_x, TILE, TILE,
                          min(k_chunk, cap))              # (T, C+1, P)
    out = out.reshape(tiles_y, tiles_x, n_ch + 1, TILE, TILE)
    out = out.transpose(0, 3, 1, 4, 2).reshape(
        tiles_y * TILE, tiles_x * TILE, n_ch + 1)[:h, :w]
    rgb, t_final = out[..., :n_ch], out[..., n_ch:]
    return rgb + t_final * background[None, None, :]


def render_views_tiled(means, covariances, harmonics, opacities, c2ws,
                       intrinsics_norm, image_shape, background=None,
                       capacity: int = 1024) -> jnp.ndarray:
    """Tiled twin of ops.splat.render_views ((T, H, W, 3) output)."""

    def one(args):
        c2w, k = args
        return render_view_tiled(means, covariances, harmonics, opacities,
                                 c2w, k, image_shape, background,
                                 capacity=capacity)

    return jax.lax.map(one, (c2ws, intrinsics_norm))
