"""Ray sampling, multi-view feature aggregation, and volume rendering.

TPU-native equivalents of the legacy NeRF-Det rendering stack
(projects/NeRF-Det/nerfdet/nerf_utils/render_ray.py and projection.py):

  - stratified / inverse-depth ray sampling         (render_ray.py:110-167)
  - hierarchical PDF inversion `sample_pdf`         (:60-107)
  - alpha compositing `raw2outputs` with the repo's
    interval-free sigma2alpha                        (:170-226)
  - multi-view point projection + bilinear feature
    sampling + masked mean/var pooling (`Projector`) (projection.py:9-140,
    render_ray.py:52-58)

All fixed shapes, explicit PRNG keys, vmappable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mvsdet_tpu.ops.sampling import bilinear_sample
from mvsdet_tpu.utils.precision import feinsum


def sample_along_rays(key: Optional[jax.Array], ray_o: jnp.ndarray,
                      ray_d: jnp.ndarray, near: float, far: float,
                      n_samples: int, inv_uniform: bool = False,
                      det: bool = False):
    """Stratified samples along rays (render_ray.py:110-167).

    Args:
      key: PRNG key (required unless det).
      ray_o/ray_d: (R, 3).

    Returns:
      pts (R, S, 3), z_vals (R, S).
    """
    r = ray_o.shape[0]
    if inv_uniform:
        inv = jnp.linspace(1.0 / near, 1.0 / far, n_samples)
        z = 1.0 / inv
    else:
        z = jnp.linspace(near, far, n_samples)
    z_vals = jnp.broadcast_to(z, (r, n_samples))
    if not det:
        mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
        t = jax.random.uniform(key, (r, n_samples))
        z_vals = lower + (upper - lower) * t
    pts = ray_o[:, None, :] + z_vals[..., None] * ray_d[:, None, :]
    return pts, z_vals


def sample_pdf(key: Optional[jax.Array], bins: jnp.ndarray,
               weights: jnp.ndarray, n_samples: int,
               det: bool = False) -> jnp.ndarray:
    """Inverse-CDF sampling for hierarchical NeRF (render_ray.py:60-107).

    Args:
      bins: (R, M); weights: (R, M).

    Returns:
      (R, n_samples) sample positions.
    """
    r, m = weights.shape
    w = weights + 1e-5
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros((r, 1)), cdf], axis=-1)  # (R, M+1)
    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples), (r, n_samples))
    else:
        u = jax.random.uniform(key, (r, n_samples))
    above = jnp.sum((u[..., None] >= cdf[:, None, :m]).astype(jnp.int32),
                    axis=-1)                                  # (R, S)
    below = jnp.maximum(above - 1, 0)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below, m - 1), axis=-1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above, m - 1), axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def raw2outputs(rgb: jnp.ndarray, sigma: jnp.ndarray, z_vals: jnp.ndarray,
                white_bkgd: bool = False):
    """Composite raw NeRF outputs (render_ray.py:170-226).

    Uses the repo's interval-free alpha: alpha = 1 - exp(-sigma).

    Args:
      rgb: (R, S, 3); sigma: (R, S); z_vals: (R, S).

    Returns:
      dict(rgb (R, 3), depth (R,), weights (R, S)).
    """
    alpha = 1.0 - jnp.exp(-sigma)
    t = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    t = jnp.concatenate([jnp.ones_like(t[:, :1]), t[:, :-1]], axis=-1)
    weights = alpha * t
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - jnp.sum(weights, axis=-1, keepdims=True))
    depth = (jnp.sum(weights * z_vals, axis=-1)
             / (jnp.sum(weights, axis=-1) + 1e-8))
    depth = jnp.clip(depth, jnp.min(z_vals), jnp.max(z_vals))
    return dict(rgb=rgb_map, depth=depth, weights=weights)


def project_to_views(points: jnp.ndarray, w2c: jnp.ndarray,
                     intrinsic: jnp.ndarray):
    """Project world points into every source view.

    Matches `Projector.compute_projections` (projection.py:28-48):
    pixels via K @ w2c, z clamped at 1e-8, in-front mask.

    Args:
      points: (P, 3); w2c: (V, 4, 4); intrinsic: (4, 4) or (V, 4, 4).

    Returns:
      pix (V, P, 2), in_front (V, P).
    """
    if intrinsic.ndim == 2:
        intrinsic = jnp.broadcast_to(intrinsic[None], w2c.shape)
    proj = feinsum("vij,vjk->vik", intrinsic, w2c)            # (V, 4, 4)
    homo = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1)
    p = feinsum("vij,pj->vpi", proj, homo)                    # (V, P, 4)
    z = jnp.maximum(p[..., 2:3], 1e-8)
    pix = jnp.clip(p[..., :2] / z, -1e6, 1e6)
    return pix, p[..., 2] > 0


def sample_views_at_points(points: jnp.ndarray, images: jnp.ndarray,
                           features: Optional[jnp.ndarray],
                           w2c: jnp.ndarray, intrinsic: jnp.ndarray):
    """Sample per-view RGB(+features) at projected points.

    Matches `Projector.compute` (projection.py:74-140): bilinear sample
    of images (and stride-matched feature maps) at image-resolution
    pixel locations; mask = in-bounds AND in-front.

    Args:
      points: (P, 3).
      images: (V, H, W, 3) images in [0,1].
      features: optional (V, h, w, C) (h = H/stride).
      w2c: (V, 4, 4); intrinsic: (4, 4) at image resolution.

    Returns:
      sampled: (P, V, 3[+C]); mask: (P, V) float.
    """
    v, h_img, w_img = images.shape[:3]
    pix, in_front = project_to_views(points, w2c, intrinsic)  # (V, P, 2)
    # scan, not vmap, over views: the real-TPU backend miscompiles
    # batched multi-gather composites whose indices are produced
    # in-graph (two gathers sharing one computed coordinate set — the
    # exact shape of this code); see ops/voxel_lift.py for the on-chip
    # diagnosis.  The scan lowering matches the host oracle.
    if features is not None:
        stride = h_img // features.shape[1]

        def body(_, xs):
            img, ft, px = xs
            return None, jnp.concatenate(
                [bilinear_sample(img, px), bilinear_sample(ft, px / stride)],
                axis=-1)

        _, out = jax.lax.scan(body, None, (images, features, pix))
    else:
        def body(_, xs):
            img, px = xs
            return None, bilinear_sample(img, px)

        _, out = jax.lax.scan(body, None, (images, pix))
    inbound = ((pix[..., 0] >= 0) & (pix[..., 0] <= w_img - 1)
               & (pix[..., 1] >= 0) & (pix[..., 1] <= h_img - 1))
    mask = (inbound & in_front).astype(out.dtype)             # (V, P)
    return jnp.moveaxis(out, 0, 1), mask.T


def masked_mean_var(feat: jnp.ndarray, mask: jnp.ndarray):
    """Masked mean and exp(-var) pooling over views
    (`compute_mask_points`, render_ray.py:52-58).

    Args:
      feat: (P, V, C); mask: (P, V).

    Returns:
      mean (P, C), var (P, C) with var already exp-negated.
    """
    w = mask / (jnp.sum(mask, axis=1, keepdims=True) + 1e-8)
    mean = jnp.sum(feat * w[..., None], axis=1)
    var = jnp.sum((feat - mean[:, None, :]) ** 2 * w[..., None], axis=1)
    return mean, jnp.exp(-var)


def volume_sample_trilinear(volume: jnp.ndarray, points: jnp.ndarray,
                            aabb_min, aabb_max):
    """Trilinear sample of a voxel volume at world points, border padding.

    Matches `volume_sampling` (render_ray.py:15-31, grid_sample
    align_corners=True, padding border); also returns the inside-aabb
    mask.

    Args:
      volume: (nx, ny, nz, C); points: (P, 3).

    Returns:
      (P, C) samples, (P,) bool inside mask.
    """
    aabb_min = jnp.asarray(aabb_min, jnp.float32)
    aabb_max = jnp.asarray(aabb_max, jnp.float32)
    nx, ny, nz, c = volume.shape
    norm = (points - aabb_min) / (aabb_max - aabb_min)        # 0..1
    inside = jnp.all((norm > 0) & (norm < 1), axis=-1)
    sizes = jnp.asarray([nx, ny, nz], jnp.float32)
    # align_corners=True: 0 -> 0, 1 -> n-1
    idx = jnp.clip(norm, 0.0, 1.0) * (sizes - 1)
    i0 = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0,
                  jnp.asarray([nx - 2, ny - 2, nz - 2]))
    frac = idx - i0

    def corner(dx, dy, dz):
        w = ((frac[:, 0] if dx else 1 - frac[:, 0])
             * (frac[:, 1] if dy else 1 - frac[:, 1])
             * (frac[:, 2] if dz else 1 - frac[:, 2]))
        vals = volume[i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz]
        return vals * w[:, None]

    out = sum(corner(dx, dy, dz)
              for dx in (0, 1) for dy in (0, 1) for dz in (0, 1))
    return out, inside
