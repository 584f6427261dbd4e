"""Pixel-aligned Gaussian parameter head + adapter.

TPU-native equivalents of:
  - `to_gaussians` MLP      (ref: projects/NeRF-Det/nerfdet/mvsdet.py:210-216)
  - `GaussianAdapter`       (ref: gs_src/model/encoder/common/gaussian_adapter.py:32-119)

Raw per-pixel vectors become world-space Gaussians: sigmoid-ranged
scales x depth x intrinsic multiplier, normalised quaternion ->
covariance rotated to world, SH masked (DC-biased init) and rotated to
world, means = ray origin + dir * ray-depth.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.struct
import flax.linen as nn
import jax.numpy as jnp

from mvsdet_tpu.config import GaussianAdapterConfig
from mvsdet_tpu.geometry.rays import get_world_rays
from mvsdet_tpu.geometry.sh import rotate_sh
from mvsdet_tpu.geometry.transforms import build_covariance
from mvsdet_tpu.utils.precision import feinsum

Dtype = Any


@flax.struct.dataclass
class Gaussians:
    """World-space Gaussian set (ref: gs_src/model/types.py:7).

    Registered as a pytree (flax.struct) so it can cross jit
    boundaries — plain dataclasses are invalid jit outputs.
    """

    means: jnp.ndarray        # (..., 3)
    covariances: jnp.ndarray  # (..., 3, 3)
    harmonics: jnp.ndarray    # (..., 3, d_sh)
    opacities: jnp.ndarray    # (...)


class ToGaussians(nn.Module):
    """ReLU -> Linear projection to raw gaussian params (mvsdet.py:210-216).

    in: (..., d_feature [+1 depth][+3 rgb]);
    out: (..., num_surfaces * (2 + d_in)) — 2 xy-offset + adapter input.
    """

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(x)
        return nn.Dense(self.out_features, dtype=self.dtype,
                        name="proj")(x)


def sh_mask(cfg: GaussianAdapterConfig) -> jnp.ndarray:
    """DC-biased SH coefficient mask (gaussian_adapter.py:42-48)."""
    m = jnp.ones((cfg.d_sh,), jnp.float32)
    for degree in range(1, cfg.sh_degree + 1):
        m = m.at[degree**2:(degree + 1) ** 2].set(0.1 * 0.25**degree)
    return m


def scale_multiplier(intrinsics: jnp.ndarray, pixel_size: jnp.ndarray,
                     multiplier: float = 0.1) -> jnp.ndarray:
    """Intrinsic-dependent scale unit (gaussian_adapter.py:100-111).

    0.1 * sum(inv(K[:2,:2]) @ pixel_size) — roughly the world-space size
    of `multiplier` pixels at unit depth.

    Args:
      intrinsics: (..., 3, 3) normalised K.
      pixel_size: (2,) = (1/w, 1/h).

    Returns:
      (...) multiplier.
    """
    k2 = intrinsics[..., :2, :2]
    inv = jnp.linalg.inv(k2)
    xy = multiplier * feinsum("...ij,j->...i", inv, pixel_size)
    return jnp.sum(xy, axis=-1)


def adapt_gaussians(
    c2w: jnp.ndarray,
    intrinsics: jnp.ndarray,
    coordinates: jnp.ndarray,
    depths: jnp.ndarray,
    opacities: jnp.ndarray,
    raw: jnp.ndarray,
    image_shape: Tuple[int, int],
    cfg: GaussianAdapterConfig,
    eps: float = 1e-8,
) -> Gaussians:
    """Raw params -> world Gaussians (`GaussianAdapter.forward`, :50-98).

    Args:
      c2w: (V, 4, 4) camera-to-world extrinsics.
      intrinsics: (V, 3, 3) normalised intrinsics.
      coordinates: (V, R, 2) image coordinates in (0,1) incl. offsets.
      depths: (V, R) ray depths.
      opacities: (V, R) in [0, 1].
      raw: (V, R, d_in) = 3 scale + 4 quat + 3*d_sh SH.
      image_shape: (h, w) of the feature grid.
      cfg: adapter config.

    Returns:
      Gaussians with leading shape (V, R).
    """
    h, w = image_shape
    scales, rotations, sh = jnp.split(raw, [3, 7], axis=-1)

    s_min, s_max = cfg.gaussian_scale_min, cfg.gaussian_scale_max
    scales = s_min + (s_max - s_min) * nn.sigmoid(scales)
    pixel_size = jnp.asarray([1.0 / w, 1.0 / h], jnp.float32)
    mult = scale_multiplier(intrinsics, pixel_size)           # (V,)
    scales = scales * depths[..., None] * mult[:, None, None]

    rotations = rotations / (
        jnp.linalg.norm(rotations, axis=-1, keepdims=True) + eps)

    sh = sh.reshape(sh.shape[:-1] + (3, cfg.d_sh)) * sh_mask(cfg)

    cov = build_covariance(scales, rotations)                 # (V, R, 3, 3)
    rot_c2w = c2w[:, :3, :3]                                  # (V, 3, 3)
    cov = feinsum("vij,vrjk,vlk->vril", rot_c2w, cov, rot_c2w)

    origins, dirs = get_world_rays(coordinates, c2w[:, None], intrinsics[:, None])
    means = origins + dirs * depths[..., None]

    harmonics = rotate_sh(sh, rot_c2w[:, None, None, :, :])   # (V, R, 3, d_sh)
    return Gaussians(means=means, covariances=cov, harmonics=harmonics,
                     opacities=opacities)
