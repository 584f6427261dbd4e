"""NeRF MLPs for the legacy NeRF-Det supervision branch (flax).

Equivalents of projects/NeRF-Det/nerfdet/nerf_utils/nerf_mlp.py:
  - SinusoidalEncoder (ref :202-230)
  - skip-connected MLP + sigma/rgb heads (`NerfMLP`, ref :125-200)
  - `VanillaNeRF` wrapper with positional/view encoders (ref :232-277)

NeRF-Det instantiates VanillaNeRF(net_depth=4, net_width=256,
skip_layer=3, feature_dim=nerf_feature_dim + 6, ...) (nerfdet.py:97-103).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def sinusoidal_encode(x: jnp.ndarray, min_deg: int, max_deg: int,
                      use_identity: bool = True) -> jnp.ndarray:
    """NeRF positional encoding (nerf_mlp.py:219-230)."""
    if max_deg == min_deg:
        return x
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)], x.dtype)
    xb = (x[..., None, :] * scales[:, None]).reshape(
        x.shape[:-1] + ((max_deg - min_deg) * x.shape[-1],))
    latent = jnp.sin(jnp.concatenate([xb, xb + 0.5 * math.pi], axis=-1))
    if use_identity:
        latent = jnp.concatenate([x, latent], axis=-1)
    return latent


def encode_dim(x_dim: int, min_deg: int, max_deg: int,
               use_identity: bool = True) -> int:
    return (int(use_identity) + (max_deg - min_deg) * 2) * x_dim


class SkipMLP(nn.Module):
    """ReLU MLP with a skip connection at ``skip_layer`` (nerf_mlp.py:13-113)."""

    net_depth: int = 8
    net_width: int = 256
    skip_layer: Optional[int] = 4
    output_dim: int = 0           # 0 => return hidden features
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inputs = x
        for i in range(self.net_depth):
            x = nn.Dense(self.net_width, dtype=self.dtype,
                         name=f"hidden{i}")(x)
            x = nn.relu(x)
            if (self.skip_layer is not None and i % self.skip_layer == 0
                    and i > 0):
                x = jnp.concatenate([x, inputs], axis=-1)
        if self.output_dim > 0:
            x = nn.Dense(self.output_dim, dtype=self.dtype, name="output")(x)
        return x


class VanillaNeRF(nn.Module):
    """Positional-encoded NeRF MLP returning (rgb, sigma).

    Matches `VanillaNeRF` (nerf_mlp.py:232-277): pos-enc deg 0-10 on
    points, view-enc deg 0-4 on ray dirs, sigma = relu(head(hidden)),
    rgb = sigmoid(rgb_mlp([bottleneck, view_enc])).
    """

    net_depth: int = 4
    net_width: int = 256
    skip_layer: int = 3
    feature_dim: int = 0
    net_depth_condition: int = 1
    net_width_condition: int = 128
    dtype: Dtype = jnp.float32

    def setup(self):
        self.base = SkipMLP(net_depth=self.net_depth,
                            net_width=self.net_width,
                            skip_layer=self.skip_layer, dtype=self.dtype,
                            name="base")
        self.sigma_layer = nn.Dense(1, dtype=self.dtype, name="sigma")
        self.bottleneck = nn.Dense(self.net_width, dtype=self.dtype,
                                   name="bottleneck")
        self.rgb_mlp = SkipMLP(net_depth=self.net_depth_condition,
                               net_width=self.net_width_condition,
                               skip_layer=None, output_dim=3,
                               dtype=self.dtype, name="rgb")

    def _hidden(self, points: jnp.ndarray,
                features: Optional[jnp.ndarray]) -> jnp.ndarray:
        x = sinusoidal_encode(points, 0, 10)
        if features is not None:
            x = jnp.concatenate([x, features], axis=-1)
        return self.base(x)

    def query_density(self, points: jnp.ndarray,
                      features: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """relu'd raw sigma (nerf_mlp.py:267-270)."""
        h = self._hidden(points, features)
        return nn.relu(self.sigma_layer(h))

    def __call__(self, points: jnp.ndarray,
                 view_dirs: Optional[jnp.ndarray] = None,
                 features: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self._hidden(points, features)
        sigma = nn.relu(self.sigma_layer(h))
        if view_dirs is not None:
            cond = sinusoidal_encode(view_dirs, 0, 4)
            if cond.ndim < h.ndim:
                cond = jnp.broadcast_to(cond[..., None, :],
                                        h.shape[:-1] + (cond.shape[-1],))
            b = self.bottleneck(h)
            rgb = self.rgb_mlp(jnp.concatenate([b, cond], axis=-1))
        else:
            rgb = self.rgb_mlp(h)
        return nn.sigmoid(rgb), sigma
