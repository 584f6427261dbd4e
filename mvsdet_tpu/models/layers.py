"""Shared flax building blocks.

Channels-last layouts throughout ((N, H, W, C) / (N, D, H, W, C)) so the
channel axis rides TPU lanes; params fp32 with a configurable compute
dtype (bf16 on TPU).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently-frozen statistics and affine params.

    The reference backbone runs BN with ``requires_grad=False`` +
    ``norm_eval=True`` (mvsdet_res50_2x_low_res_depth.py:23-24): stats and
    affine are constants.  Stored in the non-differentiated ``frozen``
    collection so they take no gradient and no optimizer state.
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.variable("frozen", "scale",
                              lambda: jnp.ones((self.features,), jnp.float32))
        bias = self.variable("frozen", "bias",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        mean = self.variable("frozen", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("frozen", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        inv = (scale.value / jnp.sqrt(var.value + self.eps)).astype(self.dtype)
        b = (bias.value - mean.value * scale.value
             / jnp.sqrt(var.value + self.eps)).astype(self.dtype)
        return x * inv + b


class ConvBnReLU(nn.Module):
    """Conv -> BatchNorm -> (ReLU), any spatial rank.

    Mirrors the reference's ConvBnReLU/ConvBnReLU3D blocks
    (mvs_models/module.py:6-52) with live batch statistics during
    training (BN batch = view axis, matching DDP's per-device BN — the
    reference does not sync BN, tools/train.py:30-34).
    """

    features: int
    kernel: Union[int, Tuple[int, ...]] = 3
    strides: Union[int, Tuple[int, ...]] = 1
    relu: bool = True
    dims: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kernel = (self.kernel,) * self.dims if isinstance(self.kernel, int) \
            else self.kernel
        strides = (self.strides,) * self.dims if isinstance(self.strides, int) \
            else self.strides
        x = nn.Conv(self.features, kernel, strides, padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DeconvBnReLU(nn.Module):
    """ConvTranspose (2x upsample) -> BatchNorm -> ReLU.

    Mirrors nn.ConvTranspose3d(k=3, s=2, p=1, output_padding=1) + BN +
    ReLU (mvs_models/mvsnet.py:92-100): exact spatial doubling.
    """

    features: int
    kernel: int = 3
    dims: int = 3
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.ConvTranspose(self.features, (self.kernel,) * self.dims,
                             strides=(2,) * self.dims, padding="SAME",
                             use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x
