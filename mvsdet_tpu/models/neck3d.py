"""Indoor 3D voxel neck: multi-scale residual 3D U-Net (flax).

Equivalent of `IndoorImVoxelNeck` (ref:
mmdet3d/models/necks/imvoxel_neck.py:70-170): 3 scales of residual 3D
blocks (stride-2 downsampling between scales), top-down 2x transposed-
conv fusion, a 3x3x3 out-block per scale.  Returns 3 feature levels,
finest first, all at ``out_channels``.

Channels-last: input (N, nx, ny, nz, C), outputs
[(N, nx, ny, nz, C_out), (N, nx/2, ...), (N, nx/4, ...)].
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mvsdet_tpu.models.layers import ConvBnReLU, DeconvBnReLU

Dtype = Any


class ResModule3D(nn.Module):
    """3D residual block (imvoxel_neck.py:173-220 ResModule)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvBnReLU(self.features, strides=self.stride, dims=3,
                       dtype=self.dtype, name="conv1")(x, train)
        y = ConvBnReLU(self.features, dims=3, relu=False, dtype=self.dtype,
                       name="conv2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = ConvBnReLU(self.features, kernel=1, strides=self.stride,
                           dims=3, relu=False, dtype=self.dtype,
                           name="downsample")(x, train)
        return nn.relu(x + y)


class IndoorImVoxelNeck(nn.Module):
    in_channels: int = 256
    out_channels: int = 128
    n_blocks: Sequence[int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        n_scales = len(self.n_blocks)
        down_outs = []
        n_ch = self.in_channels
        for i in range(n_scales):
            stride = 1 if i == 0 else 2
            if stride != 1:
                n_ch *= 2
            for b in range(self.n_blocks[i]):
                s = stride if b == 0 else 1
                x = ResModule3D(n_ch, s, dtype=self.dtype,
                                name=f"down{i}_block{b}")(x, train)
            down_outs.append(x)
        outs = []
        for i in range(n_scales - 1, -1, -1):
            if i < n_scales - 1:
                x = DeconvBnReLU(x.shape[-1] // 2, kernel=2, dims=3,
                                 dtype=self.dtype,
                                 name=f"up{i + 1}_deconv")(x, train)
                x = ConvBnReLU(x.shape[-1], dims=3, dtype=self.dtype,
                               name=f"up{i + 1}_conv")(x, train)
                x = down_outs[i] + x
            out = ConvBnReLU(self.out_channels, dims=3, dtype=self.dtype,
                             name=f"out{i}")(x, train)
            outs.append(out)
        return outs[::-1]
