"""Cost-volume regularisation 3D U-Net (flax).

Equivalent of `CostRegNet_3DGS` (ref:
projects/NeRF-Det/nerfdet/mvs_models/mvsnet.py:73-113): 2-down/2-up 3D
U-Net over the (D, H, W) variance volume, BN+ReLU, emitting 2 channels —
depth cost (softmaxed over D by the caller) and per-plane offset
(sigmoided by the caller, mvsdet.py:470-475).

Channels-last: input (N, D, H, W, C=256), output (N, D, H, W, 2).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mvsdet_tpu.models.layers import ConvBnReLU, DeconvBnReLU

Dtype = Any


class CostRegNet(nn.Module):
    in_channels: int = 256
    base: int = 64
    # GroupNorm by default: scan-safe when the view axis is chunked (the
    # reference's own GN variant: mvs_models/mvsnet.py:116).  "batch" is
    # the reference flagship's BN — validated weight-for-weight against
    # the actual reference net in tests/test_torch_parity.py, but under
    # the chunked scan its running stats go stale and eval collapses
    # (on-chip A/B: experiments/costreg_norm_ab.md), so it is the
    # parity/porting mode, not the training default.
    norm: str = "group"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b = self.base
        conv0 = ConvBnReLU(b, dims=3, norm=self.norm, dtype=self.dtype,
                           name="conv0")(x, train)
        d1 = ConvBnReLU(b * 2, strides=2, dims=3, norm=self.norm, dtype=self.dtype,
                        name="conv1")(conv0, train)
        conv2 = ConvBnReLU(b * 2, dims=3, norm=self.norm, dtype=self.dtype,
                           name="conv2")(d1, train)
        d3 = ConvBnReLU(b * 4, strides=2, dims=3, norm=self.norm, dtype=self.dtype,
                        name="conv3")(conv2, train)
        bottom = ConvBnReLU(b * 4, dims=3, norm=self.norm, dtype=self.dtype,
                            name="conv4")(d3, train)
        up9 = DeconvBnReLU(b * 2, dims=3, norm=self.norm, dtype=self.dtype,
                           name="conv9")(bottom, train)
        x = conv2 + up9
        up11 = DeconvBnReLU(b, dims=3, norm=self.norm, dtype=self.dtype,
                            name="conv11")(x, train)
        x = conv0 + up11
        out = nn.Conv(2, (3, 3, 3), padding="SAME", dtype=self.dtype,
                      name="prob")(x)
        return out
