"""Feature Pyramid Network (flax).

Equivalent of the reference's 2D neck (mmdet FPN, config
mvsdet_res50_2x_low_res_depth.py:27-31): lateral 1x1 convs, nearest
top-down upsampling, 3x3 output convs, 4 levels out at 256ch.  Only
level 0 (stride 4) is consumed by MVSDet (mvsdet.py:375), but all
levels are built for parity.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(x)
            for i, x in enumerate(inputs)
        ]
        # top-down pathway: nearest-neighbour resize to the exact lateral
        # shape (mmdet FPN uses F.interpolate(size=...))
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(laterals[i], laterals[i - 1].shape,
                                  method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name=f"out{i}")(x)
            for i, x in enumerate(laterals)
        ]
        return tuple(outs[: self.num_outs])

