"""ResNet-50 backbone with frozen batch-norm (flax).

Equivalent of the reference's 2D backbone: torchvision-style ResNet-50,
'pytorch' block style (stride on the 3x3), all BN frozen, 4-stage output
(ref config: mvsdet_res50_2x_low_res_depth.py:17-26 via mmdet.ResNet).

Every BN in the backbone is frozen (stats + affine constants in the
``frozen`` collection); stage freezing (``frozen_stages=1``) is enforced
by the optimizer mask (training/optim.py), keeping the module purely
functional.

Includes a torchvision state_dict porter so pretrained ImageNet weights
can be loaded when a checkpoint file is available.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mvsdet_tpu.models.layers import FrozenBatchNorm

Dtype = Any

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck, frozen BN, torch style."""

    width: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.width * 4
        residual = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBatchNorm(self.width, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        # explicit pad 1 (not SAME): torchvision pads symmetrically, and
        # SAME with stride 2 on even inputs pads (0, 1) — a half-pixel
        # shift that would break ported-weight parity
        y = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = FrozenBatchNorm(self.width, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBatchNorm(out_ch, dtype=self.dtype, name="bn3")(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = FrozenBatchNorm(out_ch, dtype=self.dtype,
                                       name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """4-stage ResNet-50; returns (C2, C3, C4, C5) at strides 4/8/16/32.

    ``frozen_stages=1`` (the reference default,
    mvsdet_res50_2x_low_res_depth.py:22) stops gradient flow at the end
    of layer1: the reference sets requires_grad=False there, so torch
    never backprops through stem+layer1.  Without the stop, autodiff
    computes (and the optimizer mask then discards) the full
    high-resolution backward through those stages — wasted work at the
    most expensive spatial resolution.
    """

    depth: int = 50
    frozen_stages: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        import jax

        blocks = STAGE_BLOCKS[self.depth]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        width = 64
        for stage, n_blocks in enumerate(blocks):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = Bottleneck(width, stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_block{b}")(x)
            if stage < self.frozen_stages:
                # cuts both the returned C(stage+2) and the chain into
                # the next stage, so no cotangent ever reaches here
                x = jax.lax.stop_gradient(x)
            outs.append(x)
            width *= 2
        return tuple(outs)


def load_torchvision_checkpoint(path: str):
    """Read a torchvision-format checkpoint file into a flat name->array dict.

    Accepts a torch-saved ``.pth``/``.pt`` (optionally wrapped in a
    ``state_dict`` key, as mm checkpoints are) or a numpy ``.npz`` with
    torchvision parameter names.  This is the file the reference
    downloads as ``torchvision://resnet50``
    (ref: projects/NeRF-Det/configs/mvsdet_res50_2x_low_res_depth.py:25).
    """
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v for k, v in obj.items()}


def port_torchvision_state_dict(state_dict, depth: int = 50):
    """Convert a torchvision resnet50 state_dict to flax param/frozen trees.

    Mapping: torch OIHW conv weights -> flax HWIO; BN
    weight/bias/running_mean/running_var -> frozen scale/bias/mean/var.

    Args:
      state_dict: dict of numpy arrays (torch tensors accepted via
        .numpy()) with torchvision resnet naming.
      depth: 50 or 101.

    Returns:
      {"params": ..., "frozen": ...} variable tree for `ResNet50`.
    """

    def get(name):
        t = state_dict[name]
        return np.asarray(t.numpy() if hasattr(t, "numpy") else t)

    def conv(name):
        return jnp.asarray(get(name).transpose(2, 3, 1, 0))  # OIHW->HWIO

    def bn(prefix):
        return dict(scale=jnp.asarray(get(prefix + ".weight")),
                    bias=jnp.asarray(get(prefix + ".bias")),
                    mean=jnp.asarray(get(prefix + ".running_mean")),
                    var=jnp.asarray(get(prefix + ".running_var")))

    params = {"stem_conv": {"kernel": conv("conv1.weight")}}
    frozen = {"stem_bn": bn("bn1")}
    for stage, n_blocks in enumerate(STAGE_BLOCKS[depth]):
        for b in range(n_blocks):
            tname = f"layer{stage + 1}.{b}"
            fname = f"layer{stage + 1}_block{b}"
            p = {}
            f = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = {"kernel": conv(f"{tname}.conv{i}.weight")}
                f[f"bn{i}"] = bn(f"{tname}.bn{i}")
            if f"{tname}.downsample.0.weight" in state_dict:
                p["downsample_conv"] = {
                    "kernel": conv(f"{tname}.downsample.0.weight")}
                f["downsample_bn"] = bn(f"{tname}.downsample.1")
            params[fname] = p
            frozen[fname] = f
    return {"params": params, "frozen": frozen}
