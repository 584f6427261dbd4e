"""Bilinear sampling primitives (the `grid_sample` replacement).

TPU-native replacement for `torch.nn.functional.grid_sample` /
`F.interpolate` (ref: projects/NeRF-Det/nerfdet/mvs_models/module.py:142).
Channels-last layout, gathers over a flattened pixel axis (lowered by XLA
to row gathers from an (H*W, C) array, which the TPU executes as
contiguous-row DMA).

Note on coordinates: the reference normalises by (size-1)/2 (module.py:
137-138) — the align_corners=True convention — but calls grid_sample with
the PyTorch default align_corners=False, introducing a sub-pixel scale
skew of W/(W-1).  We sample at the mathematically intended pixel
coordinate (no skew); this is a deliberate correction, not a port bug.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_grid_sample_skew(coords: jnp.ndarray, height: int,
                           width: int) -> jnp.ndarray:
    """Map intended pixel coords to the ones torch grid_sample actually taps.

    The reference normalises by (size-1)/2 (align_corners=True convention,
    module.py:137-138) but samples with the torch default
    align_corners=False, so a coordinate p is really fetched at
    p*size/(size-1) - 0.5.  Applying this skew to our corrected
    coordinates reproduces the reference bit-for-bit; used by the
    torch-golden parity tests (tests/test_torch_parity.py).

    Args:
      coords: (..., 2) intended (x, y) pixel coordinates.
      height, width: source image size.

    Returns:
      (..., 2) coordinates matching torch's effective tap positions.
    """
    x = coords[..., 0] * (width / (width - 1)) - 0.5
    y = coords[..., 1] * (height / (height - 1)) - 0.5
    return jnp.stack([x, y], axis=-1)


def bilinear_sample(image: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample a channels-last image at pixel coordinates.

    Zero padding outside the image (matches padding_mode='zeros': every
    tap that falls outside contributes zero).

    Args:
      image: (H, W, C).
      coords: (..., 2) pixel coordinates in (x, y) order; integer values
        hit pixel centres.

    Returns:
      (..., C) sampled values.
    """
    h, w, c = image.shape
    x, y = coords[..., 0], coords[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    flat = image.reshape(h * w, c)

    def tap(xi, yi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (c,))
        return vals * (wgt * valid.astype(image.dtype))[..., None]

    out = (tap(x0, y0, (1 - wx1) * (1 - wy1)) +
           tap(x0 + 1, y0, wx1 * (1 - wy1)) +
           tap(x0, y0 + 1, (1 - wx1) * wy1) +
           tap(x0 + 1, y0 + 1, wx1 * wy1))
    return out


def bilinear_resize(image: jnp.ndarray, out_shape) -> jnp.ndarray:
    """Bilinear resize with half-pixel centres (align_corners=False).

    Matches `F.interpolate(mode='bilinear')` as used for depth/rgb
    resampling (ref: mvsdet.py:328-330, 906-908).

    Args:
      image: (..., H, W) or (H, W, C) — the trailing two/leading two dims
        that change are inferred from out_shape length-2 over the first
        matching axes; here we resize the first two dims of an (H, W, ...)
        array.
      out_shape: (H2, W2).

    Returns:
      resized array with spatial dims replaced.
    """
    h2, w2 = out_shape
    new_shape = (h2, w2) + image.shape[2:]
    return jax.image.resize(image, new_shape, method="bilinear")
