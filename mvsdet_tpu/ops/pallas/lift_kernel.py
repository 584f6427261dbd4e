"""Pallas fused voxel-lift gather: MXU one-hot matmul accumulation.

The depth-weighted voxel lift (ref: nerfdet/mvsdet.py:1372-1492,
`backproject_Weigh`) reduces, per view, to a weighted row-gather

    vol[v, :] += weight[n, v] * feat[n, pix[n, v], :]

over V≈25.6k voxels from HW≈4.8k feature pixels — a random gather the
TPU executes poorly on the VPU.  This kernel reformulates the gather as
a one-hot matmul per (voxel-tile, view) grid step:

    M[t, p] = (pix[n, t] == p) * weight[n, t]        # built in VMEM
    out[t]  += M @ feat[n]                           # MXU, fp32 accum

The one-hot never touches HBM (it is (TILE, HW) in VMEM per step), the
per-view feature map (HW, C) is block-fetched once per grid step, and
the view axis is the fastest grid dimension so each output tile stays
resident across all views.  The small per-view projection / z-window /
weight computation stays in XLA (see ops/voxel_lift.py) — only the
bandwidth-hostile gather moves into the kernel.  Custom VJP: d feat is
the transposed one-hot matmul, d weight the unweighted gather dotted
with the cotangent; pix is integral (symbolic-zero cotangent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_kernel(pix_ref, w_ref, feat_ref, out_ref):
    n = pl.program_id(1)

    # Zero-init + `+=` revisit-accumulation relies on TPU Pallas
    # iterating the LAST grid axis innermost (minor-to-major sequential
    # order); reordering the grid would silently break the accumulation.
    @pl.when(n == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    hw = feat_ref.shape[1]
    pix = pix_ref[0, 0, :]                                 # (T,)
    # f32: Mosaic can't insert a minor dim on sub-32-bit vectors
    w = w_ref[0, 0, :].astype(jnp.float32)                 # (T,)
    cols = jax.lax.broadcasted_iota(jnp.int32, (pix.shape[0], hw), 1)
    onehot = jnp.where(cols == pix[:, None], w[:, None],
                       jnp.zeros_like(w[:, None]))
    out_ref[:] += jnp.dot(onehot.astype(feat_ref.dtype), feat_ref[0],
                          preferred_element_type=jnp.float32)


def _dfeat_kernel(pix_ref, w_ref, g_ref, dfeat_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dfeat_ref[:] = jnp.zeros_like(dfeat_ref)

    hw = dfeat_ref.shape[1]
    pix = pix_ref[0, 0, :]
    w = w_ref[0, 0, :].astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (pix.shape[0], hw), 1)
    onehot = jnp.where(cols == pix[:, None], w[:, None],
                       jnp.zeros_like(w[:, None]))                # (T, HW)
    g = g_ref[:]                                                  # (T, C)
    dfeat_ref[0] += jax.lax.dot_general(
        onehot.astype(g.dtype), g,
        dimension_numbers=(((0,), (0,)), ((), ())),               # (HW, C)
        preferred_element_type=jnp.float32)


def _dweight_kernel(pix_ref, feat_ref, g_ref, dw_ref):
    hw = feat_ref.shape[1]
    pix = pix_ref[0, 0, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, (pix.shape[0], hw), 1)
    onehot = (cols == pix[:, None]).astype(feat_ref.dtype)
    gathered = jnp.dot(onehot, feat_ref[0],
                       preferred_element_type=jnp.float32)        # (T, C)
    dw_ref[0, 0, :] = jnp.sum(gathered * g_ref[:].astype(jnp.float32),
                              axis=1)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _pad_v(pix, weight):
    """Pad V to a TILE multiple and add a unit middle axis: Mosaic
    requires the last two block dims to be (8k, 128k) or equal to the
    array dims, so (N, V)->(N, 1, V) lets (1, 1, TILE) blocks lower."""
    n, v = pix.shape
    vp = _round_up(v, TILE)
    if vp != v:
        pix = jnp.pad(pix, ((0, 0), (0, vp - v)))
        weight = jnp.pad(weight, ((0, 0), (0, vp - v)))
    return pix.reshape(n, 1, vp), weight.reshape(n, 1, vp), vp


@functools.partial(jax.custom_vjp)
def weighted_gather_sum(feat: jnp.ndarray, pix: jnp.ndarray,
                        weight: jnp.ndarray) -> jnp.ndarray:
    """sum_n weight[n, v] * feat[n, pix[n, v], :] -> (V, C) fp32.

    Args:
      feat: (N, HW, C) per-view flattened feature maps.
      pix: (N, V) int32 flat pixel index per voxel (clipped in-range).
      weight: (N, V) per-voxel scalar weight (0 to mask).
    """
    return _forward(feat, pix, weight)


def _forward(feat, pix, weight):
    n, hw, c = feat.shape
    v = pix.shape[1]
    pix_p, w_p, vp = _pad_v(pix, weight.astype(feat.dtype))
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(vp // TILE, n),
        in_specs=[
            pl.BlockSpec((1, 1, TILE), lambda t, i: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda t, i: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, c), lambda t, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, c), lambda t, i: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vp, c), jnp.float32),
        interpret=_interpret(),
    )(pix_p, w_p, feat)
    return out[:v]


def _vjp_fwd(feat, pix, weight):
    return _forward(feat, pix, weight), (feat, pix, weight)


def _vjp_bwd(res, g):
    feat, pix, weight = res
    n, hw, c = feat.shape
    v = pix.shape[1]
    pix_p, w_p, vp = _pad_v(pix, weight.astype(feat.dtype))
    g_p = jnp.pad(g, ((0, vp - v), (0, 0))) if vp != v else g
    g_p = g_p.astype(feat.dtype)

    dfeat = pl.pallas_call(
        _dfeat_kernel,
        grid=(n, vp // TILE),
        in_specs=[
            pl.BlockSpec((1, 1, TILE), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, c), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), jnp.float32),
        interpret=_interpret(),
    )(pix_p, w_p, g_p)

    dw = pl.pallas_call(
        _dweight_kernel,
        grid=(vp // TILE, n),
        in_specs=[
            pl.BlockSpec((1, 1, TILE), lambda t, i: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, c), lambda t, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, c), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TILE), lambda t, i: (i, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, vp), jnp.float32),
        interpret=_interpret(),
    )(pix_p, feat, g_p)

    zero_pix = jnp.zeros(pix.shape, jax.dtypes.float0)
    return (dfeat.astype(feat.dtype), zero_pix,
            dw[:, 0, :v].astype(weight.dtype))


weighted_gather_sum.defvjp(_vjp_fwd, _vjp_bwd)
