"""Pallas TPU kernel: tile-binned Gaussian-splat compositing.

TPU-native counterpart of the reference's CUDA tile rasterizer
(gs_src/model/decoder/cuda_splatting.py:49-138 wrapping
diff-gaussian-rasterization).  The CUDA kernel bins gaussians into 16x16
pixel tiles, depth-sorts each tile's list, and alpha-composites
front-to-back with warp-level culling.  Here the binning and depth sort
happen once in XLA (ops/splat_tiles.py) producing *fixed-capacity*
per-tile gaussian tables; this kernel then runs one grid step per tile:

  grid = (n_tiles,)
  inputs per tile:  data  (8, K)  rows = [mx, my, conic_a, conic_b,
                                          conic_c, opacity, 0, 0]
                    vals  (C, K)  per-gaussian composited values
  output per tile:  (C + 1, P)   composited channels + final
                                  transmittance for the tile's P pixels

Compositing uses the same exclusive log-transmittance cumsum as the XLA
oracle (ops/splat.py:162-169), chunked along K so VMEM temporaries stay
bounded; the weights x values contraction rides the MXU.  Gradients come
from an analytic Pallas backward kernel (`_bwd_kernel`: reverse chunk
walk with a suffix-weight carry, mirroring the CUDA rasterizer's
back-to-front backward, cuda_rasterizer/backward.cu in
diff-gaussian-rasterization) — validated against jax.vjp of the XLA
twin (`composite_tiles_xla`); gather/scatter back to the global
gaussian set is handled outside by autodiff of the binning gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_pixel_coords(ty, tx, tile_h: int, tile_w: int):
    """Pixel-centre coordinates of one tile, flattened to (P, 1)."""
    p = tile_h * tile_w
    idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (tx * tile_w + idx % tile_w).astype(jnp.float32)
    py = (ty * tile_h + idx // tile_w).astype(jnp.float32)
    return px, py


def _composite_kernel(data_ref, vals_ref, out_ref, *, tiles_x: int,
                      tile_h: int, tile_w: int, k_chunk: int):
    t = pl.program_id(0)
    px, py = _tile_pixel_coords(t // tiles_x, t % tiles_x, tile_h, tile_w)
    p = tile_h * tile_w
    n_k = data_ref.shape[2]
    c = vals_ref.shape[1]
    # exclusive prefix-sum as a strictly-upper-triangular matmul —
    # Mosaic has no cumsum lowering, and this rides the MXU anyway
    ii = jax.lax.broadcasted_iota(jnp.int32, (k_chunk, k_chunk), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (k_chunk, k_chunk), 1)
    m_excl = (ii < jj).astype(jnp.float32)

    def body(ci, carry):
        log_t, acc = carry                                     # (P,1),(C,P)
        sl = pl.ds(ci * k_chunk, k_chunk)
        mx = data_ref[0, 0:1, sl]                              # (1, kc)
        my = data_ref[0, 1:2, sl]
        ca = data_ref[0, 2:3, sl]
        cb = data_ref[0, 3:4, sl]
        cc = data_ref[0, 4:5, sl]
        op = data_ref[0, 5:6, sl]
        dx = px - mx                                           # (P, kc)
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(op * jnp.exp(jnp.minimum(power, 0.0)), 0.99)
        alpha = jnp.where((power <= 0.0) & (alpha >= 1.0 / 255.0), alpha, 0.0)
        lt = jnp.log1p(-alpha)
        cum_excl = jax.lax.dot_general(
            lt, m_excl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (P, kc)
        t_excl = jnp.exp(log_t + cum_excl)                     # exclusive
        w = t_excl * alpha                                     # (P, kc)
        vals_c = vals_ref[0, :, sl]                            # (C, kc)
        acc = acc + jax.lax.dot_general(
            vals_c, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (C, P)
        return log_t + jnp.sum(lt, axis=1, keepdims=True), acc

    log_t, acc = jax.lax.fori_loop(
        0, n_k // k_chunk, body,
        (jnp.zeros((p, 1), jnp.float32), jnp.zeros((c, p), jnp.float32)))
    out_ref[0, :c, :] = acc
    out_ref[0, c:c + 1, :] = jnp.exp(log_t).reshape(1, p)


def _composite_tiles_pallas(data, vals, tiles_x: int, tile_h: int,
                            tile_w: int, k_chunk: int, interpret: bool):
    n_tiles, _, k = data.shape
    c = vals.shape[1]
    p = tile_h * tile_w
    kc = min(k_chunk, k)
    while k % kc:  # largest divisor of K not above k_chunk
        kc -= 1
    kernel = functools.partial(_composite_kernel, tiles_x=tiles_x,
                               tile_h=tile_h, tile_w=tile_w, k_chunk=kc)
    flops_tile = p * k * 12 + 2 * p * k * c
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c + 1, p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, c + 1, p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_tiles * flops_tile,
            bytes_accessed=data.size * 4 + vals.size * 4
            + n_tiles * (c + 1) * p * 4,
            transcendentals=2 * n_tiles * p * k),
        interpret=interpret,
    )(data, vals)


def _bwd_kernel(data_ref, vals_ref, g_ref, ddata_ref, dvals_ref, logt_ref,
                *, tiles_x: int, tile_h: int, tile_w: int, k_chunk: int):
    """Analytic backward of the tile compositor, one grid step per tile.

    For L = sum_i w_i (g.v_i) + g_T T_final with w_i = a_i prod_{k<i}(1-a_k):
      dL/dv_j    = w_j g                                  (per channel)
      dL/da_j    = T^excl_j u_j - (S_j + g_T T_final) / (1 - a_j)
    where u_j = g.v_j and S_j = sum_{i>j} w_i u_i.  Chunks are walked
    back-to-front carrying the suffix S; the per-chunk starting
    log-transmittance is stashed in a small VMEM scratch during a cheap
    forward sweep (phase A).  da then chains through the forward's
    exact clip/cull masks to the 6 data rows.
    """
    t = pl.program_id(0)
    px, py = _tile_pixel_coords(t // tiles_x, t % tiles_x, tile_h, tile_w)
    p = tile_h * tile_w
    n_k = data_ref.shape[2]
    c = vals_ref.shape[1]
    n_chunks = n_k // k_chunk
    ii = jax.lax.broadcasted_iota(jnp.int32, (k_chunk, k_chunk), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (k_chunk, k_chunk), 1)
    m_excl = (ii < jj).astype(jnp.float32)      # strictly upper: prefix
    m_suf = (ii > jj).astype(jnp.float32)       # strictly lower: suffix

    def chunk_pieces(ci):
        sl = pl.ds(ci * k_chunk, k_chunk)
        mx = data_ref[0, 0:1, sl]
        my = data_ref[0, 1:2, sl]
        ca = data_ref[0, 2:3, sl]
        cb = data_ref[0, 3:4, sl]
        cc = data_ref[0, 4:5, sl]
        op = data_ref[0, 5:6, sl]
        dx = px - mx                                           # (P, kc)
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        exp_p = jnp.exp(jnp.minimum(power, 0.0))
        alpha_un = op * exp_p
        alpha_cl = jnp.minimum(alpha_un, 0.99)
        active = (power <= 0.0) & (alpha_cl >= 1.0 / 255.0)
        alpha = jnp.where(active, alpha_cl, 0.0)
        return sl, (dx, dy, ca, cb, cc, power, exp_p, alpha_un, active,
                    alpha)

    # phase A: per-chunk starting log-transmittance
    def body_a(ci, log_t):
        logt_ref[ci, :] = log_t[:, 0]
        _, (_, _, _, _, _, _, _, _, _, alpha) = chunk_pieces(ci)
        return log_t + jnp.sum(jnp.log1p(-alpha), axis=1, keepdims=True)

    log_t_total = jax.lax.fori_loop(0, n_chunks, body_a,
                                    jnp.zeros((p, 1), jnp.float32))
    t_final = jnp.exp(log_t_total)                             # (P, 1)

    g_out = g_ref[0, :c, :]                                    # (C, P)
    g_t = g_ref[0, c:c + 1, :]                                 # (1, P)
    base = g_t.reshape(p, 1) * t_final                         # (P, 1)

    # phase B: reverse chunk walk with suffix carry
    def body_b(r, s_carry):
        ci = n_chunks - 1 - r
        sl, (dx, dy, ca, cb, cc, power, exp_p, alpha_un, active,
             alpha) = chunk_pieces(ci)
        lt = jnp.log1p(-alpha)
        cum_excl = jax.lax.dot_general(
            lt, m_excl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        t_excl = jnp.exp(logt_ref[ci, :][:, None] + cum_excl)  # (P, kc)
        w = t_excl * alpha
        vals_c = vals_ref[0, :, sl]                            # (C, kc)
        u = jax.lax.dot_general(
            g_out, vals_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (P, kc)
        wu = w * u
        s_within = jax.lax.dot_general(
            wu, m_suf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (P, kc)
        dalpha = t_excl * u - (s_within + s_carry + base) / (1.0 - alpha)
        not_clipped = alpha_un < 0.99
        d_alpha_un = jnp.where(active & not_clipped, dalpha, 0.0)
        d_op_pk = d_alpha_un * exp_p                           # (P, kc)
        d_power = jnp.where(power < 0.0, d_alpha_un * alpha_un, 0.0)

        one_row = jnp.ones((1, p), jnp.float32)

        def col_sum(x):                                        # (P, kc)->(1, kc)
            return jax.lax.dot_general(
                one_row, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        ddata_ref[0, 0:1, sl] = col_sum(d_power * (ca * dx + cb * dy))
        ddata_ref[0, 1:2, sl] = col_sum(d_power * (cc * dy + cb * dx))
        ddata_ref[0, 2:3, sl] = col_sum(d_power * (-0.5 * dx * dx))
        ddata_ref[0, 3:4, sl] = col_sum(d_power * (-dx * dy))
        ddata_ref[0, 4:5, sl] = col_sum(d_power * (-0.5 * dy * dy))
        ddata_ref[0, 5:6, sl] = col_sum(d_op_pk)
        ddata_ref[0, 6:8, sl] = jnp.zeros((2, k_chunk), jnp.float32)
        dvals_ref[0, :, sl] = jax.lax.dot_general(
            g_out, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (C, kc)
        return s_carry + jnp.sum(wu, axis=1, keepdims=True)

    jax.lax.fori_loop(0, n_chunks, body_b, jnp.zeros((p, 1), jnp.float32))


def _composite_tiles_bwd_pallas(data, vals, g, tiles_x: int, tile_h: int,
                                tile_w: int, k_chunk: int, interpret: bool):
    n_tiles, _, k = data.shape
    c = vals.shape[1]
    p = tile_h * tile_w
    kc = min(k_chunk, k)
    while k % kc:
        kc -= 1
    kernel = functools.partial(_bwd_kernel, tiles_x=tiles_x, tile_h=tile_h,
                               tile_w=tile_w, k_chunk=kc)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c + 1, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, k), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, c, k), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((k // kc, p), jnp.float32)],
        interpret=interpret,
    )(data, vals, g)


def composite_tiles_xla(data, vals, tiles_x: int, tile_h: int, tile_w: int):
    """Pure-XLA twin of the kernel — identical math, vmapped over tiles.

    Used as the custom-VJP backward (rematerialised) and as the test
    oracle for the kernel itself.
    """
    n_tiles = data.shape[0]
    ty = jnp.arange(n_tiles) // tiles_x
    tx = jnp.arange(n_tiles) % tiles_x

    def one(d, v, ty_i, tx_i):
        px, py = _tile_pixel_coords(ty_i, tx_i, tile_h, tile_w)
        dx = px - d[0][None, :]
        dy = py - d[1][None, :]
        power = (-0.5 * (d[2][None, :] * dx * dx + d[4][None, :] * dy * dy)
                 - d[3][None, :] * dx * dy)
        alpha = jnp.minimum(d[5][None, :] * jnp.exp(jnp.minimum(power, 0.0)),
                            0.99)
        alpha = jnp.where((power <= 0.0) & (alpha >= 1.0 / 255.0), alpha, 0.0)
        lt = jnp.log1p(-alpha)
        cum = jnp.cumsum(lt, axis=1)
        w = jnp.exp(cum - lt) * alpha                          # (P, K)
        out = jnp.einsum("ck,pk->cp", v, w)
        return out, jnp.exp(cum[:, -1])

    outs, t_final = jax.vmap(one)(data, vals, ty, tx)
    return jnp.concatenate([outs, t_final[:, None, :]], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def composite_tiles(data, vals, tiles_x: int, tile_h: int = 16,
                    tile_w: int = 16, k_chunk: int = 512):
    """Composite per-tile gaussian tables into tile images.

    Args:
      data: (n_tiles, 8, K) f32 — rows [mx, my, conic_a, conic_b,
        conic_c, opacity, pad, pad]; empty slots must have opacity 0.
      vals: (n_tiles, C, K) f32 per-gaussian channel values.
      tiles_x: tiles per image row (static).
      tile_h, tile_w: tile size in pixels (static).
      k_chunk: K-axis chunk for VMEM temporaries (static).

    Returns:
      (n_tiles, C + 1, tile_h * tile_w): channels + final transmittance.
    """
    interpret = jax.devices()[0].platform != "tpu"
    return _composite_tiles_pallas(data, vals, tiles_x, tile_h, tile_w,
                                   k_chunk, interpret)


def _fwd(data, vals, tiles_x, tile_h, tile_w, k_chunk):
    return composite_tiles(data, vals, tiles_x, tile_h, tile_w,
                           k_chunk), (data, vals)


def _bwd(tiles_x, tile_h, tile_w, k_chunk, res, g):
    data, vals = res
    interpret = jax.devices()[0].platform != "tpu"
    ddata, dvals = _composite_tiles_bwd_pallas(
        data, vals, g, tiles_x, tile_h, tile_w, k_chunk, interpret)
    return ddata, dvals


composite_tiles.defvjp(_fwd, _bwd)
