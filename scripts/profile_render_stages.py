#!/usr/bin/env python
"""Per-stage timing of the tiled splat renderer at the bench workload.

Decomposes render_views_tiled's pipeline — SH color, projection,
depth sort, tile binning (top_k), table gather, composite kernel — so
the round-5 roofline note can attribute the render phase to its actual
bottleneck (VERDICT r4 weak-3).  Subtract the dispatch floor printed at
the top from every row when reading absolute numbers.

Usage: python scripts/profile_render_stages.py [--g 28800] [--targets 2]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_splat import bench, make_cloud  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--g", type=int, default=28800)
    p.add_argument("--targets", type=int, default=2)
    p.add_argument("--capacity", type=int, default=2048)
    p.add_argument("--shape", type=int, nargs=2, default=(120, 160))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mvsdet_tpu.geometry.sh import eval_sh_color
    from mvsdet_tpu.ops import splat_tiles
    from mvsdet_tpu.ops.pallas.splat_kernel import composite_tiles
    from mvsdet_tpu.ops.splat import project_gaussians
    from mvsdet_tpu.utils.profiling import dispatch_floor

    h, w = args.shape
    tiles_y, tiles_x = -(-h // 16), -(-w // 16)
    m, c, harm, o = make_cloud(args.g, surface=True)
    t = args.targets

    def look_at(eye):
        eye = np.asarray(eye, np.float64)
        fwd = np.array([0, 0, 2.5]) - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross([0, -1, 0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, eye
        return c2w.astype(np.float32)

    c2ws = jnp.stack([jnp.asarray(look_at([0.3 * i, 0.1 * i, 0.0]))
                      for i in range(t)])
    k = jnp.asarray([[1.1, 0, 0.5], [0, 1.4, 0.5], [0, 0, 1]], jnp.float32)
    ks = jnp.stack([k] * t)

    print(f"dispatch floor: {dispatch_floor()*1e3:.1f} ms "
          f"(subtract from each row)")

    # full pipeline
    full = jax.jit(lambda m_, c_, h_, o_: splat_tiles.render_views_tiled(
        m_, c_, h_, o_, c2ws, ks, (h, w), capacity=args.capacity))
    dt, _ = bench(full, m, c, harm, o)
    print(f"full render ({t} targets)        : {dt*1e3:8.2f} ms")

    # stage a: SH color (per target)
    sh_fn = jax.jit(lambda m_, h_: jnp.stack(
        [splat_tiles._sh_values(m_, h_, c2ws[i]) for i in range(t)]))
    dt, _ = bench(sh_fn, m, harm)
    print(f"sh color x{t}                    : {dt*1e3:8.2f} ms")

    # stage b: projection (per target)
    proj_fn = jax.jit(lambda m_, c_: [project_gaussians(
        m_, c_, c2ws[i], ks[i], (h, w), 0.2) for i in range(t)])
    dt, proj_out = bench(proj_fn, m, c)
    print(f"project x{t}                     : {dt*1e3:8.2f} ms")

    mean2d, conic, z, valid, cov_tri = proj_out[0]
    rad = splat_tiles.splat_radii(cov_tri)

    # stage c: depth argsort (per target)
    sort_fn = jax.jit(lambda z_, v_: [jnp.argsort(
        jnp.where(v_, z_, jnp.inf)) for _ in range(t)])
    dt, orders = bench(sort_fn, z, valid)
    order = orders[0]

    print(f"argsort x{t}                     : {dt*1e3:8.2f} ms")

    # stage d: binning top_k (per target)
    bin_fn = jax.jit(lambda m2, r_, v_: [splat_tiles.bin_gaussians(
        m2, r_, v_, tiles_y, tiles_x, args.capacity) for _ in range(t)])
    dt, bins = bench(bin_fn, mean2d[order], rad[order], valid[order])
    idx, slot_valid = bins[0]
    print(f"bin (top_k) x{t}                 : {dt*1e3:8.2f} ms")

    # stage e: table gather (per target)
    def tables(m2, co, va, op, idx_, sv):
        zero = jnp.zeros_like(op[idx_])
        data = jnp.stack([m2[:, 0][idx_], m2[:, 1][idx_], co[:, 0][idx_],
                          co[:, 1][idx_], co[:, 2][idx_],
                          jnp.where(sv, op[idx_], 0.0), zero, zero], axis=1)
        vals = jnp.swapaxes(va[idx_], 1, 2)
        return data, vals

    vals_g = jnp.abs(jnp.ones((args.g, 3), jnp.float32))
    gather_fn = jax.jit(lambda m2, co, va, op: [tables(
        m2, co, va, op, idx, slot_valid) for _ in range(t)])
    dt, tabs = bench(gather_fn, mean2d[order], conic[order], vals_g,
                     o[order])
    data, vals = tabs[0]
    print(f"table gather x{t}                : {dt*1e3:8.2f} ms")

    # stage f: composite kernel (all targets' tiles in one launch)
    data_all = jnp.concatenate([data] * t)
    vals_all = jnp.concatenate([vals] * t)
    comp_fn = jax.jit(lambda d_, v_: composite_tiles(
        d_, v_, tiles_x, 16, 16, min(512, args.capacity)))
    dt, _ = bench(comp_fn, data_all, vals_all)
    print(f"composite kernel ({t*tiles_y*tiles_x} tiles): {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
