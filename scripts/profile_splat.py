#!/usr/bin/env python
"""Benchmark the splatting renderers on the current backend.

Reference scale (VERDICT r1 item 2): render targets at 120x160, G ~= 29k
gaussians (render_src_per_target=3 source views x 60x80 feature pixels
x 2 surfaces worth => the ScanNet test-time upper bound), train targets
T=2.  Compares the Pallas tile rasterizer (ops/splat_tiles.py) against
the XLA oracle (ops/splat.py), forward and forward+backward.

Usage: PYTHONPATH=. python scripts/profile_splat.py [--g 28800]
       [--skip-oracle]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_cloud(g, seed=0, surface=False):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    if surface:
        # realistic hard case: gaussians concentrated on a surface
        # (depth-expectation places them on scene geometry), so tiles
        # covering the surface see many more than the average count
        u = rng.randn(g, 3)
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        means = (np.array([0.0, 0.0, 2.5]) + u * 1.2
                 + rng.randn(g, 3) * 0.02).astype(np.float32)
    else:
        means = np.stack([
            rng.uniform(-1.5, 1.5, g),
            rng.uniform(-1.5, 1.5, g),
            rng.uniform(0.8, 4.5, g),
        ], -1).astype(np.float32)
    a = rng.randn(g, 3, 3).astype(np.float32) * 0.01
    covs = np.einsum("gij,gkj->gik", a, a) + \
        0.005 ** 2 * np.eye(3, dtype=np.float32)
    harm = (rng.randn(g, 3, 25) * 0.2).astype(np.float32)
    op = rng.uniform(0.1, 0.95, g).astype(np.float32)
    return (jnp.asarray(means), jnp.asarray(covs), jnp.asarray(harm),
            jnp.asarray(op))


def bench(fn, *args, iters=10):
    from mvsdet_tpu.utils.profiling import hard_sync

    out = hard_sync(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = hard_sync(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--g", type=int, default=28800)
    p.add_argument("--shape", type=int, nargs=2, default=(120, 160))
    p.add_argument("--targets", type=int, default=2)
    p.add_argument("--capacity", type=int, default=1024)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--skip-oracle", action="store_true")
    p.add_argument("--oracle-bwd", action="store_true",
                   help="also time the oracle's backward (OOMs a 16 GB "
                        "chip at G~29k; small G / CPU only)")
    p.add_argument("--surface", action="store_true",
                   help="concentrate gaussians on a sphere surface "
                        "(realistic tile-occupancy hard case)")
    p.add_argument("--capacity-sweep", type=int, nargs="*", default=None,
                   help="extra capacities to compare against the oracle "
                        "(max image error + fwd time each)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mvsdet_tpu.ops import splat, splat_tiles

    print("backend:", jax.devices()[0].platform, jax.devices()[0],
          "surface:", args.surface, flush=True)
    shape = tuple(args.shape)
    m, c, h, o = make_cloud(args.g, surface=args.surface)
    c2ws = jnp.stack([jnp.eye(4)] * args.targets)
    k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32)
    ks = jnp.stack([k] * args.targets)

    tiled = jax.jit(lambda *a: splat_tiles.render_views_tiled(
        *a, c2ws, ks, shape, capacity=args.capacity))
    t_fwd, img_t = bench(tiled, m, c, h, o, iters=args.iters)
    print(f"tiled fwd      : {t_fwd * 1e3:8.2f} ms "
          f"({args.targets / t_fwd:7.1f} views/s)")

    def loss_tiled(m_, c_, h_, o_):
        img = splat_tiles.render_views_tiled(m_, c_, h_, o_, c2ws, ks,
                                             shape, capacity=args.capacity)
        return jnp.mean(img ** 2)

    g_tiled = jax.jit(jax.grad(loss_tiled, argnums=(0, 1, 2, 3)))
    t_bwd, _ = bench(g_tiled, m, c, h, o, iters=args.iters)
    print(f"tiled fwd+bwd  : {t_bwd * 1e3:8.2f} ms")

    if not args.skip_oracle:
        oracle = jax.jit(lambda *a: splat.render_views(
            *a, c2ws, ks, shape))
        t_o, img_o = bench(oracle, m, c, h, o, iters=max(1, args.iters // 5))
        print(f"oracle fwd     : {t_o * 1e3:8.2f} ms "
              f"(speedup {t_o / t_fwd:5.1f}x)")
        err = float(jnp.max(jnp.abs(img_t - img_o)))
        print(f"tiled-vs-oracle max abs err: {err:.2e}", flush=True)

        if args.oracle_bwd:
            # NB: the oracle's whole-image VJP materialises (T, HW, G)
            # intermediates — ~84 GB at G=29k — and OOMs a 16 GB chip;
            # opt-in for small G / CPU only
            def loss_oracle(m_, c_, h_, o_):
                img = splat.render_views(m_, c_, h_, o_, c2ws, ks, shape)
                return jnp.mean(img ** 2)

            g_oracle = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2, 3)))
            t_ob, _ = bench(g_oracle, m, c, h, o,
                            iters=max(1, args.iters // 5))
            print(f"oracle fwd+bwd : {t_ob * 1e3:8.2f} ms "
                  f"(speedup {t_ob / t_bwd:5.1f}x)")

        if args.capacity_sweep:
            # truncation-quality sweep: max/p99 image error vs oracle
            # as per-tile capacity shrinks (VERDICT r2 item 4)
            print(f"{'capacity':>9} {'fwd_ms':>8} {'max_err':>9} "
                  f"{'p99_err':>9}")
            for cap in args.capacity_sweep:
                f = jax.jit(lambda *a, _c=cap: splat_tiles.render_views_tiled(
                    *a, c2ws, ks, shape, capacity=_c))
                t_c, img_c = bench(f, m, c, h, o, iters=args.iters)
                diff = np.abs(np.asarray(img_c) - np.asarray(img_o))
                print(f"{cap:>9} {t_c * 1e3:>8.2f} "
                      f"{float(diff.max()):>9.2e} "
                      f"{float(np.percentile(diff, 99)):>9.2e}",
                      flush=True)


if __name__ == "__main__":
    sys.exit(main())
