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


def make_cloud(g, seed=0):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
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
    import jax

    out = jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--g", type=int, default=28800)
    p.add_argument("--shape", type=int, nargs=2, default=(120, 160))
    p.add_argument("--targets", type=int, default=2)
    p.add_argument("--capacity", type=int, default=1024)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--skip-oracle", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mvsdet_tpu.ops import splat, splat_tiles

    print("backend:", jax.devices()[0].platform, jax.devices()[0])
    shape = tuple(args.shape)
    m, c, h, o = make_cloud(args.g)
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
        print(f"tiled-vs-oracle max abs err: {err:.2e}")

        def loss_oracle(m_, c_, h_, o_):
            img = splat.render_views(m_, c_, h_, o_, c2ws, ks, shape)
            return jnp.mean(img ** 2)

        g_oracle = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2, 3)))
        t_ob, _ = bench(g_oracle, m, c, h, o, iters=max(1, args.iters // 5))
        print(f"oracle fwd+bwd : {t_ob * 1e3:8.2f} ms "
              f"(speedup {t_ob / t_bwd:5.1f}x)")


if __name__ == "__main__":
    sys.exit(main())
