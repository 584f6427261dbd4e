#!/usr/bin/env python
"""On-chip gather-vs-MXU plane-sweep depth comparison (bounded minutes).

The MXU two-pass shear-matmul warp (ops/plane_sweep_mxu.py) is the
default TPU sweep; the direct bilinear gather (ops/plane_sweep.py) is
the correctness oracle but compiles/executes too slowly at full scale
to run for all 40 refs on a tunneled chip (verify SKILL gotcha).  This
script bounds the work: ONE synthetic scene at ScanNet scale
(40 views, 60x80 features, D=12, k=2 — ref mvs_models/module.py:105-146),
REAL backbone features (untrained ResNet-50+FPN at full resolution),
and a ``--refs`` subset of reference views swept by BOTH paths with
identical CostRegNet weights.  Reports depth/prob agreement so the
tiny-scale test gates (tests/test_plane_sweep_mxu.py) can be checked
against full-scale on-chip numbers.

Usage: python scripts/compare_sweep_paths.py [--refs 4] [--views 40]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--refs", type=int, default=4,
                   help="reference views swept by both paths (compile "
                        "cost scales with refs/chunk graph copies)")
    p.add_argument("--views", type=int, default=40)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mvsdet_tpu.config import scannet_config
    from mvsdet_tpu.data.synthetic import make_synthetic_scene
    from mvsdet_tpu.geometry.cameras import (full_projection,
                                             knn_camera_neighbors,
                                             scale_intrinsics)
    from mvsdet_tpu.models.mvsdet import MVSDet

    print("backend:", jax.devices()[0].platform, flush=True)
    cfg = scannet_config()
    dtype = getattr(jnp, args.dtype)
    scene = make_synthetic_scene(cfg, seed=0, n_views=args.views,
                                 n_targets=1)
    images = jnp.asarray(scene["images"])
    feat_k = scale_intrinsics(jnp.asarray(scene["intrinsic"]),
                              float(cfg.model.feature_stride))
    proj44 = full_projection(jnp.asarray(scene["w2c"]), feat_k)
    c2w = jnp.linalg.inv(jnp.asarray(scene["w2c"]))
    neighbor_ids = knn_camera_neighbors(c2w[:, :3, 3],
                                        cfg.model.plane_sweep_neighbors)

    chunk = args.refs  # one chunk -> one graph copy per path
    models = {m: MVSDet(cfg.model, sweep_chunk=chunk, sweep_method=m,
                        dtype=dtype)
              for m in ("mxu", "gather")}

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    var_bb = jax.jit(functools.partial(
        models["mxu"].init, method=MVSDet.image_features))(rng, images)
    features = jax.jit(functools.partial(
        models["mxu"].apply, method=MVSDet.image_features))(var_bb, images)
    features = jax.block_until_ready(features).astype(jnp.float32)
    print(f"features {features.shape} in {time.time() - t0:.1f}s",
          flush=True)

    ref_ids = jnp.arange(args.refs)
    t0 = time.time()
    var_sw = jax.jit(functools.partial(
        models["mxu"].init, method=MVSDet.depth_probabilities))(
        rng, features, proj44, neighbor_ids, False, ref_ids)
    print(f"cost_reg init in {time.time() - t0:.1f}s", flush=True)

    from mvsdet_tpu.utils.profiling import hard_sync

    results = {}
    for name, model in models.items():
        t0 = time.time()
        fn = jax.jit(functools.partial(model.apply,
                                       method=MVSDet.depth_probabilities))
        prob, off = hard_sync(fn(var_sw, features, proj44, neighbor_ids,
                                 False, ref_ids))
        t_compile = time.time() - t0
        t0 = time.time()
        prob, off = hard_sync(
            fn(var_sw, features, proj44, neighbor_ids, False, ref_ids))
        t_run = time.time() - t0
        est_depth, est_prob, depth_expect = models["mxu"].apply(
            var_sw, prob, off, method=MVSDet.sample_depth)
        results[name] = dict(prob=np.asarray(prob),
                             est_depth=np.asarray(est_depth),
                             depth_expect=np.asarray(depth_expect))
        print(f"{name}: compile+run {t_compile:.1f}s, steady {t_run:.3f}s",
              flush=True)

    a, b = results["mxu"], results["gather"]
    top1 = float(np.mean(np.argmax(a["prob"], 1) == np.argmax(b["prob"], 1)))
    corr = float(np.corrcoef(a["prob"].ravel(), b["prob"].ravel())[0, 1])
    # top-k hypothesis sets (order-free) overlap; tolerance = 1/10 of
    # the 0.4 m plane interval (offsets are continuous, exact-match
    # would flunk benign last-ulp differences)
    ta = np.sort(a["est_depth"], axis=-1)
    tb = np.sort(b["est_depth"], axis=-1)
    topk_match = float(np.mean(np.abs(ta - tb) < 0.04))
    de_rmse = float(np.sqrt(np.mean(
        (a["depth_expect"] - b["depth_expect"]) ** 2)))
    de_max = float(np.max(np.abs(a["depth_expect"] - b["depth_expect"])))
    print(json.dumps({
        "refs": args.refs, "views": args.views, "dtype": args.dtype,
        "top1_plane_agreement": round(top1, 4),
        "prob_corr": round(corr, 5),
        "topk_depth_set_match": round(topk_match, 4),
        "depth_expect_rmse_m": round(de_rmse, 5),
        "depth_expect_max_abs_m": round(de_max, 5),
    }), flush=True)


if __name__ == "__main__":
    main()
