#!/usr/bin/env python
"""Evaluation launcher.

Equivalent of the reference `tools/test.py` (ref: tools/test.py:153-160):
runs `MVSDet.predict` over the validation scenes and computes the
IndoorMetric / NVSMetric / GaussianDepthMetric / MVSMetric /
WeightGapMetric suite (mmdet3d/evaluation/metrics/Indoor_NVS.py:111-283)
through the shared harness (mvsdet_tpu/evaluation/harness.py).

With --vis-dir (the reference's `vis_dir`, mvsdet.py:976-982), dumps per
scene: rendered/GT target images, colorised rendered depth, source
depth-expectation maps, and the gaussian point cloud as a 3DGS .ply.

Usage:
  python tools/test.py --infos data/scannet/scannet_infos_val_new.pkl \
      --data-root data/scannet --checkpoint work_dirs/mvsdet/best
  python tools/test.py --synthetic 4 --diagnostics --vis-dir out/vis
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate MVSDet-TPU")
    p.add_argument("--infos", help="path to *_infos_val_new.pkl")
    p.add_argument("--data-root", default="")
    p.add_argument("--checkpoint", required=False)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--arkit", action="store_true",
                   help="ARKitScenes preset (per-view K, yaw head)")
    p.add_argument("--n-views", type=int, default=None)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="compute dtype (params stay fp32); the "
                        "reference's AMP analogue (ref tools/train.py:104-114)")
    p.add_argument("--sweep-chunk", type=int, default=8)
    p.add_argument("--max-scenes", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--load-depth", action="store_true",
                   help="load GT depth for MVS/weight-gap diagnostics")
    p.add_argument("--diagnostics", action="store_true",
                   help="rendered depth + weight_gap/src_rmse metrics")
    p.add_argument("--vis-dir", default=None,
                   help="dump rendered/GT/depth images + gaussian .ply")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="scenes evaluated in parallel over a ('data',) "
                        "device mesh (the reference's 2-GPU dist_test.sh "
                        "analogue); metrics are identical to the "
                        "single-device path")
    return p.parse_args()


def make_vis_hook(vis_dir, cfg):
    import numpy as np

    from mvsdet_tpu.utils.box_vis import overlay_detections
    from mvsdet_tpu.utils.imageio import colorize_depth, write_png
    from mvsdet_tpu.utils.ply_export import export_ply

    os.makedirs(vis_dir, exist_ok=True)

    def hook(si, scene, out):
        d = os.path.join(vis_dir, f"scene{si:04d}")
        os.makedirs(d, exist_ok=True)
        if "boxes" in out:
            # projected box overlays (the reference's visualize_bbox,
            # mvsdet.py:976-982): predictions green, GT red, on the
            # first few source views
            mask = out["mask"]
            gmask = np.asarray(scene["gt_mask"])
            k = np.asarray(scene["intrinsic"])
            for i in range(min(3, scene["images"].shape[0])):
                k_i = k if k.ndim == 2 else k[i]
                img = overlay_detections(
                    np.asarray(scene["denorm_images"][i]),
                    np.asarray(scene["w2c"][i]), k_i,
                    out["boxes"][mask], out["scores"][mask],
                    np.asarray(scene["gt_boxes"])[gmask])
                write_png(os.path.join(d, f"boxes_{i}.png"), img)
        if "rendered" in out:
            for t in range(out["rendered"].shape[0]):
                write_png(os.path.join(d, f"render_{t}.png"),
                          out["rendered"][t])
                write_png(os.path.join(d, f"gt_{t}.png"),
                          np.asarray(scene["gt_images"][t]))
        if "rendered_depth" in out:
            for t in range(out["rendered_depth"].shape[0]):
                write_png(os.path.join(d, f"render_depth_{t}.png"),
                          colorize_depth(out["rendered_depth"][t]))
        if "depth_expect" in out:
            # a few source-view depth maps (ref save_src_depth picks 3)
            for i in range(min(3, out["depth_expect"].shape[0])):
                write_png(os.path.join(d, f"src_depth_{i}.png"),
                          colorize_depth(out["depth_expect"][i]))
        if "gs_means" in out:
            n = export_ply(os.path.join(d, "gaussians.ply"),
                           out["gs_means"], out["gs_covariances"],
                           out["gs_harmonics"], out["gs_opacities"],
                           min_opacity=0.01)
            print(f"scene{si:04d}: wrote {n} gaussians")

    return hook


def main():
    args = parse_args()
    import jax
    import numpy as np

    from mvsdet_tpu.config import arkit_config, scannet_config
    from mvsdet_tpu.evaluation.harness import (evaluate_scenes,
                                               make_predict_fn,
                                               make_sharded_predict_fn)
    from mvsdet_tpu.training.loop import create_predict_state

    cfg = arkit_config() if args.arkit else scannet_config()
    n_views = args.n_views or cfg.data.n_views_test
    n_targets = cfg.data.nerf_target_views_test
    n_src = n_views - n_targets

    if args.synthetic:
        from mvsdet_tpu.data.synthetic import make_synthetic_scene

        raw = [make_synthetic_scene(cfg, seed=1000 + s, n_views=n_src,
                                    n_targets=n_targets, arkit=args.arkit)
               for s in range(args.synthetic)]
    else:
        from mvsdet_tpu.data.infos import load_infos
        from mvsdet_tpu.data.pipeline import ScenePipeline

        infos = load_infos(args.infos, args.data_root, cfg.data.classes)
        if args.max_scenes:
            infos = infos[: args.max_scenes]
        pipeline = ScenePipeline(cfg, training=False,
                                 load_depth=args.load_depth)
        # per-scene-keyed rng: the sampled views for scene i do not
        # depend on --max-scenes or iteration order
        raw = [pipeline(s, np.random.RandomState(args.seed + i))
               for i, s in enumerate(infos)]

    import jax.numpy as jnp

    example = {k: jnp.asarray(v) for k, v in raw[0].items()}
    model, variables = create_predict_state(
        cfg, jax.random.PRNGKey(0), example, sweep_chunk=args.sweep_chunk,
        dtype=getattr(jnp, args.dtype), checkpoint=args.checkpoint)

    diag = args.diagnostics or bool(args.vis_dir)
    if args.data_parallel > 1:
        from mvsdet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.data_parallel, view=1)
        predict = make_sharded_predict_fn(model, variables, mesh,
                                          diagnostics=diag)
    else:
        predict = make_predict_fn(model, variables, diagnostics=diag)
    vis_hook = make_vis_hook(args.vis_dir, cfg) if args.vis_dir else None
    results = evaluate_scenes(predict, raw,
                              num_classes=cfg.model.head.n_classes,
                              vis_hook=vis_hook,
                              group_size=args.data_parallel)
    print(json.dumps({k: round(v, 4) for k, v in results.items()},
                     indent=1))


if __name__ == "__main__":
    main()
