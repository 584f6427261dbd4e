#!/usr/bin/env python
"""Evaluation launcher.

Equivalent of the reference `tools/test.py` (ref: tools/test.py:153-160):
runs `MVSDet.predict` over the validation scenes and computes the
IndoorMetric / NVSMetric triple (mAP@0.25/0.5, PSNR/SSIM).

Usage:
  python tools/test.py --infos data/scannet/scannet_infos_val_new.pkl \
      --data-root data/scannet --checkpoint work_dirs/mvsdet/latest
  python tools/test.py --synthetic 4 --checkpoint work_dirs/mvsdet/latest
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
    p.add_argument("--n-views", type=int, default=None)
    p.add_argument("--sweep-chunk", type=int, default=8)
    p.add_argument("--max-scenes", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvsdet_tpu.config import scannet_config
    from mvsdet_tpu.evaluation.indoor_eval import indoor_map
    from mvsdet_tpu.evaluation.nvs_metrics import psnr, ssim
    from mvsdet_tpu.models.mvsdet import MVSDet
    from mvsdet_tpu.training.loop import create_train_state, load_checkpoint

    cfg = scannet_config()
    n_views = args.n_views or cfg.data.n_views_test
    n_targets = cfg.data.nerf_target_views_test
    n_src = n_views - n_targets

    if args.synthetic:
        from mvsdet_tpu.data.synthetic import make_synthetic_scene

        raw = [make_synthetic_scene(cfg, seed=1000 + s, n_views=n_src,
                                    n_targets=n_targets)
               for s in range(args.synthetic)]
    else:
        from mvsdet_tpu.data.infos import load_infos
        from mvsdet_tpu.data.pipeline import ScenePipeline

        infos = load_infos(args.infos, args.data_root, cfg.data.classes)
        if args.max_scenes:
            infos = infos[: args.max_scenes]
        pipeline = ScenePipeline(cfg, training=False)
        rng = np.random.RandomState(args.seed)
        raw = [pipeline(s, rng) for s in infos]

    example = {k: jnp.asarray(v) for k, v in raw[0].items()}
    model, state, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), example, sweep_chunk=args.sweep_chunk)
    if args.checkpoint:
        state = load_checkpoint(args.checkpoint, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 "frozen": state.frozen}

    @jax.jit
    def predict(batch):
        return model.apply(variables, batch, method=MVSDet.predict)

    preds, gts, psnrs, ssims = [], [], [], []
    for scene in raw:
        batch = {k: jnp.asarray(v) for k, v in scene.items()}
        out = predict(batch)
        mask = np.asarray(out["mask"])
        preds.append({"boxes": np.asarray(out["boxes"])[mask],
                      "scores": np.asarray(out["scores"])[mask],
                      "labels": np.asarray(out["labels"])[mask]})
        gmask = np.asarray(scene["gt_mask"])
        gts.append({"boxes": np.asarray(scene["gt_boxes"])[gmask],
                    "labels": np.asarray(scene["gt_labels"])[gmask]})
        if "rendered" in out:
            for t in range(out["rendered"].shape[0]):
                r = np.asarray(out["rendered"][t])
                g = np.asarray(scene["gt_images"][t])
                psnrs.append(psnr(r, g))
                ssims.append(ssim(r, g))

    results = indoor_map(preds, gts, num_classes=cfg.model.head.n_classes)
    if psnrs:
        results["psnr"] = float(np.mean(psnrs))
        results["ssim"] = float(np.mean(ssims))
    print(json.dumps({k: round(v, 4) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
