"""Shared evaluation harness: predict over scenes -> metric dict.

The reference splits this across mmengine ValLoop + IndoorMetric +
NVSMetric / GaussianDepthMetric / MVSMetric / WeightGapMetric
(mmdet3d/evaluation/metrics/indoor_metric.py,
mmdet3d/evaluation/metrics/Indoor_NVS.py:111-283) driven by
`MVSDet.predict` (mvsdet.py:917-1061).  Here it is one function used by
both the training loop (eval each epoch, best-checkpoint selection) and
`tools/test.py`.

Metrics returned:
  mAP_0.25 / mAP_0.50 (+ per-class APs)   — IndoorMetric
  psnr / ssim                             — NVSMetric (save_rendered_img)
  depth_rmse                              — GaussianDepthMetric (rendered
                                            target depth vs GT, gt>0 mask)
  mvs_rmse                                — MVSMetric (source depth
                                            expectation vs GT src depth)
  weight_gap / src_rmse                   — WeightGapMetric (lift
                                            diagnostics, mvsdet.py:1053-1058)
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterable, Optional, Sequence

import numpy as np

from mvsdet_tpu.evaluation.indoor_eval import indoor_map
from mvsdet_tpu.evaluation.nvs_metrics import depth_rmse, psnr, ssim


def make_predict_fn(model, variables, diagnostics: bool = False):
    """One jitted predict closure (diagnostics flag is static).

    ``variables`` is a jit ARGUMENT, not a closure capture: captured
    arrays are serialised into the compile payload on AOT backends
    (axon remote_compile rejects the ~100 MB weight tree with HTTP 413),
    while arguments ship as runtime buffers.
    """
    import jax

    from mvsdet_tpu.models.mvsdet import MVSDet

    @jax.jit
    def predict(vars_, batch):
        return model.apply(vars_, batch, diagnostics,
                           method=MVSDet.predict)

    return lambda batch: predict(variables, batch)


def evaluate_scenes(predict_fn: Callable, scenes: Iterable[Dict],
                    num_classes: int,
                    vis_hook: Optional[Callable[[int, Dict, Dict], None]]
                    = None) -> Dict[str, float]:
    """Run predict over host-side scene batches and aggregate metrics.

    Args:
      predict_fn: jitted `make_predict_fn` closure.
      scenes: iterable of host batch dicts (numpy, static shapes).
      num_classes: detection classes for mAP.
      vis_hook: optional fn(scene_index, scene, pred_host) called per
        scene with numpy outputs (tools/test.py --vis-dir dumps).
    """
    import time

    import jax.numpy as jnp

    preds, gts = [], []
    psnrs, ssims, d_rmses, mvs_rmses, wgaps, srmses = [], [], [], [], [], []
    predict_times = []
    for si, scene in enumerate(scenes):
        batch = {k: jnp.asarray(v) for k, v in scene.items()}
        t0 = time.perf_counter()
        out = predict_fn(batch)
        out_np = {k: np.asarray(v) for k, v in out.items()}
        predict_times.append(time.perf_counter() - t0)
        mask = out_np["mask"]
        preds.append({"boxes": out_np["boxes"][mask],
                      "scores": out_np["scores"][mask],
                      "labels": out_np["labels"][mask]})
        gmask = np.asarray(scene["gt_mask"])
        gts.append({"boxes": np.asarray(scene["gt_boxes"])[gmask],
                    "labels": np.asarray(scene["gt_labels"])[gmask]})

        if "rendered" in out_np and "gt_images" in scene:
            for t in range(out_np["rendered"].shape[0]):
                r = out_np["rendered"][t]
                g = np.asarray(scene["gt_images"][t])
                psnrs.append(psnr(r, g))
                ssims.append(ssim(r, g))
        if "rendered_depth" in out_np and "gt_depth" in scene:
            for t in range(out_np["rendered_depth"].shape[0]):
                d_rmses.append(depth_rmse(out_np["rendered_depth"][t],
                                          np.asarray(scene["gt_depth"][t])))
        if "depth" in scene:
            # MVSMetric: source depth expectation vs GT at feature res
            est = out_np["depth_expect"]                    # (N, h, w)
            gt = np.asarray(scene["depth"], np.float64)
            gt_small = _resize_nearest(gt, est.shape[1:3])
            mvs_rmses.append(depth_rmse(est, gt_small))
        if "weight_gap" in out_np:
            wgaps.append(float(out_np["weight_gap"]))
            srmses.append(float(out_np["src_rmse"]))
        if vis_hook is not None:
            vis_hook(si, scene, out_np)

    results = indoor_map(preds, gts, num_classes=num_classes)
    if psnrs:
        results["psnr"] = float(np.mean(psnrs))
        results["ssim"] = float(np.mean(ssims))
    if d_rmses:
        results["depth_rmse"] = float(np.mean(d_rmses))
    if mvs_rmses:
        results["mvs_rmse"] = float(np.mean(mvs_rmses))
    if wgaps:
        results["weight_gap"] = float(np.mean(wgaps))
        results["src_rmse"] = float(np.mean(srmses))
    if predict_times:
        # scene 0 pays the jit compile; steady-state is the rest
        results["predict_s_first"] = round(predict_times[0], 3)
        if len(predict_times) > 1:
            results["predict_s_per_scene"] = round(
                float(np.mean(predict_times[1:])), 3)
    return results


def _resize_nearest(imgs: np.ndarray, hw) -> np.ndarray:
    """(N, H, W) -> (N, h, w) nearest-neighbour (depth maps: no blending
    across the invalid-0 boundary)."""
    n, h0, w0 = imgs.shape
    h, w = hw
    ys = (np.arange(h) * h0 / h).astype(np.int64)
    xs = (np.arange(w) * w0 / w).astype(np.int64)
    return imgs[:, ys[:, None], xs[None, :]]
