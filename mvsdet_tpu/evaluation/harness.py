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


def make_sharded_predict_fn(model, variables, mesh,
                            diagnostics: bool = False):
    """Data-parallel predict over a ('data', ...) mesh.

    The equivalent of the reference's 2-GPU `tools/dist_test.sh` eval
    (ref: tools/dist_test.sh, metric gather indoor_metric.py:32-38):
    scenes are stacked on a leading axis and shard_mapped over 'data',
    one scene per device per call; metric aggregation stays host-side
    exactly as in the single-device path.

    Returns a fn(stacked_batch) -> stacked outputs, where every leaf of
    ``stacked_batch`` has a leading axis of size mesh.shape['data'].
    """
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from mvsdet_tpu.models.mvsdet import MVSDet

    def per_device(vars_, batch):
        local = {k: v[0] for k, v in batch.items()}
        out = model.apply(vars_, local, diagnostics, method=MVSDet.predict)
        return jax.tree_util.tree_map(lambda x: x[None], out)

    sharded = shard_map(per_device, mesh=mesh,
                        in_specs=(P(), P("data")), out_specs=P("data"),
                        check_vma=False)
    predict = jax.jit(sharded)
    return lambda batch: predict(variables, batch)


def evaluate_scenes(predict_fn: Callable, scenes: Iterable[Dict],
                    num_classes: int,
                    vis_hook: Optional[Callable[[int, Dict, Dict], None]]
                    = None,
                    group_size: int = 1) -> Dict[str, float]:
    """Run predict over host-side scene batches and aggregate metrics.

    Args:
      predict_fn: jitted `make_predict_fn` closure — or, with
        ``group_size > 1``, a `make_sharded_predict_fn` closure taking a
        stacked batch of exactly ``group_size`` scenes.
      scenes: iterable of host batch dicts (numpy, static shapes).
      num_classes: detection classes for mAP.
      vis_hook: optional fn(scene_index, scene, pred_host) called per
        scene with numpy outputs (tools/test.py --vis-dir dumps).
      group_size: scenes predicted per call (the data-parallel width);
        the final group is padded by repeating the last scene and the
        padded outputs dropped, so metrics are identical to group_size=1.
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    scenes = list(scenes)
    n_scenes = len(scenes)

    def _stage_single(si):
        """Host->device staging of one scene (runs on the prefetch
        thread: jnp.asarray enqueues the transfer ahead of use)."""
        return {k: jnp.asarray(v) for k, v in scenes[si].items()}

    def _stage_group(start):
        group = scenes[start:start + group_size]
        pad = group_size - len(group)
        group = group + [group[-1]] * pad
        stacked = {
            k: jnp.stack([jnp.asarray(s[k]) for s in group])
            for k in group[0]
        }
        return stacked, pad

    def predictions():
        """Yield (scene_index, out_np) in order, grouped if requested.

        Double-buffered: batch i+1 is staged on a background thread
        while the device predicts batch i and the host fetches its
        outputs — per-scene wall time approaches max(compute, staging)
        instead of their sum (the reference gets the same overlap from
        DataLoader workers, mvsdet_res50_2x_low_res.py:83,107).
        """
        if group_size <= 1:
            with ThreadPoolExecutor(1) as pool:
                nxt = pool.submit(_stage_single, 0)
                for si in range(n_scenes):
                    batch = nxt.result()
                    if si + 1 < n_scenes:
                        nxt = pool.submit(_stage_single, si + 1)
                    t0 = time.perf_counter()
                    out = predict_fn(batch)
                    out_np = {k: np.asarray(v) for k, v in out.items()}
                    predict_times.append(time.perf_counter() - t0)
                    yield si, out_np
            return
        starts = list(range(0, n_scenes, group_size))
        with ThreadPoolExecutor(1) as pool:
            nxt = pool.submit(_stage_group, starts[0])
            for gi, start in enumerate(starts):
                stacked, pad = nxt.result()
                if gi + 1 < len(starts):
                    nxt = pool.submit(_stage_group, starts[gi + 1])
                t0 = time.perf_counter()
                outs = predict_fn(stacked)
                outs_np = {k: np.asarray(v) for k, v in outs.items()}
                dt = (time.perf_counter() - t0) / max(group_size - pad, 1)
                for j in range(group_size - pad):
                    predict_times.append(dt)
                    yield start + j, {k: v[j] for k, v in outs_np.items()}

    preds, gts = [], []
    psnrs, ssims, d_rmses, mvs_rmses, wgaps, srmses = [], [], [], [], [], []
    predict_times = []
    for si, out_np in predictions():
        scene = scenes[si]
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
        if "depth" in scene and "depth_expect" in out_np:
            # MVSMetric: source depth expectation vs GT at feature res
            # (NerfDet predictions carry no depth expectation)
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
        # the whole first GROUP pays the jit compile (its per-scene
        # times all divide one compile-contaminated call); steady-state
        # is everything after it
        warm = max(group_size, 1)
        results["predict_s_first"] = round(predict_times[0], 3)
        if len(predict_times) > warm:
            results["predict_s_per_scene"] = round(
                float(np.mean(predict_times[warm:])), 3)
    return results


def _resize_nearest(imgs: np.ndarray, hw) -> np.ndarray:
    """(N, H, W) -> (N, h, w) nearest-neighbour (depth maps: no blending
    across the invalid-0 boundary)."""
    n, h0, w0 = imgs.shape
    h, w = hw
    ys = (np.arange(h) * h0 / h).astype(np.int64)
    xs = (np.arange(w) * w0 / w).astype(np.int64)
    return imgs[:, ys[:, None], xs[None, :]]
