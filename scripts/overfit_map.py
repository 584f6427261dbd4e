#!/usr/bin/env python
"""Detection-learning proof: overfit a few synthetic scenes until
mAP@0.25 rises (round-2 VERDICT missing-1).

The reference's raison d'etre is ScanNet mAP@0.25 ~53 after 12 epochs
(ref: projects/NeRF-Det/README.md:58-62, training protocol
configs/mvsdet_res50_2x_low_res.py:128-172).  A full ScanNet run needs
the dataset; what is provable hermetically is that the entire chain —
head target assignment, focal/BCE/IoU losses, AdamW groups, decode,
NMS, greedy-AP eval — actually LEARNS: train on K fixed synthetic
scenes, evaluate mAP on those same scenes, and watch it climb from ~0
to high.  tests/test_learning.py asserts a calibrated version of this.

Usage:
  python scripts/overfit_map.py --steps 400 --eval-every 50 \
      --out work_dirs/overfit_map
"""

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def overfit_config(lr: float = 1e-3, arkit: bool = False,
                   total_steps: int = 0, costreg_norm: str = "group",
                   rotated_loss: str = None):
    """Tiny-shapes config whose voxel grid covers the synthetic scene.

    tiny_test_config's 8x8x4 @0.16 m grid (1.28 m extent) misses the
    +-1.2 m sphere layout; 16x16x8 @0.2 m (3.2 x 3.2 x 1.6 m about
    origin z=0.5) contains every box.  With ``arkit`` the head becomes
    the 7-dim yaw head (rotated targets/NMS/eval end to end).

    ``total_steps`` scales the reference's MultiStepLR shape onto the
    run: x0.1 at 8/12 and 11/12 of the steps (the reference decays at
    epochs 8 and 11 of 12, mvsdet_res50_2x_low_res_depth.py:185-193).
    Without decay the lr-1e-3 overfit oscillates after reaching its
    plateau (round-3 VERDICT weak-1: 0.8 at step 50 -> 0.21 at step
    100 on one CPU device); with it the hot phase finds the solution
    and the decayed phase locks it in.  0 = constant lr (legacy).
    """
    from mvsdet_tpu.config import tiny_test_config

    base = tiny_test_config()
    head = base.model.head
    if arkit:
        head = dataclasses.replace(head, n_reg_outs=7, with_yaw=True)
    if rotated_loss:
        head = dataclasses.replace(head, rotated_bbox_loss=rotated_loss)
    model = dataclasses.replace(
        base.model, n_voxels=(16, 16, 8), voxel_size=(0.2, 0.2, 0.2),
        head=head, cost_reg_norm=costreg_norm)
    if total_steps > 0:
        milestones = (max(1, total_steps * 8 // 12),
                      max(2, total_steps * 11 // 12))
    else:
        milestones = (10_000_000,)
    optim = dataclasses.replace(base.optim, lr=lr, milestones=milestones)
    return dataclasses.replace(base, model=model, optim=optim)


def run(steps: int, eval_every: int, n_scenes: int, lr: float, seed: int,
        log_fn=print, arkit: bool = False, model_family: str = "mvsdet",
        costreg_norm: str = "group", rotated_loss: str = None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvsdet_tpu.data.synthetic import make_synthetic_scene
    from mvsdet_tpu.evaluation.harness import evaluate_scenes

    cfg = overfit_config(lr=lr, arkit=arkit, total_steps=steps,
                         costreg_norm=costreg_norm, rotated_loss=rotated_loss)
    scenes = [make_synthetic_scene(cfg, seed=seed + s, n_views=4,
                                   n_targets=2, arkit=arkit)
              for s in range(n_scenes)]
    batches = [{k: jnp.asarray(v) for k, v in s.items()} for s in scenes]

    # milestones are step-valued (overfit_config scales them to the run)
    if model_family == "nerfdet":
        from mvsdet_tpu.models.nerfdet import NerfDetLegacy
        from mvsdet_tpu.training.loop import (create_nerfdet_state,
                                              make_jitted_nerfdet_step)

        model, state, tx = create_nerfdet_state(
            cfg, jax.random.PRNGKey(seed), batches[0], steps_per_epoch=1)
        step_fn = make_jitted_nerfdet_step(model, tx, base_seed=seed)
        predict = jax.jit(functools.partial(model.apply,
                                            method=NerfDetLegacy.predict))
        predict = functools.partial(lambda p, v, b, _d: p(v, b), predict)
    else:
        from mvsdet_tpu.models.mvsdet import MVSDet
        from mvsdet_tpu.training.loop import (create_train_state,
                                              make_jitted_train_step)

        model, state, tx = create_train_state(
            cfg, jax.random.PRNGKey(seed), batches[0], sweep_chunk=2,
            steps_per_epoch=1)
        step_fn = make_jitted_train_step(model, tx)

        predict = jax.jit(functools.partial(model.apply,
                                            method=MVSDet.predict),
                          static_argnums=(2,))

    def eval_map(state):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats,
                     "frozen": state.frozen}
        res = evaluate_scenes(lambda b: predict(variables, b, False),
                              scenes,
                              num_classes=cfg.model.head.n_classes)
        return res

    history = []
    t0 = time.time()
    for i in range(steps + 1):
        if i % eval_every == 0 or i == steps:
            res = eval_map(state)
            rec = {"step": i, "t": round(time.time() - t0, 1),
                   "mAP_0.25": round(res["mAP_0.25"], 4),
                   "mAP_0.50": round(res["mAP_0.50"], 4),
                   "mAR_0.25": round(res["mAR_0.25"], 4),
                   "psnr": round(res.get("psnr", 0.0), 2)}
            history.append(rec)
            log_fn(json.dumps(rec))
        if i == steps:
            break
        state, metrics = step_fn(state, batches[i % len(batches)])
        if i % 25 == 0:
            log_fn(json.dumps({"step": i,
                               "loss": round(float(metrics["loss"]), 4)}))
    return history


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--scenes", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--arkit", action="store_true",
                   help="7-dim yaw head + per-view intrinsics + "
                        "rotated-IoU eval")
    p.add_argument("--model", choices=["mvsdet", "nerfdet"],
                   default="mvsdet",
                   help="model family (nerfdet = legacy NeRF-MLP "
                        "supervision, ref nerfdet/nerfdet.py:20)")
    p.add_argument("--rotated-loss", choices=["rotated_iou", "decoupled"],
                   default=None,
                   help="override the ARKit box-loss mode for the A/B "
                        "(experiments/rotated_loss_ab.md)")
    p.add_argument("--costreg-norm", choices=["group", "batch"],
                   default="group",
                   help="CostRegNet norm for the GN-vs-BN A/B "
                        "(experiments/costreg_norm_ab.md)")
    p.add_argument("--out", default=None,
                   help="also append JSONL records to <out>/overfit_log.jsonl")
    args = p.parse_args()

    sink = None
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        sink = open(os.path.join(args.out, "overfit_log.jsonl"), "a")

    def log(line):
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()

    history = run(args.steps, args.eval_every, args.scenes, args.lr,
                  args.seed, log_fn=log, arkit=args.arkit,
                  model_family=args.model, costreg_norm=args.costreg_norm,
                  rotated_loss=args.rotated_loss)
    first, last = history[0], history[-1]
    log(json.dumps({"summary": {"first_mAP_0.25": first["mAP_0.25"],
                                "last_mAP_0.25": last["mAP_0.25"]}}))


if __name__ == "__main__":
    main()
