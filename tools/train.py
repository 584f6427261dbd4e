#!/usr/bin/env python
"""Training launcher.

Equivalent of the reference `tools/train.py` + `tools/dist_train.sh`
(ref: tools/train.py:77-159): builds the config, data pipeline, model,
and runs the epoch loop — here a functional JAX loop with a
('data', 'view') mesh instead of mmengine Runner + DDP.

Usage:
  python tools/train.py --infos data/scannet/scannet_infos_train_new.pkl \
      --data-root data/scannet --work-dir work_dirs/mvsdet \
      --data-parallel 1 --view-parallel 1
  python tools/train.py --synthetic 8   # no dataset: synthetic smoke run
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train MVSDet-TPU")
    p.add_argument("--model", choices=["mvsdet", "nerfdet"],
                   default="mvsdet",
                   help="model family: the flagship MVSDet or the legacy "
                        "NeRF-Det (the reference trains both, "
                        "nerfdet/nerfdet.py:20 vs mvsdet.py:122)")
    p.add_argument("--infos", help="path to *_infos_train_new.pkl")
    p.add_argument("--data-root", default="", help="dataset root")
    p.add_argument("--work-dir", default="work_dirs/mvsdet")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic scenes instead of a dataset")
    p.add_argument("--tiny", action="store_true",
                   help="tiny_test_config shapes (CPU smoke / parity runs)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None,
                   help="override total steps (debug)")
    p.add_argument("--data-parallel", type=int, default=1)
    p.add_argument("--view-parallel", type=int, default=1)
    p.add_argument("--sweep-chunk", type=int, default=8)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="compute dtype; params/optimizer stay fp32 — the "
                        "reference's AMP option (ref tools/train.py:104-114)."
                        " bfloat16 is the benched TPU configuration")
    p.add_argument("--n-views", type=int, default=None,
                   help="override views per scene")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", default=None, help="checkpoint to resume")
    p.add_argument("--pretrained", default=None,
                   help="torchvision resnet50 checkpoint (.pth/.npz) for "
                        "backbone init (ref torchvision://resnet50, "
                        "mvsdet_res50_2x_low_res_depth.py:25)")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--val-infos", default=None,
                   help="path to *_infos_val_new.pkl: evaluate each epoch "
                        "and keep the best-by-mAP@0.25 checkpoint (ref "
                        "val_cfg + CheckpointHook save_best, "
                        "mvsdet_res50_2x_low_res.py:164-172)")
    p.add_argument("--val-synthetic", type=int, default=0,
                   help="evaluate on N synthetic scenes each epoch")
    p.add_argument("--val-max-scenes", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvsdet_tpu.config import scannet_config
    from mvsdet_tpu.parallel import multihost
    from mvsdet_tpu.training.loop import (create_train_state, load_checkpoint,
                                          load_pretrained_backbone,
                                          save_checkpoint)

    # multi-host: no-op single host; with MVSDET_COORDINATOR /
    # MVSDET_NUM_PROCESSES / MVSDET_PROCESS_ID set, joins the job
    # (the reference's dist_train.sh NNODES/MASTER_ADDR path)
    multihost.initialize()

    if args.tiny:
        from mvsdet_tpu.config import tiny_test_config
        cfg = tiny_test_config()
    else:
        cfg = scannet_config()
    if args.lr is not None:
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, lr=args.lr))

    n_views = args.n_views or cfg.data.n_views_train
    n_targets = cfg.data.nerf_target_views_train
    n_src = n_views - n_targets

    if args.synthetic:
        from mvsdet_tpu.data.synthetic import make_synthetic_scene

        scenes = [make_synthetic_scene(cfg, seed=s, n_views=n_src,
                                       n_targets=n_targets)
                  for s in range(args.synthetic)]

        def batch_iter():
            i = 0
            while True:
                yield {k: jnp.asarray(v) for k, v in
                       scenes[i % len(scenes)].items()}
                i += 1

        steps_per_epoch = len(scenes)
    else:
        from mvsdet_tpu.data.infos import load_infos
        from mvsdet_tpu.data.pipeline import ScenePipeline, scene_iterator

        infos = load_infos(args.infos, args.data_root, cfg.data.classes)
        pipeline = ScenePipeline(cfg, training=True)
        steps_per_epoch = len(infos) * cfg.data.repeat

        def batch_iter():
            for b in scene_iterator(infos, pipeline, seed=args.seed,
                                    repeat=0):
                yield {k: jnp.asarray(v) for k, v in b.items()}

    epochs = args.epochs or cfg.optim.max_epochs
    total_steps = args.steps or epochs * steps_per_epoch

    it = batch_iter()
    example = next(it)
    if args.model == "nerfdet":
        from mvsdet_tpu.training.loop import create_nerfdet_state

        if args.data_parallel * args.view_parallel > 1:
            raise SystemExit("--model nerfdet supports single-device "
                             "training only (like the reference's "
                             "per-GPU NerfDet; shard scenes with "
                             "separate processes instead)")
        model, state, tx = create_nerfdet_state(
            cfg, jax.random.PRNGKey(args.seed), example,
            steps_per_epoch=steps_per_epoch, dtype=getattr(jnp, args.dtype))
    else:
        model, state, tx = create_train_state(
            cfg, jax.random.PRNGKey(args.seed), example,
            steps_per_epoch=steps_per_epoch, sweep_chunk=args.sweep_chunk,
            dtype=getattr(jnp, args.dtype))
    if args.pretrained:
        state = load_pretrained_backbone(state, args.pretrained)
        print(f"loaded pretrained backbone from {args.pretrained}")
    if args.resume:
        state = load_checkpoint(args.resume, state)

    os.makedirs(args.work_dir, exist_ok=True)

    n_dp, n_vp = args.data_parallel, args.view_parallel
    if args.model == "nerfdet":
        from mvsdet_tpu.training.loop import make_jitted_nerfdet_step

        step_fn = make_jitted_nerfdet_step(model, tx, base_seed=args.seed)

        def next_batch():
            return next(it)
    elif n_dp * n_vp > 1:
        from mvsdet_tpu.parallel.mesh import make_mesh
        from mvsdet_tpu.parallel.sharding import (batch_pspecs,
                                                  make_sharded_train_step,
                                                  shard_batch)

        n_proc = jax.process_count()
        if n_proc > 1:
            # data axis spans hosts: each host feeds its own scenes
            assert n_dp % n_proc == 0, (n_dp, n_proc)
            mesh = multihost.make_global_mesh(data=n_dp, view=n_vp)
            n_local = n_dp // n_proc
        else:
            mesh = make_mesh(data=n_dp, view=n_vp)
            n_local = n_dp

        def stack(batches):
            return {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}

        example_g = stack([example] * n_dp)
        step_fn = make_sharded_train_step(model, tx, mesh, example_g)
        specs = batch_pspecs(example_g)

        def next_batch():
            local = stack([next(it) for _ in range(n_local)])
            if n_proc > 1:
                import numpy as np

                return multihost.host_local_batch_to_global(
                    {k: np.asarray(v) for k, v in local.items()}, mesh,
                    specs)
            return shard_batch(local, mesh)
    else:
        from mvsdet_tpu.training.loop import make_jitted_train_step

        step_fn = make_jitted_train_step(model, tx)

        def next_batch():
            return next(it)

    # overlap host staging of batch i+1 with the device step i (the
    # reference gets this from DataLoader num_workers; SURVEY §3.4)
    from mvsdet_tpu.data.prefetch import Prefetcher

    next_batch = Prefetcher(next_batch)

    # ---- per-epoch validation + best-by-mAP@0.25 checkpoint ----------
    val_scenes = None
    if args.val_synthetic:
        from mvsdet_tpu.data.synthetic import make_synthetic_scene

        nv_test = cfg.data.n_views_test
        val_scenes = [
            make_synthetic_scene(cfg, seed=5000 + s,
                                 n_views=nv_test
                                 - cfg.data.nerf_target_views_test,
                                 n_targets=cfg.data.nerf_target_views_test)
            for s in range(args.val_synthetic)]
    elif args.val_infos:
        from mvsdet_tpu.data.infos import load_infos
        from mvsdet_tpu.data.pipeline import ScenePipeline

        val_infos = load_infos(args.val_infos, args.data_root,
                               cfg.data.classes)
        if args.val_max_scenes:
            val_infos = val_infos[: args.val_max_scenes]
        val_pipeline = ScenePipeline(cfg, training=False)

        def val_scenes_fn():
            # per-scene-keyed rng: deterministic regardless of scene count
            return [val_pipeline(s, np.random.RandomState(args.seed + i))
                    for i, s in enumerate(val_infos)]

    # one jitted predict core reused across every epoch eval — building
    # a fresh jax.jit closure per eval would recompile (~minutes on a
    # tunneled TPU) each epoch
    if args.model == "nerfdet":
        from mvsdet_tpu.models.nerfdet import NerfDetLegacy

        @jax.jit
        def predict_core(variables, batch):
            return model.apply(variables, batch,
                               method=NerfDetLegacy.predict)
    else:
        from mvsdet_tpu.models.mvsdet import MVSDet

        @jax.jit
        def predict_core(variables, batch):
            return model.apply(variables, batch, False,
                               method=MVSDet.predict)

    def run_eval(state):
        from mvsdet_tpu.evaluation.harness import evaluate_scenes

        scenes = val_scenes if val_scenes is not None else val_scenes_fn()
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats,
                     "frozen": state.frozen}
        return evaluate_scenes(lambda b: predict_core(variables, b), scenes,
                               num_classes=cfg.model.head.n_classes)

    do_eval = bool(args.val_synthetic or args.val_infos)
    best_map = -1.0

    log_path = os.path.join(args.work_dir, "train_log.jsonl")
    t_start = time.time()
    first_batch = example if n_dp * n_vp == 1 else None
    for i in range(total_steps):
        batch = (first_batch if (i == 0 and first_batch is not None)
                 else next_batch())
        state, metrics = step_fn(state, batch)
        if i % 10 == 0 or i == total_steps - 1:
            rec = {"step": i, "time": round(time.time() - t_start, 1),
                   **{k: float(v) for k, v in metrics.items()}}
            print(json.dumps(rec), flush=True)
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if (i + 1) % steps_per_epoch == 0 or i == total_steps - 1:
            save_checkpoint(os.path.join(args.work_dir, "latest"), state)
            if do_eval:
                results = run_eval(state)
                rec = {"step": i, "eval": {k: round(float(v), 4)
                                           for k, v in results.items()}}
                print(json.dumps(rec), flush=True)
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                if results.get("mAP_0.25", 0.0) > best_map:
                    best_map = results["mAP_0.25"]
                    save_checkpoint(os.path.join(args.work_dir, "best"),
                                    state)
    print("done:", total_steps, "steps",
          ("best mAP@0.25: %.4f" % best_map) if do_eval else "")


if __name__ == "__main__":
    main()
