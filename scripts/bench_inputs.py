"""Shared synthetic inputs for the kernel microbenchmark scripts.

ScanNet-scale sweep workload constants (SURVEY §6): 40 views, feature
maps (60, 80, 256) at stride 4, 12 depth planes, k=2 neighbors.
(Formerly lived in bench.py; split out when bench.py became the
train-step-only driver harness.)
"""

import numpy as np

N_VIEWS = 40
HEIGHT, WIDTH, CHANNELS = 60, 80, 256
N_PLANES = 12
N_NEIGHBORS = 2
SWEEP_CHUNK = 8


def build_inputs(rng):
    import jax.numpy as jnp

    from mvsdet_tpu.config import scannet_config
    from mvsdet_tpu.data.synthetic import make_synthetic_scene
    from mvsdet_tpu.geometry.cameras import (full_projection,
                                             knn_camera_neighbors,
                                             scale_intrinsics)

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
