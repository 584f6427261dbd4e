"""mvsdet_tpu — a TPU-native multi-view 3D detection framework.

A from-scratch JAX/XLA/Pallas re-design of the MVSDet pipeline
(multi-view indoor 3D object detection from posed RGB images with
plane-sweep probabilistic depth and Gaussian-splatting novel-view
supervision; reference: Pixie8888/MVSDet, NeurIPS 2024).

Layout:
  geometry/   pure-jnp camera/ray/voxel/SH math
  ops/        compute kernels (XLA reference impls + Pallas TPU kernels)
  models/     flax modules: backbone, FPN, cost regularization, 3D neck,
              detection heads, gaussian adapter, the MVSDet flagship model
  parallel/   mesh + shard_map view/data-parallel training step
  data/       host-side data pipeline (pkl infos, samplers, synthetic scenes)
  training/   optimizer, schedules, train loop, checkpointing
  evaluation/ indoor mAP, NVS metrics
"""

__version__ = "0.1.0"
