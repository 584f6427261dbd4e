"""Pallas TPU kernels (fast paths for the hot ops).

Each kernel has an XLA twin used as the autodiff backward (remat-style)
and as the correctness oracle in tests; on CPU the kernels run in
interpret mode automatically.
"""

from mvsdet_tpu.ops.pallas.splat_kernel import composite_tiles  # noqa: F401
