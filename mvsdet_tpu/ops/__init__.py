from mvsdet_tpu.ops.sampling import bilinear_sample, bilinear_resize
from mvsdet_tpu.ops.plane_sweep import plane_sweep_variance, homography_warp
from mvsdet_tpu.ops.voxel_lift import lift_features_to_voxels
from mvsdet_tpu.ops.nms import aligned_3d_nms
