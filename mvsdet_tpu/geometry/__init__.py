from mvsdet_tpu.geometry.cameras import (
    compute_projection,
    knn_camera_neighbors,
    nearest_pose_ids,
    scale_intrinsics,
    world_to_image,
)
from mvsdet_tpu.geometry.rays import (
    depth_scale_map,
    get_world_rays,
    pixel_ray_dirs,
    sample_image_grid,
)
from mvsdet_tpu.geometry.voxels import depth_plane_values, voxel_points
from mvsdet_tpu.geometry.transforms import build_covariance, quaternion_to_matrix
