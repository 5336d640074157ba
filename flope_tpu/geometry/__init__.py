"""Pure-JAX geometry core: rotations, camera models, box math.

This is layer L0 of the framework (see SURVEY.md §1) — no dependencies beyond
jax/numpy, golden-tested against scipy/cv2 oracles.
"""

from flope_tpu.geometry.rotations import (
    quat_to_rotmat,
    rotmat_to_quat,
    quat_wxyz_to_rotmat,
    rotmat_to_quat_wxyz,
    euler_zyx_from_rotmat,
    rotmat_from_euler_zyx,
    special_procrustes,
    nullify_yaw,
    slerp,
    quat_weighted_average,
    quat_angle_deg,
    rotation_geodesic_deg,
    normalize_quat,
)
from flope_tpu.geometry.camera import (
    make_homogeneous,
    intrinsics_matrix,
    invert_intrinsics,
    pixel_to_camera,
    points3d_from_ray_depth,
    camera_to_world_points,
    pose_cam_to_world,
    project_3d_to_2d,
    crop_intrinsics,
    pose_matrix,
    invert_pose,
    opengl_to_opencv_c2w,
    opencv_to_opengl_c2w,
)
from flope_tpu.geometry.boxes import (
    squarify_boxes,
    boxes_in_frame,
    filter_very_large_boxes,
    box_centers,
    clamp_square_boxes,
    masked_median,
)
