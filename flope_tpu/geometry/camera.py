"""Projective camera geometry: lifting, projection, frame changes, intrinsics.

Pure JAX, batched. TPU-native replacement for the reference's numpy geometry
(sunflower/utils/mvg.py, sunflower/utils/conversion.py:61-102).

The single most important semantic detail, inherited from the reference
(mvg.py:387-408): sensor depth is treated as **distance along the pixel ray**,
not as z-depth. ``points3d_from_ray_depth`` divides by ||K^-1 [u v 1]|| before
scaling; ``pixel_to_camera`` is the plain z-depth variant (mvg.py:27-46).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "make_homogeneous",
    "intrinsics_matrix",
    "invert_intrinsics",
    "pixel_to_camera",
    "points3d_from_ray_depth",
    "camera_to_world_points",
    "pose_cam_to_world",
    "project_3d_to_2d",
    "crop_intrinsics",
    "pose_matrix",
    "invert_pose",
    "opengl_to_opencv_c2w",
    "opencv_to_opengl_c2w",
]


def make_homogeneous(points: jax.Array) -> jax.Array:
    """Append a ones column: (..., N, D) -> (..., N, D+1). (mvg.py:12-25)"""
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    return jnp.concatenate([points, ones], axis=-1)


def intrinsics_matrix(fx, fy, cx, cy, dtype=jnp.float32) -> jax.Array:
    """Build a 3x3 pinhole K from scalars."""
    K = jnp.zeros((3, 3), dtype=dtype)
    K = K.at[0, 0].set(fx).at[1, 1].set(fy)
    K = K.at[0, 2].set(cx).at[1, 2].set(cy).at[2, 2].set(1.0)
    return K


def invert_intrinsics(K: jax.Array) -> jax.Array:
    """Closed-form inverse of an upper-triangular pinhole K (zero skew assumed
    by every K in the reference; general 3x3 inv would also be fine on TPU)."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    inv = jnp.stack(
        [1.0 / fx, zero, -cx / fx,
         zero, 1.0 / fy, -cy / fy,
         zero, zero, one],
        axis=-1,
    )
    return inv.reshape(K.shape[:-2] + (3, 3))


def pixel_to_camera(uv: jax.Array, d: jax.Array, K: jax.Array) -> jax.Array:
    """Pixels + z-depth -> camera coordinates. (mvg.py:27-46)

    uv: (..., N, 2), d: (..., N), K: (3, 3) -> (..., N, 3).
    """
    uv1 = make_homogeneous(uv) * d[..., None]
    return uv1 @ invert_intrinsics(K).swapaxes(-1, -2)


def points3d_from_ray_depth(uv: jax.Array, d_ray: jax.Array, K: jax.Array) -> jax.Array:
    """Pixels + distance-along-ray depth -> camera coordinates.

    Semantics of the reference get_points3d (mvg.py:387-408): normalize the ray
    direction K^-1 [u v 1] to unit length before scaling by the measured
    distance. Plain z-depth here would silently bias translations outward from
    the principal point.
    uv: (..., N, 2), d_ray: (..., N), K: (3, 3) -> (..., N, 3).
    """
    uv1 = make_homogeneous(uv)
    xn = uv1 @ invert_intrinsics(K).swapaxes(-1, -2)  # (..., N, 3): [xn, yn, 1]
    norm = jnp.linalg.norm(xn, axis=-1)
    z = d_ray / norm
    return xn * z[..., None]


def camera_to_world_points(xyz: jax.Array, cam_pose: jax.Array) -> jax.Array:
    """Camera-frame points -> world frame via 4x4 camera pose. (mvg.py:49-77)"""
    xyz1 = make_homogeneous(xyz)
    out = xyz1 @ cam_pose.swapaxes(-1, -2)
    return out[..., :3]


def pose_cam_to_world(obj_pose: jax.Array, cam_pose: jax.Array) -> jax.Array:
    """Object pose in camera frame -> world frame: cam_pose @ obj_pose.
    (mvg.py:416-422). obj_pose: (..., 4, 4), cam_pose: (4, 4)."""
    return cam_pose @ obj_pose


def project_3d_to_2d(points: jax.Array, K: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Project world/object points to pixels. (mvg.py:66-77)

    points: (..., N, 3), K/R: (3, 3), t: (3,) -> (..., N, 2).
    """
    cam = points @ R.swapaxes(-1, -2) + t
    proj = cam @ K.swapaxes(-1, -2)
    return proj[..., :2] / proj[..., 2:3]


def crop_intrinsics(K: jax.Array, offset_xy: jax.Array, scale) -> jax.Array:
    """Intrinsics of a crop-then-uniform-resize of the image. (mvg.py:254-266)

    offset_xy = (xmin, ymin) of the crop; scale = out_size / crop_size.
    The bottom-right 1 must stay 1 after scaling (the reference has a loud
    comment about exactly this bug class).
    """
    K = K.astype(jnp.result_type(K.dtype, jnp.float32))
    K2 = K.at[0, 2].add(-offset_xy[0]).at[1, 2].add(-offset_xy[1])
    K2 = K2 * scale
    return K2.at[2, 2].set(1.0)


def pose_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3) + (..., 3) -> (..., 4, 4) homogeneous pose. (conversion.py:61-76)"""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=top.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def invert_pose(T: jax.Array) -> jax.Array:
    """Invert rigid 4x4 pose(s) without a general solve: [R^T, -R^T t]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = R.swapaxes(-1, -2)
    return pose_matrix(Rt, -(Rt @ t[..., None])[..., 0])


def opengl_to_opencv_c2w(pose: jax.Array) -> jax.Array:
    """OpenGL camera-to-world -> OpenCV camera-to-world. (conversion.py:92-102)

    Unlike the reference, does not mutate in place (JAX arrays are immutable).
    """
    pose = pose.at[..., 2, :].multiply(-1)
    pose = pose[..., jnp.array([1, 0, 2, 3]), :]
    return pose.at[..., 0:3, 1:3].multiply(-1)


def opencv_to_opengl_c2w(pose: jax.Array) -> jax.Array:
    """OpenCV camera-to-world -> OpenGL camera-to-world. (conversion.py:79-90)"""
    pose = pose.at[..., 0:3, 1:3].multiply(-1)
    pose = pose[..., jnp.array([1, 0, 2, 3]), :]
    return pose.at[..., 2, :].multiply(-1)
