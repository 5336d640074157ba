"""Homography-based rotation augmentation, pure JAX.

The reference's training-data augmentation rotates the camera virtually:
H = K R K^-1 applied with cv2.warpPerspective, poses updated by R_rot @ R
(mvg.py:115-209 rotate_image/homography_transform; used by
flower_attn_dataset.py:120-131 and posenet_data_generator.py:234-245).
Here the warp is an inverse-map bilinear gather (jittable, vmappable) so the
augmentation can live inside the training input pipeline on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flope_tpu.geometry.rotations import rotmat_from_euler_zyx

__all__ = ["rotation_matrix_xyz", "rotation_homography", "warp_perspective",
           "transform_corners", "rotate_image_and_poses"]


def rotation_matrix_xyz(angles_deg: jax.Array) -> jax.Array:
    """R = Rz @ Ry @ Rx from (theta_x, theta_y, theta_z) degrees
    (rotate_image's convention, mvg.py:144-163 — NOT the zyx-Euler one)."""
    tx, ty, tz = (jnp.deg2rad(angles_deg[..., i]) for i in range(3))
    cx, sx = jnp.cos(tx), jnp.sin(tx)
    cy, sy = jnp.cos(ty), jnp.sin(ty)
    cz, sz = jnp.cos(tz), jnp.sin(tz)
    # Rz @ Ry @ Rx expanded.
    m = jnp.stack([
        cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx,
        sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx,
        -sy, cy * sx, cy * cx,
    ], axis=-1)
    return m.reshape(angles_deg.shape[:-1] + (3, 3))


def rotation_homography(K: jax.Array, angles_deg: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(H, R) with H = K R K^-1 (mvg.py:166-167)."""
    from flope_tpu.geometry.camera import invert_intrinsics

    R = rotation_matrix_xyz(angles_deg)
    H = K @ R @ invert_intrinsics(K)
    return H, R


@functools.partial(jax.jit, static_argnames=())
def warp_perspective(image: jax.Array, H: jax.Array) -> jax.Array:
    """cv2.warpPerspective semantics: out(p) = in(H^-1 p), bilinear, zero fill.

    image: (H, W) or (H, W, C) float. Same output size as input.
    """
    squeeze = image.ndim == 2
    img = image[..., None] if squeeze else image
    h, w = img.shape[0], img.shape[1]
    Hinv = jnp.linalg.inv(H)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ones = jnp.ones_like(xs)
    src = jnp.einsum("ij,jhw->ihw", Hinv, jnp.stack([xs, ys, ones]))
    sx = src[0] / src[2]
    sy = src[1] / src[2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def gather(yi, xi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = img[yi_c, xi_c]
        return jnp.where(inb[..., None], vals, 0.0)

    out = ((1 - fx)[..., None] * (1 - fy)[..., None] * gather(y0, x0)
           + fx[..., None] * (1 - fy)[..., None] * gather(y0, x0 + 1)
           + (1 - fx)[..., None] * fy[..., None] * gather(y0 + 1, x0)
           + fx[..., None] * fy[..., None] * gather(y0 + 1, x0 + 1))
    return out[..., 0] if squeeze else out


def transform_corners(h: int, w: int, H: jax.Array) -> jax.Array:
    """Image corners under H, (4, 2) in TL, TR, BR, BL order (mvg.py:115-141)."""
    corners = jnp.asarray([[0.0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]])
    p = jnp.concatenate([corners, jnp.ones((4, 1))], axis=1) @ H.T
    return p[:, :2] / p[:, 2:3]


def rotate_image_and_poses(image: jax.Array, K: jax.Array,
                           angles_deg: jax.Array,
                           Rs: jax.Array | None = None,
                           ts: jax.Array | None = None,
                           mask: jax.Array | None = None):
    """Full homography_transform (mvg.py:182-209): warp image (+mask),
    rotate object poses into the virtual camera: R' = R_rot R, t' = R_rot t.
    Returns (image_w, mask_w, Rs_new, ts_new, corners)."""
    H, R_rot = rotation_homography(K, angles_deg)
    img_w = warp_perspective(image, H)
    mask_w = warp_perspective(mask, H) if mask is not None else None
    Rs_new = R_rot @ Rs if Rs is not None else None
    ts_new = (ts @ R_rot.T) if ts is not None else None
    corners = transform_corners(image.shape[0], image.shape[1], H)
    return img_w, mask_w, Rs_new, ts_new, corners
