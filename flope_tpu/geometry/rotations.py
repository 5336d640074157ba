"""Rotation algebra on SO(3): quaternions, matrices, Euler zyx, slerp, Procrustes.

Pure JAX, fully batched (leading dims broadcast), jit/vmap/grad-safe. This is the
TPU-native replacement for the reference's mix of scipy / roma / hand-rolled
COLMAP conversions (reference: sunflower/utils/conversion.py, sunflower/utils/mvg.py).

Conventions
-----------
* ``quat`` means **xyzw** (scalar-last), matching ``scipy.spatial.transform.Rotation``.
  This is the convention used throughout the runtime pipeline.
* ``quat_wxyz`` means **wxyz** (scalar-first), the COLMAP convention. The reference
  keeps both and warns they differ (conversion.py:6-9); we keep them as separate,
  explicitly named functions so they can never be mixed silently.
* Euler angles are intrinsic z-y-x ("zyx"), in **degrees**, matching the reference's
  R2E/E2R (conversion.py:45-51) which delegate to scipy.
* All trig is float32 unless the caller passes float64 (CPU tests may use f64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quat_to_rotmat",
    "rotmat_to_quat",
    "quat_wxyz_to_rotmat",
    "rotmat_to_quat_wxyz",
    "euler_zyx_from_rotmat",
    "rotmat_from_euler_zyx",
    "special_procrustes",
    "nullify_yaw",
    "slerp",
    "quat_weighted_average",
    "quat_angle_deg",
    "rotation_geodesic_deg",
    "normalize_quat",
]


def normalize_quat(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternion(s) to unit length. Shape (..., 4)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """xyzw quaternion(s) -> rotation matrix(es).

    Matches scipy ``Rotation.from_quat(q).as_matrix()`` (normalizes input).
    q: (..., 4) -> (..., 3, 3).
    """
    q = normalize_quat(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix(es) -> xyzw quaternion(s), branchless (Shepperd's method).

    Matches scipy ``Rotation.from_matrix(R).as_quat()`` up to overall sign
    (quaternion double cover; scipy does not canonicalize by default either).
    R: (..., 3, 3) -> (..., 4).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate (unnormalized) quaternions, one per dominant component.
    qw = jnp.stack([tr + 1.0, m21 - m12, m02 - m20, m10 - m01], axis=-1)  # w dominant
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)
    # candidates in wxyz order; reorder to xyzw at the end.
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(
        jnp.stack([tr + 1.0, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22,
                   1.0 + m22 - m00 - m11], axis=-1),
        axis=-1,
    )
    del scores
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4cand, 4)
    q_wxyz = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    q_wxyz = q_wxyz / jnp.linalg.norm(q_wxyz, axis=-1, keepdims=True)
    return jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)


def quat_wxyz_to_rotmat(q: jax.Array) -> jax.Array:
    """COLMAP-convention wxyz quaternion(s) -> rotation matrix(es).

    Semantics of the reference ``qvec2rotmat_colmap`` (conversion.py:10-22):
    the expansion assumes a unit quaternion and does **not** normalize.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = jnp.stack(
        [
            1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y,
            2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x,
            2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y,
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat_wxyz(R: jax.Array) -> jax.Array:
    """Rotation matrix(es) -> wxyz quaternion with non-negative w.

    Matches the sign canonicalization of the reference ``rotmat2qvec_colmap``
    (conversion.py:25-37): flips so that w >= 0.
    """
    q = rotmat_to_quat(R)
    q_wxyz = jnp.concatenate([q[..., 3:], q[..., :3]], axis=-1)
    return jnp.where(q_wxyz[..., :1] < 0, -q_wxyz, q_wxyz)


def rotmat_from_euler_zyx(e_deg: jax.Array) -> jax.Array:
    """Extrinsic z-y-x Euler angles (degrees, order [z, y, x]) -> rotation matrix.

    scipy's lowercase 'zyx' is **extrinsic**: R = Rx(c) @ Ry(b) @ Rz(a) for
    angles [a, b, c]. Matches scipy ``from_euler('zyx', e, degrees=True)`` and
    the reference E2R (conversion.py:49-51).
    e_deg: (..., 3) -> (..., 3, 3).
    """
    a, b, c = (jnp.deg2rad(e_deg[..., i]) for i in range(3))
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    m = jnp.stack(
        [
            cb * ca, -cb * sa, sb,
            cc * sa + sc * sb * ca, cc * ca - sc * sb * sa, -sc * cb,
            sc * sa - cc * sb * ca, sc * ca + cc * sb * sa, cc * cb,
        ],
        axis=-1,
    )
    return m.reshape(e_deg.shape[:-1] + (3, 3))


def euler_zyx_from_rotmat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> extrinsic z-y-x Euler angles in degrees, order [z, y, x].

    Matches scipy ``as_euler('zyx', degrees=True)`` away from gimbal lock
    (|cos(pitch)| ~ 0); at exact lock the third angle is set to 0 (as scipy does).
    """
    sb = jnp.clip(R[..., 0, 2], -1.0, 1.0)
    b = jnp.arcsin(sb)
    cb_nonzero = jnp.abs(sb) < 1.0 - 1e-7
    a = jnp.where(
        cb_nonzero,
        jnp.arctan2(-R[..., 0, 1], R[..., 0, 0]),
        jnp.arctan2(R[..., 1, 0], R[..., 1, 1]),
    )
    c = jnp.where(cb_nonzero, jnp.arctan2(-R[..., 1, 2], R[..., 2, 2]), 0.0)
    return jnp.rad2deg(jnp.stack([a, b, c], axis=-1))


def nullify_yaw(R: jax.Array) -> jax.Array:
    """Zero the z (yaw) component of the extrinsic-zyx decomposition, closed form.

    Semantics of the reference nullify_yaw / nullify_yaw_batch (mvg.py:227-251):
    Euler-decompose R = Rx(c) Ry(b) Rz(a) (scipy 'zyx'), set a = 0. Since
    R @ Rz(-a) = Rx(c) Ry(b) exactly, we avoid the Euler round trip entirely:
    one atan2 and one 3x3 matmul. Flowers are yaw-symmetric, so yaw carries no
    information. R: (..., 3, 3) -> (..., 3, 3).
    """
    a = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    ca, sa = jnp.cos(a), jnp.sin(a)
    zero = jnp.zeros_like(ca)
    one = jnp.ones_like(ca)
    # Rz(-a) rows.
    rz_inv = jnp.stack(
        [ca, sa, zero, -sa, ca, zero, zero, zero, one], axis=-1
    ).reshape(R.shape[:-2] + (3, 3))
    return R @ rz_inv


def special_procrustes(M: jax.Array) -> jax.Array:
    """Project arbitrary 3x3 matrix(es) onto SO(3) (special orthogonal Procrustes).

    Semantics of roma.special_procrustes used by the reference 9D rotation head
    (conversion.py:54-58): M = U S V^T, R = U diag(1, 1, det(U V^T)) V^T — the
    closest rotation in Frobenius norm with det +1.
    M: (..., 3, 3) -> (..., 3, 3).
    """
    U, _, Vt = jnp.linalg.svd(M, full_matrices=False)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.ones(M.shape[:-2] + (3,), dtype=M.dtype)
    D = D.at[..., 2].set(det)
    return (U * D[..., None, :]) @ Vt


def slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation between xyzw quaternions, shortest path.

    Matches scipy ``Slerp`` semantics (used by the reference rot_average,
    mvg.py:365-384, and slerp_interpolate, mvg.py:269-293).
    q0, q1: (..., 4); t: broadcastable to (...,). Returns (..., 4) unit quats.
    """
    q0 = normalize_quat(q0)
    q1 = normalize_quat(q1)
    dot = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(dot[..., None] < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)
    # Near-parallel fallback: linear interpolation (then renormalize).
    use_lerp = sin_theta < 1e-6
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return normalize_quat(w0[..., None] * q0 + w1[..., None] * q1)


def quat_weighted_average(q_state: jax.Array, q_meas: jax.Array,
                          w_state: jax.Array, w_meas: jax.Array) -> jax.Array:
    """Weighted two-quaternion average via slerp at t = w_meas / (w_state + w_meas).

    Semantics of the reference rot_average (mvg.py:365-384), vectorized (the
    reference loops per row). Shapes: q_* (..., 4), w_* (...,).
    """
    t = w_meas / (w_state + w_meas)
    return slerp(q_state, q_meas, t)


def quat_angle_deg(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Geodesic angle between quaternions in degrees: 2*acos(|q1.q2|), in [0, 180].

    Matches the reference metric diff_quats (utils/loss.py:3-18) and
    quaternion_diff (scripts/generate_metrics_utils.py:88-112) — note the latter
    omits abs(); we follow diff_quats (abs) since both predictions and GT live in
    the double cover. Inputs are normalized first.
    """
    q1 = normalize_quat(q1)
    q2 = normalize_quat(q2)
    dot = jnp.clip(jnp.sum(q1 * q2, axis=-1), -1.0, 1.0)
    return 2.0 * jnp.arccos(jnp.abs(dot)) * (180.0 / jnp.pi)


def rotation_geodesic_deg(R1: jax.Array, R2: jax.Array) -> jax.Array:
    """Geodesic angle between rotation matrices in degrees."""
    tr = jnp.trace(jnp.swapaxes(R1, -1, -2) @ R2, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.rad2deg(jnp.arccos(cos))
