"""Golden tests: flope_tpu.geometry.rotations vs scipy / numpy oracles.

Each test pins a behavior of the reference (sunflower/utils/conversion.py,
sunflower/utils/mvg.py) via the same third-party oracle the reference used.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as sciR, Slerp

import jax.numpy as jnp

from flope_tpu.geometry import (
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
)


def random_rotations(rng, n):
    return sciR.random(n, random_state=np.random.RandomState(rng.integers(1 << 30)))


def quats_close_up_to_sign(q1, q2, atol=1e-5):
    d = np.minimum(np.abs(q1 - q2).max(axis=-1), np.abs(q1 + q2).max(axis=-1))
    np.testing.assert_array_less(d, atol)


class TestQuatRotmat:
    def test_quat_to_rotmat_matches_scipy(self, rng):
        q = rng.normal(size=(64, 4))
        got = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        want = sciR.from_quat(q).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rotmat_to_quat_matches_scipy(self, rng):
        R = random_rotations(rng, 128).as_matrix()
        got = np.asarray(rotmat_to_quat(jnp.asarray(R)))
        want = sciR.from_matrix(R).as_quat()
        quats_close_up_to_sign(got, want)

    def test_rotmat_to_quat_near_identity_and_pi(self, rng):
        # Stress the branch selection: near-identity and near-180deg rotations.
        axes = rng.normal(size=(32, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        for ang in [1e-5, np.pi - 1e-5, np.pi]:
            R = sciR.from_rotvec(axes * ang).as_matrix()
            got = np.asarray(rotmat_to_quat(jnp.asarray(R)))
            want = sciR.from_matrix(R).as_quat()
            quats_close_up_to_sign(got, want, atol=1e-4)

    def test_roundtrip(self, rng):
        q = sciR.random(50, random_state=0).as_quat()
        R = quat_to_rotmat(jnp.asarray(q))
        q2 = np.asarray(rotmat_to_quat(R))
        quats_close_up_to_sign(q, q2)


class TestColmapConvention:
    """The reference keeps COLMAP wxyz variants separate (conversion.py:6-37)."""

    def _ref_qvec2rotmat_colmap(self, qvec):
        # Oracle: the documented COLMAP expansion (conversion.py:10-22).
        w, x, y, z = qvec
        return np.array([
            [1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * w * x],
            [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x**2 - 2 * y**2],
        ])

    def test_wxyz_to_rotmat(self, rng):
        q = rng.normal(size=(16, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        got = np.asarray(quat_wxyz_to_rotmat(jnp.asarray(q)))
        for i in range(16):
            np.testing.assert_allclose(got[i], self._ref_qvec2rotmat_colmap(q[i]), atol=1e-6)

    def test_rotmat_to_wxyz_sign_canonical(self, rng):
        R = random_rotations(rng, 64).as_matrix()
        got = np.asarray(rotmat_to_quat_wxyz(jnp.asarray(R)))
        assert (got[:, 0] >= 0).all()
        back = np.asarray(quat_wxyz_to_rotmat(jnp.asarray(got)))
        np.testing.assert_allclose(back, R, atol=1e-5)


class TestEulerZyx:
    def test_from_euler_matches_scipy(self, rng):
        e = rng.uniform(-179, 179, size=(64, 3))
        got = np.asarray(rotmat_from_euler_zyx(jnp.asarray(e)))
        want = sciR.from_euler("zyx", e, degrees=True).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_to_euler_matches_scipy(self, rng):
        R = random_rotations(rng, 128).as_matrix()
        got = np.asarray(euler_zyx_from_rotmat(jnp.asarray(R)))
        want = sciR.from_matrix(R).as_euler("zyx", degrees=True)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_roundtrip(self, rng):
        R = random_rotations(rng, 64).as_matrix()
        R2 = np.asarray(rotmat_from_euler_zyx(euler_zyx_from_rotmat(jnp.asarray(R))))
        np.testing.assert_allclose(R2, R, atol=1e-5)


class TestNullifyYaw:
    def test_matches_reference_euler_roundtrip(self, rng):
        """Reference nullify_yaw_batch (mvg.py:240-251): zyx Euler, zero z, back."""
        R = random_rotations(rng, 256).as_matrix()
        got = np.asarray(nullify_yaw(jnp.asarray(R)))
        e = sciR.from_matrix(R).as_euler("zyx", degrees=True)
        e[:, 0] = 0.0
        want = sciR.from_euler("zyx", e, degrees=True).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_result_has_zero_yaw_and_is_rotation(self, rng):
        R = random_rotations(rng, 64).as_matrix()
        out = np.asarray(nullify_yaw(jnp.asarray(R)))
        e = sciR.from_matrix(out).as_euler("zyx", degrees=True)
        np.testing.assert_allclose(e[:, 0], 0.0, atol=1e-4)
        eye = np.broadcast_to(np.eye(3), out.shape)
        np.testing.assert_allclose(out @ out.transpose(0, 2, 1), eye, atol=1e-4)

    def test_idempotent(self, rng):
        R = random_rotations(rng, 32).as_matrix()
        once = nullify_yaw(jnp.asarray(R))
        twice = nullify_yaw(once)
        np.testing.assert_allclose(np.asarray(once), np.asarray(twice), atol=1e-6)


class TestSpecialProcrustes:
    def _oracle(self, M):
        # roma.special_procrustes semantics: SVD projection with det correction.
        U, _, Vt = np.linalg.svd(M)
        d = np.linalg.det(U @ Vt)
        D = np.diag([1.0, 1.0, d])
        return U @ D @ Vt

    def test_projection_matches_svd_oracle(self, rng):
        M = rng.normal(size=(64, 3, 3))
        got = np.asarray(special_procrustes(jnp.asarray(M)))
        for i in range(64):
            np.testing.assert_allclose(got[i], self._oracle(M[i]), atol=1e-5)

    def test_output_in_so3(self, rng):
        M = rng.normal(size=(32, 3, 3))
        R = np.asarray(special_procrustes(jnp.asarray(M)))
        eye = np.broadcast_to(np.eye(3), R.shape)
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_fixed_point_on_rotations(self, rng):
        R = random_rotations(rng, 32).as_matrix()
        out = np.asarray(special_procrustes(jnp.asarray(R)))
        np.testing.assert_allclose(out, R, atol=1e-5)

    def test_negative_det_input(self, rng):
        # A reflection must map to a proper rotation, not a reflection.
        R = random_rotations(rng, 8).as_matrix()
        M = R.copy()
        M[:, :, 0] *= -1  # det < 0
        out = np.asarray(special_procrustes(jnp.asarray(M)))
        np.testing.assert_allclose(np.linalg.det(out), 1.0, atol=1e-5)


class TestSlerp:
    def test_matches_scipy_slerp(self, rng):
        for _ in range(8):
            r = random_rotations(rng, 2)
            q0, q1 = r.as_quat()
            ts = rng.uniform(0, 1, size=7)
            s = Slerp([0, 1], r)
            want = s(ts).as_quat()
            got = np.asarray(slerp(jnp.asarray(np.tile(q0, (7, 1))),
                                   jnp.asarray(np.tile(q1, (7, 1))),
                                   jnp.asarray(ts)))
            quats_close_up_to_sign(got, want, atol=1e-5)

    def test_endpoints(self, rng):
        r = random_rotations(rng, 2)
        q0, q1 = r.as_quat()
        g0 = np.asarray(slerp(jnp.asarray(q0), jnp.asarray(q1), 0.0))
        g1 = np.asarray(slerp(jnp.asarray(q0), jnp.asarray(q1), 1.0))
        quats_close_up_to_sign(g0[None], q0[None])
        quats_close_up_to_sign(g1[None], q1[None])

    def test_identical_quats(self, rng):
        q = random_rotations(rng, 1).as_quat()[0]
        out = np.asarray(slerp(jnp.asarray(q), jnp.asarray(q), 0.37))
        quats_close_up_to_sign(out[None], q[None])

    def test_weighted_average_matches_reference_rot_average(self, rng):
        """rot_average (mvg.py:365-384): slerp at t = w2/(w1+w2), per row."""
        n = 16
        r1 = random_rotations(rng, n)
        r2 = random_rotations(rng, n)
        w1 = rng.uniform(1, 100, size=n)
        w2 = rng.uniform(1, 100, size=n)
        want = []
        for i in range(n):
            s = Slerp([0, 1], sciR.concatenate([r1[i], r2[i]]))
            want.append(s([w2[i] / (w1[i] + w2[i])]).as_quat()[0])
        want = np.array(want)
        got = np.asarray(quat_weighted_average(
            jnp.asarray(r1.as_quat()), jnp.asarray(r2.as_quat()),
            jnp.asarray(w1), jnp.asarray(w2)))
        quats_close_up_to_sign(got, want, atol=1e-5)


class TestAngleMetrics:
    def test_quat_angle_matches_reference_diff_quats(self, rng):
        """diff_quats (utils/loss.py): 2*acos(|q1.q2|) in degrees."""
        q1 = random_rotations(rng, 64).as_quat()
        q2 = random_rotations(rng, 64).as_quat()
        got = np.asarray(quat_angle_deg(jnp.asarray(q1), jnp.asarray(q2)))
        dot = np.clip(np.abs(np.sum(q1 * q2, axis=-1)), -1, 1)
        want = 2 * np.arccos(dot) * 180 / np.pi
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_sign_invariance(self, rng):
        q1 = random_rotations(rng, 16).as_quat()
        q2 = random_rotations(rng, 16).as_quat()
        a = np.asarray(quat_angle_deg(jnp.asarray(q1), jnp.asarray(q2)))
        b = np.asarray(quat_angle_deg(jnp.asarray(-q1), jnp.asarray(q2)))
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_geodesic_consistency(self, rng):
        r1 = random_rotations(rng, 32)
        r2 = random_rotations(rng, 32)
        ang_R = np.asarray(rotation_geodesic_deg(
            jnp.asarray(r1.as_matrix()), jnp.asarray(r2.as_matrix())))
        ang_q = np.asarray(quat_angle_deg(
            jnp.asarray(r1.as_quat()), jnp.asarray(r2.as_quat())))
        np.testing.assert_allclose(ang_R, ang_q, atol=1e-2)
