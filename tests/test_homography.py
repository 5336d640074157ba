"""Homography augmentation vs cv2/numpy oracles (mvg.py:115-209 semantics)."""

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from scipy.spatial.transform import Rotation as sciR

from flope_tpu.geometry.homography import (
    rotation_matrix_xyz,
    rotation_homography,
    warp_perspective,
    transform_corners,
    rotate_image_and_poses,
)

K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])


class TestRotationMatrix:
    def test_matches_reference_composition(self, rng):
        """rotate_image builds R = Rz @ Ry @ Rx from radians (mvg.py:144-163)."""
        ang = rng.uniform(-30, 30, size=3)
        got = np.asarray(rotation_matrix_xyz(jnp.asarray(ang)))
        tx, ty, tz = np.radians(ang)
        Rx = np.array([[1, 0, 0], [0, np.cos(tx), -np.sin(tx)], [0, np.sin(tx), np.cos(tx)]])
        Ry = np.array([[np.cos(ty), 0, np.sin(ty)], [0, 1, 0], [-np.sin(ty), 0, np.cos(ty)]])
        Rz = np.array([[np.cos(tz), -np.sin(tz), 0], [np.sin(tz), np.cos(tz), 0], [0, 0, 1]])
        np.testing.assert_allclose(got, Rz @ Ry @ Rx, atol=1e-6)


class TestWarp:
    def test_matches_cv2_warp_perspective(self, rng):
        img = rng.integers(0, 256, size=(120, 160, 3)).astype(np.uint8)
        H, _ = rotation_homography(jnp.asarray(K), jnp.asarray([5.0, -7.0, 20.0]))
        Hn = np.asarray(H)
        want = cv2.warpPerspective(img, Hn, (160, 120)).astype(np.float32)
        got = np.asarray(warp_perspective(jnp.asarray(img, jnp.float32), H))
        # Interpolation implementations differ in subpixel rounding; demand
        # close agreement over the vast majority of pixels.
        diff = np.abs(got - want)
        assert np.median(diff) < 1.0
        assert (diff < 8).mean() > 0.97

    def test_identity_homography_is_noop(self, rng):
        img = rng.uniform(0, 255, size=(40, 50)).astype(np.float32)
        got = np.asarray(warp_perspective(jnp.asarray(img), jnp.eye(3)))
        np.testing.assert_allclose(got, img, atol=1e-3)

    def test_corners_match_cv2(self):
        H, _ = rotation_homography(jnp.asarray(K), jnp.asarray([3.0, 4.0, -10.0]))
        got = np.asarray(transform_corners(120, 160, H))
        pts = np.array([[0, 0], [159, 0], [159, 119], [0, 119]], np.float32)
        want = cv2.perspectiveTransform(pts.reshape(-1, 1, 2),
                                        np.asarray(H)).reshape(-1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


class TestPoseConsistency:
    def test_poses_rotate_with_camera(self, rng):
        """homography_transform: R' = R_rot R, t' = R_rot t (mvg.py:196-203)."""
        img = jnp.zeros((60, 80, 3))
        Rs = jnp.asarray(sciR.random(4, random_state=0).as_matrix())
        ts = jnp.asarray(rng.normal(size=(4, 3)))
        ang = jnp.asarray([4.0, -6.0, 30.0])
        _, _, Rs2, ts2, _ = rotate_image_and_poses(img, jnp.asarray(K), ang,
                                                   Rs=Rs, ts=ts)
        R_rot = np.asarray(rotation_matrix_xyz(ang))
        np.testing.assert_allclose(np.asarray(Rs2), R_rot @ np.asarray(Rs),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(ts2),
                                   (R_rot @ np.asarray(ts).T).T, atol=1e-5)

    def test_projection_consistency(self, rng):
        """A 3-D point projected into the warped image must land where the
        homography maps its original projection — the augmentation's whole
        point (virtual camera rotation)."""
        pt3 = np.array([[0.1, -0.05, 1.2]])
        H, R = rotation_homography(jnp.asarray(K), jnp.asarray([3.0, 2.0, 15.0]))
        # Original projection.
        uv = (K @ pt3.T).T
        uv = uv[:, :2] / uv[:, 2:]
        # Projection after rotating the point into the virtual camera.
        pt3r = (np.asarray(R) @ pt3.T).T
        uv_r = (K @ pt3r.T).T
        uv_r = uv_r[:, :2] / uv_r[:, 2:]
        # Homography applied to the original projection.
        p = np.asarray(H) @ np.array([uv[0, 0], uv[0, 1], 1.0])
        np.testing.assert_allclose(p[:2] / p[2], uv_r[0], rtol=1e-5)
