"""Golden tests for camera geometry + box ops vs numpy oracles implementing the
reference semantics (sunflower/utils/mvg.py)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sciR

from flope_tpu.geometry import (
    pixel_to_camera,
    points3d_from_ray_depth,
    camera_to_world_points,
    pose_cam_to_world,
    project_3d_to_2d,
    crop_intrinsics,
    pose_matrix,
    invert_pose,
    intrinsics_matrix,
    invert_intrinsics,
    opengl_to_opencv_c2w,
    opencv_to_opengl_c2w,
    squarify_boxes,
    boxes_in_frame,
    filter_very_large_boxes,
    box_centers,
    clamp_square_boxes,
    masked_median,
)

K_REF = np.array([[1751.28, 0, 957.98], [0, 1756.39, 529.39], [0, 0, 1.0]])


# ---------- numpy oracles transliterating the reference semantics ----------

def ref_get_points3d(uv, zray, K):
    """mvg.py:387-408 — distance-along-ray depth lifting."""
    n = uv.shape[0]
    uv1 = np.hstack([uv, np.ones((n, 1))])
    xn = (np.linalg.inv(K) @ uv1.T).T
    z = zray / np.linalg.norm(xn, axis=1)
    return xn * z[:, None]


def ref_squarify(bb):
    """mvg.py:324-346."""
    xmin, ymin, xmax, ymax = bb
    xrange, yrange = xmax - xmin, ymax - ymin
    diff = abs(xrange - yrange)
    if diff % 2 == 0:
        dec = inc = diff / 2
    else:
        dec, inc = (diff + 1) / 2, (diff - 1) / 2
    if xrange > yrange:
        ymin -= dec
        ymax += inc
    elif xrange < yrange:
        xmin -= dec
        xmax += inc
    return [int(xmin), int(ymin), int(xmax), int(ymax)]


def ref_get_square_bb_clamp(sbb, h, w):
    """generate_metrics_utils.py:156-176 shifting semantics."""
    sbb = list(sbb)
    if sbb[0] < 0:
        sbb[2] -= sbb[0]
        sbb[0] = 0
    if sbb[1] < 0:
        sbb[3] -= sbb[1]
        sbb[1] = 0
    if sbb[2] > w:
        sbb[0] -= sbb[2] - w
        sbb[2] = w
    if sbb[3] > h:
        sbb[1] -= sbb[3] - h
        sbb[3] = h
    return sbb


class TestLifting:
    def test_ray_depth_matches_reference(self, rng):
        uv = rng.uniform(0, [1920, 1080], size=(20, 2))
        z = rng.uniform(0.1, 2.5, size=20)
        got = np.asarray(points3d_from_ray_depth(jnp.asarray(uv), jnp.asarray(z), jnp.asarray(K_REF)))
        want = ref_get_points3d(uv, z, K_REF)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_ray_depth_norm_is_distance(self, rng):
        """The lifted point's Euclidean distance must equal the ray depth."""
        uv = rng.uniform(0, [1920, 1080], size=(10, 2))
        z = rng.uniform(0.1, 2.5, size=10)
        xyz = np.asarray(points3d_from_ray_depth(jnp.asarray(uv), jnp.asarray(z), jnp.asarray(K_REF)))
        np.testing.assert_allclose(np.linalg.norm(xyz, axis=1), z, rtol=1e-5)

    def test_reprojection_roundtrip(self, rng):
        uv = rng.uniform(100, 900, size=(10, 2))
        z = rng.uniform(0.3, 2.0, size=10)
        xyz = points3d_from_ray_depth(jnp.asarray(uv), jnp.asarray(z), jnp.asarray(K_REF))
        uv2 = np.asarray(project_3d_to_2d(xyz, jnp.asarray(K_REF), jnp.eye(3), jnp.zeros(3)))
        np.testing.assert_allclose(uv2, uv, rtol=1e-4, atol=1e-2)

    def test_z_depth_variant(self, rng):
        uv = rng.uniform(0, 1000, size=(8, 2))
        d = rng.uniform(0.2, 2.0, size=8)
        got = np.asarray(pixel_to_camera(jnp.asarray(uv), jnp.asarray(d), jnp.asarray(K_REF)))
        uv1 = np.hstack([uv, np.ones((8, 1))]) * d[:, None]
        want = (np.linalg.inv(K_REF) @ uv1.T).T
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        # z-depth: third coordinate equals d
        np.testing.assert_allclose(got[:, 2], d, rtol=1e-5)

    def test_invert_intrinsics(self):
        got = np.asarray(invert_intrinsics(jnp.asarray(K_REF)))
        np.testing.assert_allclose(got, np.linalg.inv(K_REF), rtol=1e-6, atol=1e-9)


class TestPoses:
    def test_cam_to_world(self, rng):
        R = sciR.random(random_state=1).as_matrix()
        t = rng.normal(size=3)
        cam = np.asarray(pose_matrix(jnp.asarray(R), jnp.asarray(t)))
        obj = np.asarray(pose_matrix(jnp.asarray(sciR.random(5, random_state=2).as_matrix()),
                                     jnp.asarray(rng.normal(size=(5, 3)))))
        got = np.asarray(pose_cam_to_world(jnp.asarray(obj), jnp.asarray(cam)))
        np.testing.assert_allclose(got, cam @ obj, rtol=1e-5, atol=1e-6)

    def test_camera_to_world_points(self, rng):
        T = np.asarray(pose_matrix(jnp.asarray(sciR.random(random_state=3).as_matrix()),
                                   jnp.asarray(rng.normal(size=3))))
        pts = rng.normal(size=(12, 3))
        got = np.asarray(camera_to_world_points(jnp.asarray(pts), jnp.asarray(T)))
        want = (T @ np.hstack([pts, np.ones((12, 1))]).T).T[:, :3]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_invert_pose(self, rng):
        T = np.asarray(pose_matrix(jnp.asarray(sciR.random(random_state=4).as_matrix()),
                                   jnp.asarray(rng.normal(size=3))))
        Ti = np.asarray(invert_pose(jnp.asarray(T)))
        np.testing.assert_allclose(Ti @ T, np.eye(4), atol=1e-6)

    def test_opengl_opencv_roundtrip(self, rng):
        """Reference's flips (conversion.py:79-102) are mutually inverse."""
        T = np.asarray(pose_matrix(jnp.asarray(sciR.random(random_state=5).as_matrix()),
                                   jnp.asarray(rng.normal(size=3))))
        back = np.asarray(opencv_to_opengl_c2w(opengl_to_opencv_c2w(jnp.asarray(T))))
        np.testing.assert_allclose(back, T, atol=1e-6)

    def test_opengl_to_opencv_matches_reference(self, rng):
        def ref(pose):
            pose = pose.copy()
            pose[2, :] *= -1
            pose = pose[np.array([1, 0, 2, 3]), :]
            pose[0:3, 1:3] *= -1
            return pose
        T = np.asarray(pose_matrix(jnp.asarray(sciR.random(random_state=6).as_matrix()),
                                   jnp.asarray(rng.normal(size=3))))
        got = np.asarray(opengl_to_opencv_c2w(jnp.asarray(T)))
        np.testing.assert_allclose(got, ref(T), atol=1e-6)


class TestCropIntrinsics:
    def test_matches_reference(self):
        """mvg.py:254-266 (incl. the K[2,2]=1 restore after scaling)."""
        K = K_REF
        offset = (100.0, 220.0)
        scale = 512.0 / 300.0
        want = K.copy()
        want[0, 2] -= offset[0]
        want[1, 2] -= offset[1]
        want = want * scale
        want[2, 2] = 1.0
        got = np.asarray(crop_intrinsics(jnp.asarray(K), jnp.asarray(offset), scale))
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestBoxes:
    def test_squarify_matches_reference(self, rng):
        bbs = rng.integers(0, 800, size=(200, 2))
        sizes = rng.integers(1, 400, size=(200, 2))
        boxes = np.concatenate([bbs, bbs + sizes], axis=1).astype(np.int32)
        got = np.asarray(squarify_boxes(jnp.asarray(boxes)))
        for i in range(200):
            assert got[i].tolist() == ref_squarify(boxes[i].tolist()), boxes[i]

    def test_squarify_is_square(self, rng):
        boxes = rng.integers(0, 500, size=(50, 4)).astype(np.int32)
        boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:] - boxes[:, :2]) + 1
        got = np.asarray(squarify_boxes(jnp.asarray(boxes)))
        np.testing.assert_array_equal(got[:, 2] - got[:, 0], got[:, 3] - got[:, 1])

    def test_in_frame_semantics(self):
        h, w = 1080, 1920
        cases = [
            ([0, 0, 1920, 1080], True),   # exactly full frame: in (exclusive slicing)
            ([-1, 0, 100, 100], False),
            ([0, -1, 100, 100], False),
            ([0, 0, 1921, 100], False),
            ([0, 0, 100, 1081], False),
            ([5, 5, 10, 10], True),
        ]
        boxes = jnp.asarray([c[0] for c in cases])
        got = np.asarray(boxes_in_frame(boxes, h, w))
        assert got.tolist() == [c[1] for c in cases]

    def test_filter_very_large_matches_reference(self, rng):
        for _ in range(20):
            n = int(rng.integers(1, 16))
            boxes = np.zeros((16, 4), np.int32)
            wh = rng.integers(5, 200, size=(n, 2))
            boxes[:n, :2] = rng.integers(0, 500, size=(n, 2))
            boxes[:n, 2:] = boxes[:n, :2] + wh
            valid = np.arange(16) < n
            got = np.asarray(filter_very_large_boxes(jnp.asarray(boxes), jnp.asarray(valid)))
            # Reference oracle (mvg.py:357-362)
            b = boxes[:n]
            area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            keep = ~(area > 5 * np.median(area))
            assert got[:n].tolist() == keep.tolist()
            assert not got[n:].any()

    def test_masked_median_even_odd(self):
        x = jnp.asarray([3.0, 1.0, 2.0, 99.0])
        assert float(masked_median(x, jnp.asarray([True, True, True, False]))) == 2.0
        assert float(masked_median(x, jnp.asarray([True, True, False, False]))) == 2.0
        assert float(masked_median(x, jnp.asarray([False] * 4))) == 0.0

    def test_box_centers(self):
        got = np.asarray(box_centers(jnp.asarray([[10, 20, 30, 60]])))
        np.testing.assert_allclose(got, [[20.0, 40.0]])

    def test_clamp_square_matches_reference(self, rng):
        h, w = 1080, 1920
        for _ in range(100):
            size = int(rng.integers(10, 600))
            x0 = int(rng.integers(-300, w))
            y0 = int(rng.integers(-300, h))
            sbb = [x0, y0, x0 + size, y0 + size]
            got = np.asarray(clamp_square_boxes(jnp.asarray([sbb]), h, w))[0]
            want = ref_get_square_bb_clamp(sbb, h, w)
            assert got.tolist() == want
