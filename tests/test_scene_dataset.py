"""Scene-dataset + crop-sampling tests (FlowerAttnDataset semantics)."""

import numpy as np
import pytest

from flope_tpu.data.sampling import (
    shrink_quadrilateral,
    point_in_quad,
    sample_point_in_quad,
    sample_rectangle,
)
from flope_tpu.data.scene_dataset import SceneSampleConfig, make_scene_sample
from flope_tpu.data.synthetic import SyntheticScene


class TestSampling:
    def test_shrink_square(self):
        quad = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], float)
        inner = shrink_quadrilateral(quad, 10)
        want = np.array([[10, 10], [90, 10], [90, 90], [10, 90]], float)
        # order may rotate; compare as sets of rows
        got = sorted(map(tuple, inner.round(5)))
        assert got == sorted(map(tuple, want))

    def test_point_in_quad(self):
        quad = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], float)
        assert point_in_quad(np.array([50, 50]), quad)
        assert not point_in_quad(np.array([150, 50]), quad)

    def test_sampled_points_inside(self, rng):
        quad = np.array([[10, 5], [120, 20], [110, 110], [0, 90]], float)
        for _ in range(20):
            p = sample_point_in_quad(quad, rng)
            assert p is not None and point_in_quad(p, quad)

    def test_sampled_rectangle_inside_quad(self, rng):
        quad = np.array([[0, 0], [200, 10], [190, 200], [5, 190]], float)
        for _ in range(10):
            rect = sample_rectangle(quad, 50, 50, rng)
            assert rect is not None
            corners = np.array([[rect[0], rect[1]], [rect[2], rect[1]],
                                [rect[2], rect[3]], [rect[0], rect[3]]])
            for c in corners:
                assert point_in_quad(c, quad), (rect, c)

    def test_impossible_rectangle_returns_none(self, rng):
        quad = np.array([[0, 0], [30, 0], [30, 30], [0, 30]], float)
        assert sample_rectangle(quad, 100, 100, rng) is None


class TestSceneSample:
    def test_sample_contract(self, rng):
        scene = SyntheticScene.random(rng, n_flowers=4, height=240, width=320)
        cfg = SceneSampleConfig(max_poses=15, crop_size=128)
        got_one = False
        for k in range(8):
            s = make_scene_sample(scene, 0.3 + 0.2 * k, rng, cfg)
            if s is None:
                continue
            got_one = True
            assert s.image.shape == (128, 128, 3)
            assert s.poses.shape == (15, 4, 4)
            assert s.valid.sum() == s.n <= 15
            # yaw-nullified GT (zyx z = 0)
            from scipy.spatial.transform import Rotation as sciR
            if s.n:
                e = sciR.from_matrix(s.poses[:s.n, :3, :3]).as_euler(
                    "zyx", degrees=True)
                np.testing.assert_allclose(e[:, 0], 0.0, atol=1e-3)
            # crop intrinsics: principal point shifted by the crop origin
            assert s.K_crop[0, 2] <= scene.K[0, 2]
        assert got_one

    def test_visible_poses_project_into_crop(self, rng):
        scene = SyntheticScene.random(rng, n_flowers=5, height=240, width=320)
        cfg = SceneSampleConfig(max_poses=15, crop_size=160)
        for k in range(6):
            s = make_scene_sample(scene, 0.5 + 0.3 * k, rng, cfg)
            if s is None or s.n == 0:
                continue
            t = s.poses[:s.n, :3, 3]
            uv = (s.K_crop @ t.T).T
            uv = uv[:, :2] / uv[:, 2:]
            assert (uv >= -1).all() and (uv[:, 0] <= 161).all() \
                and (uv[:, 1] <= 161).all()
            return
        pytest.skip("no visible sample drawn")
