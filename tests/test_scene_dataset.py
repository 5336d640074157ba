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


class TestDiskSceneSample:
    """The reference's real-capture path: depth npy x splat scale, detection-
    dir visibility matching (flower_attn_dataset.py:33-37,61-69,184-195)."""

    @pytest.fixture(scope="class")
    def dataset_dir(self, tmp_path_factory):
        from flope_tpu.data.synthetic import write_dataset

        out = tmp_path_factory.mktemp("scene_disk")
        write_dataset(out, n_frames=6, n_flowers=4, height=240, width=320,
                      seed=3, with_detections=True)
        return out

    def test_disk_sample_contract(self, dataset_dir, rng):
        import json

        from flope_tpu.data.scene_dataset import (load_splat_scale,
                                                  make_scene_sample_from_disk)
        from flope_tpu.utils.io import DatasetPaths

        data = DatasetPaths(dataset_dir)
        assert load_splat_scale(dataset_dir) == 1.0  # no transforms json
        got_one = False
        for name in data.files:
            s = make_scene_sample_from_disk(data, name, rng,
                                            SceneSampleConfig(crop_size=128))
            if s is None:
                continue
            got_one = True
            assert s.image.shape == (128, 128, 3)
            assert s.mask.shape == (128, 128)
            assert s.depth.shape == (128, 128)
            assert s.poses.shape == (15, 4, 4)
            assert s.valid.sum() == s.n
            # GT poses land inside the crop when projected with K_crop.
            t = s.poses[:s.n, :3, 3]
            uv = (s.K_crop @ t.T).T
            uv = uv[:, :2] / uv[:, 2:]
            assert (uv >= -20).all() and (uv <= 148).all()
        assert got_one

    def test_splat_scale_applied(self, dataset_dir, rng, tmp_path):
        """dataparser_transforms.json scale divides into depth values."""
        import json
        import shutil

        from flope_tpu.data.scene_dataset import (load_splat_scale,
                                                  make_scene_sample_from_disk)
        from flope_tpu.utils.io import DatasetPaths

        scaled = tmp_path / "scaled"
        shutil.copytree(dataset_dir, scaled)
        (scaled / "dataparser_transforms.json").write_text(
            json.dumps({"scale": 0.5}))
        assert load_splat_scale(scaled) == 2.0

        data = DatasetPaths(scaled)
        rng_a = np.random.default_rng(7)
        rng_b = np.random.default_rng(7)
        base = DatasetPaths(dataset_dir)
        for name in data.files:
            a = make_scene_sample_from_disk(base, name, rng_a,
                                            SceneSampleConfig(crop_size=128))
            b = make_scene_sample_from_disk(data, name, rng_b,
                                            SceneSampleConfig(crop_size=128))
            if a is None or b is None:
                continue
            # Depth map is multiplied by 1/scale = 2.
            np.testing.assert_allclose(b.depth, a.depth * 2.0, rtol=1e-5)
            return
        pytest.skip("no sample drawn")
