"""Crop-generator tests: scene dataset -> PoseNet training crops with correct GT."""

import numpy as np
import pytest

from flope_tpu.data.crop_generator import generate_crop_dataset
from flope_tpu.data.posenet_dataset import load_crop_dataset
from flope_tpu.data.synthetic import write_dataset


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("scene")
    write_dataset(out, n_frames=4, n_flowers=3, height=240, width=320, seed=1)
    return out


class TestCropGenerator:
    def test_generates_loadable_crops(self, scene_dir, tmp_path):
        n = generate_crop_dataset(scene_dir, tmp_path / "crops", crop_size=64)
        assert n >= 4  # several flowers visible over 4 frames
        data = load_crop_dataset(tmp_path / "crops", test=False)
        assert data["images"].shape[1:] == (64, 64, 3)
        assert data["images"].max() <= 1.0

    def test_gt_rotation_matches_scene(self, scene_dir, tmp_path):
        """The written quat must be the yaw-nullified camera-frame GT rotation."""
        import jax
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation as sciR

        from flope_tpu.geometry import invert_pose, nullify_yaw
        from flope_tpu.utils.io import DatasetPaths, load_pose, pth

        generate_crop_dataset(scene_dir, tmp_path / "c2", crop_size=32)
        data = DatasetPaths(scene_dir)
        gt_world = np.load(data.gt_poses)
        # Check one sample: parse its frame + flower index from the filename.
        import os
        fname = sorted(os.listdir(tmp_path / "c2" / "images"))[0]
        stem = fname.rsplit(".", 1)[0]
        frame_name = stem.split("_v")[0]
        gi = int(stem.rsplit("_", 1)[1])
        cam = load_pose(pth(data.pose, frame_name, "txt"))
        w2c = np.asarray(invert_pose(jnp.asarray(cam)))
        want_R = np.asarray(nullify_yaw(jnp.asarray((w2c @ gt_world[gi])[:3, :3])))
        qt = np.loadtxt(tmp_path / "c2" / "poses" / f"{stem}.txt", delimiter="\t")
        got_R = sciR.from_quat(qt[:4]).as_matrix()
        np.testing.assert_allclose(got_R, want_R, atol=1e-4)

    def test_augmented_variants(self, scene_dir, tmp_path):
        n0 = generate_crop_dataset(scene_dir, tmp_path / "a0", crop_size=32,
                                   augment_copies=0)
        n1 = generate_crop_dataset(scene_dir, tmp_path / "a1", crop_size=32,
                                   augment_copies=1, seed=3)
        assert n1 > n0


class TestLegacyDataset:
    def test_loader(self, tmp_path):
        from PIL import Image
        from flope_tpu.data.legacy_dataset import load_legacy_flower_dataset
        (tmp_path / "color").mkdir()
        (tmp_path / "poses_ba").mkdir()
        for i in range(3):
            Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
                tmp_path / "color" / f"{i}.png")
            np.savetxt(tmp_path / "poses_ba" / f"{i}.txt",
                       np.array([0, 0, 0, 1.0, 0.1, 0.2, 0.3]))
        d = load_legacy_flower_dataset(tmp_path)
        assert d["images"].shape == (3, 16, 16, 3)
        assert d["quats"].shape == (3, 4)
