"""Integration tests: the fused pipeline on synthetic scenes with exact GT.

Mirrors the reference's de-facto integration test (generate_metrics.py) but
with a synthetic world where translation ground truth is exact: the pipeline
must recover flower centers from depth + box geometry to millimeters.
Rotation fidelity needs a trained PoseNet and is covered by the training and
eval-harness tests; here rotation outputs are checked structurally (SO(3),
yaw-nullified, finite in padded lanes).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flope_tpu.data.synthetic import SyntheticScene, render_frame, orbit_camera
from flope_tpu.models import init_posenet
from flope_tpu.pipeline import PipelineConfig, predict_frame, predict_frames, PosePredictor

MAX_DET = 8
CFG = PipelineConfig(max_det=MAX_DET, crop_size=64, depth_scale=1e-3,
                     near_plane=0.1, far_plane=2.5)


@pytest.fixture(scope="module")
def posenet_vars():
    _, variables = init_posenet(jax.random.key(0), image_size=64)
    return variables


@pytest.fixture(scope="module")
def scene_frame():
    rng = np.random.default_rng(7)
    scene = SyntheticScene.random(rng, n_flowers=4, height=240, width=320)
    frame = render_frame(scene, orbit_camera(scene, 0.3), max_det=MAX_DET)
    return scene, frame


def run_pipeline(variables, scene, frame, config=CFG):
    return predict_frame(
        variables,
        jnp.asarray(frame.rgb),
        jnp.asarray(frame.depth_mm),
        jnp.asarray(frame.boxes),
        jnp.asarray(frame.valid),
        jnp.asarray(frame.mask),
        jnp.asarray(scene.K, jnp.float32),
        config,
    )


class TestFusedPipeline:
    def test_valid_slots_and_counts(self, posenet_vars, scene_frame):
        scene, frame = scene_frame
        pred = run_pipeline(posenet_vars, scene, frame)
        got_valid = np.asarray(pred.valid)
        assert got_valid.sum() >= 1
        # Padded lanes must be invalid.
        assert not got_valid[frame.valid.sum():].any()
        assert int(pred.num_valid) == got_valid.sum()

    def test_translation_recovery(self, posenet_vars, scene_frame):
        """Depth-lift must recover GT camera-frame centers (mm-level)."""
        scene, frame = scene_frame
        pred = run_pipeline(posenet_vars, scene, frame)
        v = np.asarray(pred.valid)
        got_t = np.asarray(pred.poses)[v, :3, 3]
        want_t = frame.gt_poses_cam[v, :3, 3]
        err = np.linalg.norm(got_t - want_t, axis=1)
        assert err.max() < 0.01, f"translation errors {err}"

    def test_rotations_structurally_valid(self, posenet_vars, scene_frame):
        from scipy.spatial.transform import Rotation as sciR
        scene, frame = scene_frame
        pred = run_pipeline(posenet_vars, scene, frame)
        R = np.asarray(pred.rotmats)
        assert np.isfinite(R).all()
        eye = np.broadcast_to(np.eye(3), R.shape)
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-4)
        e = sciR.from_matrix(R).as_euler("zyx", degrees=True)
        np.testing.assert_allclose(e[:, 0], 0.0, atol=1e-2)  # yaw-nullified

    def test_unreliable_depth_invalidated(self, posenet_vars, scene_frame):
        """A box over background (no mask pixels) must be dropped, like the
        reference's depth_reliable filter (pose_predictor.py:125-127)."""
        scene, frame = scene_frame
        boxes = frame.boxes.copy()
        valid = frame.valid.copy()
        slot = int(valid.sum())
        boxes[slot] = [2, 2, 40, 40]  # background corner
        valid[slot] = True
        pred = predict_frame(
            posenet_vars, jnp.asarray(frame.rgb), jnp.asarray(frame.depth_mm),
            jnp.asarray(boxes), jnp.asarray(valid), jnp.asarray(frame.mask),
            jnp.asarray(scene.K, jnp.float32), CFG)
        assert not bool(pred.valid[slot])

    def test_out_of_frame_square_invalidated(self, posenet_vars, scene_frame):
        """A tall box flush with the frame edge squarifies out of frame and
        must be dropped (pose_predictor.py:102-104)."""
        scene, frame = scene_frame
        boxes = frame.boxes.copy()
        valid = frame.valid.copy()
        slot = int(valid.sum())
        boxes[slot] = [0, 10, 10, 200]  # squarify pushes xmin negative
        valid[slot] = True
        pred = predict_frame(
            posenet_vars, jnp.asarray(frame.rgb), jnp.asarray(frame.depth_mm),
            jnp.asarray(boxes), jnp.asarray(valid), jnp.asarray(frame.mask),
            jnp.asarray(scene.K, jnp.float32), CFG)
        assert not bool(pred.valid[slot])

    def test_empty_frame(self, posenet_vars, scene_frame):
        scene, frame = scene_frame
        pred = predict_frame(
            posenet_vars, jnp.asarray(frame.rgb), jnp.asarray(frame.depth_mm),
            jnp.zeros((MAX_DET, 4), jnp.int32), jnp.zeros(MAX_DET, bool),
            jnp.zeros_like(jnp.asarray(frame.mask)),
            jnp.asarray(scene.K, jnp.float32), CFG)
        assert int(pred.num_valid) == 0
        assert bool(jnp.isfinite(pred.poses).all())

    def test_batched_matches_single(self, posenet_vars, scene_frame):
        scene, frame = scene_frame
        rgb = jnp.asarray(np.stack([frame.rgb, frame.rgb]))
        dep = jnp.asarray(np.stack([frame.depth_mm, frame.depth_mm]))
        box = jnp.asarray(np.stack([frame.boxes, frame.boxes]))
        val = jnp.asarray(np.stack([frame.valid, frame.valid]))
        msk = jnp.asarray(np.stack([frame.mask, frame.mask]))
        batched = predict_frames(posenet_vars, rgb, dep, box, val, msk,
                                 jnp.asarray(scene.K, jnp.float32), CFG)
        single = run_pipeline(posenet_vars, scene, frame)
        np.testing.assert_allclose(np.asarray(batched.poses[0]),
                                   np.asarray(single.poses), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(batched.valid[0]),
                                      np.asarray(single.valid))


    def test_pallas_crop_backend_matches_xla(self, posenet_vars, scene_frame):
        """predict_frames with crop_backend='pallas' (interpret-mode kernel on
        CPU) must agree with the XLA backend: identical validity, poses
        within the crop machinery's +-1 uint8 LSB contract propagated through
        the untrained PoseNet."""
        import dataclasses
        scene, frame = scene_frame
        rgb = jnp.asarray(np.stack([frame.rgb, frame.rgb]))
        dep = jnp.asarray(np.stack([frame.depth_mm, frame.depth_mm]))
        box = jnp.asarray(np.stack([frame.boxes, frame.boxes]))
        val = jnp.asarray(np.stack([frame.valid, frame.valid]))
        msk = jnp.asarray(np.stack([frame.mask, frame.mask]))
        K = jnp.asarray(scene.K, jnp.float32)
        cfg_x = dataclasses.replace(CFG, crop_region=128)
        cfg_p = dataclasses.replace(CFG, crop_region=128,
                                    crop_backend="pallas")
        a = predict_frames(posenet_vars, rgb, dep, box, val, msk, K, cfg_x)
        b = predict_frames(posenet_vars, rgb, dep, box, val, msk, K, cfg_p)
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
        np.testing.assert_allclose(np.asarray(a.poses), np.asarray(b.poses),
                                   atol=0.05)
        np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                                   atol=1e-6)

    def test_planar_stem_matches_nhwc(self, posenet_vars, scene_frame):
        """planar_stem=True feeds the Pallas kernel's native NCHW crops into
        an NCHW-stem PoseNet — identical params, so poses must match the
        NHWC pallas path to float tolerance (the stem conv is the same
        contraction with relayout folded in)."""
        import dataclasses
        scene, frame = scene_frame
        rgb = jnp.asarray(np.stack([frame.rgb, frame.rgb]))
        dep = jnp.asarray(np.stack([frame.depth_mm, frame.depth_mm]))
        box = jnp.asarray(np.stack([frame.boxes, frame.boxes]))
        val = jnp.asarray(np.stack([frame.valid, frame.valid]))
        msk = jnp.asarray(np.stack([frame.mask, frame.mask]))
        K = jnp.asarray(scene.K, jnp.float32)
        cfg_n = dataclasses.replace(CFG, crop_region=128,
                                    crop_backend="pallas")
        cfg_p = dataclasses.replace(cfg_n, planar_stem=True)
        a = predict_frames(posenet_vars, rgb, dep, box, val, msk, K, cfg_n)
        b = predict_frames(posenet_vars, rgb, dep, box, val, msk, K, cfg_p)
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
        np.testing.assert_allclose(np.asarray(a.poses), np.asarray(b.poses),
                                   atol=1e-4)


class FrameDetector:
    """Test detector handing out precomputed boxes+mask (the contract any
    detector — YOLO-JAX or host teacher — fulfills)."""

    def __init__(self, frame):
        self.frame = frame

    def detect(self, rgb):
        return self.frame.boxes, self.frame.valid, self.frame.mask


class TestPosePredictorWrapper:
    def test_reference_compatible_api(self, posenet_vars, scene_frame):
        scene, frame = scene_frame
        pred = PosePredictor(posenet_vars, FrameDetector(frame), scene.K, CFG)
        poses = pred.get_flower_poses(frame.rgb, frame.depth_mm)
        assert poses is not None
        assert poses.ndim == 3 and poses.shape[1:] == (4, 4)

    def test_none_on_empty(self, posenet_vars, scene_frame):
        scene, frame = scene_frame

        class EmptyDetector:
            def detect(self, rgb):
                return (np.zeros((MAX_DET, 4), np.int32),
                        np.zeros(MAX_DET, bool),
                        np.zeros_like(frame.mask))

        pred = PosePredictor(posenet_vars, EmptyDetector(), scene.K, CFG)
        assert pred.get_flower_poses(frame.rgb, frame.depth_mm) is None
