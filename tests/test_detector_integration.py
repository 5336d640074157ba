"""End-to-end: YOLO detector (untrained) fused with the pose tail.

With random weights detections are meaningless; these tests pin the CONTRACT:
shapes, finiteness, mask plumbing, and that the whole thing compiles as one
program. Detection quality is covered by eval-harness tests once a detector
is trained/distilled.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flope_tpu.data.synthetic import SyntheticScene, render_frame, orbit_camera
from flope_tpu.models import init_posenet
from flope_tpu.models.yolo import init_yolo
from flope_tpu.pipeline import PipelineConfig
from flope_tpu.pipeline.detector import yolo_detect, detect_and_pose, YoloJaxDetector


@pytest.fixture(scope="module")
def models():
    _, yolo_v = init_yolo(jax.random.PRNGKey(0), image_size=96)
    _, pose_v = init_posenet(jax.random.PRNGKey(1), image_size=48)
    return yolo_v, pose_v


@pytest.fixture(scope="module")
def frame_scene():
    rng = np.random.default_rng(0)
    scene = SyntheticScene.random(rng, n_flowers=3, height=120, width=160)
    return scene, render_frame(scene, orbit_camera(scene, 0.4), max_det=8)


class TestYoloDetect:
    def test_contract(self, models, frame_scene):
        yolo_v, _ = models
        scene, frame = frame_scene
        boxes, scores, valid, mask = yolo_detect(
            yolo_v, jnp.asarray(frame.rgb), det_size=96, max_det=8,
            score_th=0.9)  # high threshold: untrained net -> few/no dets
        assert boxes.shape == (8, 4) and valid.shape == (8,)
        assert mask.shape == frame.rgb.shape[:2]
        b = np.asarray(boxes)
        assert (b[:, 0] >= 0).all() and (b[:, 2] <= 160).all()
        assert (b[:, 1] >= 0).all() and (b[:, 3] <= 120).all()
        assert np.asarray(mask).min() >= 0 and np.asarray(mask).max() <= 255

    def test_detector_protocol(self, models, frame_scene):
        yolo_v, _ = models
        _, frame = frame_scene
        det = YoloJaxDetector(yolo_v, det_size=96, max_det=8)
        boxes, valid, mask = det.detect(frame.rgb)
        assert boxes.dtype == np.int32 and mask.dtype == np.uint8


class TestFusedDetectAndPose:
    def test_single_program_runs(self, models, frame_scene):
        yolo_v, pose_v = models
        scene, frame = frame_scene
        cfg = PipelineConfig(max_det=8, crop_size=48, erode_ksize=3,
                             min_depth_pixels=10)
        pred = detect_and_pose(
            yolo_v, pose_v, jnp.asarray(frame.rgb), jnp.asarray(frame.depth_mm),
            jnp.asarray(scene.K, jnp.float32), det_size=96, score_th=0.25,
            config=cfg)
        assert pred.poses.shape == (8, 4, 4)
        assert bool(jnp.isfinite(pred.poses).all())
        assert bool(jnp.isfinite(pred.rotmats).all())

    def test_jit_cache_stable(self, models, frame_scene):
        """Second call with same shapes must not retrace (static-shape design)."""
        yolo_v, pose_v = models
        scene, frame = frame_scene
        cfg = PipelineConfig(max_det=8, crop_size=48, erode_ksize=3,
                             min_depth_pixels=10)
        args = (yolo_v, pose_v, jnp.asarray(frame.rgb),
                jnp.asarray(frame.depth_mm), jnp.asarray(scene.K, jnp.float32))
        detect_and_pose(*args, det_size=96, config=cfg)
        n_before = detect_and_pose._cache_size()
        detect_and_pose(*args, det_size=96, config=cfg)
        assert detect_and_pose._cache_size() == n_before
