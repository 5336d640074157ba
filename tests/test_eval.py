"""Eval metric tests vs transliterated reference oracles + harness smoke."""

import numpy as np
import pytest
import jax

from scipy.spatial.transform import Rotation as sciR

from flope_tpu.eval import (
    MetricThresholds,
    MetricAccumulator,
    match_detections,
    quaternion_diff_deg,
    dice_score,
    restrict_mask_to_boxes,
    EvalConfig,
    evaluate_pipeline,
)
from flope_tpu.models import init_posenet
from flope_tpu.pipeline import PipelineConfig


class TestMatchDetections:
    def test_matches_kdtree_oracle(self, rng):
        from scipy.spatial import cKDTree
        gt = rng.uniform(0, 1000, size=(6, 2))
        pred = rng.uniform(0, 1000, size=(9, 2))
        idx, dist = match_detections(gt, pred)
        tree = cKDTree(pred)
        want_d, want_i = tree.query(gt)
        np.testing.assert_array_equal(idx, want_i)
        np.testing.assert_allclose(dist, want_d, rtol=1e-6)

    def test_empty_preds(self):
        idx, dist = match_detections(np.zeros((3, 2)), np.zeros((0, 2)))
        assert (idx == -1).all() and np.isinf(dist).all()


class TestQuaternionDiff:
    def test_sign_sensitive_matches_reference_eval(self, rng):
        """generate_metrics_utils.quaternion_diff has NO abs — reproduce."""
        q1 = sciR.random(8, random_state=0).as_quat()
        q2 = -q1  # same rotation, opposite sign
        d = quaternion_diff_deg(q1, q2, absolute=False)
        np.testing.assert_allclose(d, 360.0, atol=1e-3)  # sign-sensitive: 2*acos(-1)
        d_abs = quaternion_diff_deg(q1, q2, absolute=True)
        np.testing.assert_allclose(d_abs, 0.0, atol=1e-2)


class TestDice:
    def test_known_overlap(self):
        a = np.zeros((10, 10)); a[:5] = 1
        b = np.zeros((10, 10)); b[2:7] = 1
        # inter=30, total=100 -> dice 0.6
        assert dice_score(a, b) == pytest.approx(0.6)

    def test_both_empty_is_one(self):
        assert dice_score(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0

    def test_restrict_mask(self):
        m = np.ones((20, 20))
        out = restrict_mask_to_boxes(m, np.array([[5, 5, 10, 10]]))
        assert out.sum() == 25
        assert out[5:10, 5:10].all()


class TestAccumulator:
    def test_thresholds_applied(self):
        acc = MetricAccumulator(MetricThresholds())
        q = sciR.from_euler("y", 10, degrees=True).as_quat()
        q_bad = sciR.from_euler("y", 120, degrees=True).as_quat()
        qi = sciR.identity().as_quat()
        acc.add_frame(
            gt_centers=np.array([[100., 100], [300., 300], [600., 600]]),
            gt_quats=np.stack([qi, qi, qi]),
            gt_trans=np.array([[0, 0, 1.0], [0, 0, 1.0], [0, 0, 1.0]]),
            pred_centers=np.array([[105., 100], [300., 295], [640., 600]]),
            pred_quats=np.stack([q, q_bad, qi]),
            pred_trans=np.array([[0, 0, 1.02], [0, 0, 1.5], [0, 0, 1.0]]),
            pred_reliable=np.array([True, True, True]),
        )
        s = acc.summary()
        # third GT at 40px -> unmatched; of 2 matches: one good pose, one fails both
        assert s["detection_success_rate"] == pytest.approx(2 / 3)
        assert s["pose_success_rate"] == pytest.approx(1 / 2)
        assert s["rotation_angle_error_deg"] == pytest.approx(10.0, abs=0.2)
        assert s["translation_error_cm"] == pytest.approx(2.0, abs=0.1)


class TestHarness:
    def test_gt_detector_translation_near_exact(self):
        """With GT boxes/masks and an untrained PoseNet, detection and
        translation metrics must already be excellent (geometry is exact);
        rotation is random -> large or filtered out."""
        _, variables = init_posenet(jax.random.key(0), image_size=48)
        cfg = PipelineConfig(max_det=8, crop_size=48, erode_ksize=3,
                             min_depth_pixels=10)
        s = evaluate_pipeline(variables, cfg,
                              EvalConfig(n_frames=6, n_flowers=4,
                                         height=240, width=320, max_det=8))
        assert s["detection_success_rate"] > 0.8
        assert s["translation_error_cm"] < 1.0
        assert s["frames"] == 6
