"""The reference-defined metric suite (scripts/generate_metrics.py + utils).

Definitions and thresholds reproduced exactly (SURVEY.md §6 contract):

* Detection: pred center matched to projected GT center by nearest neighbor;
  success iff distance < 20 px (generate_metrics.py:199-215,
  generate_metrics_utils.py:82-85). Rate = matched GT / visible GT; px error
  averaged over matches.
* Rotation angle error (deg): quaternion geodesic 2*acos(q1.q2)
  (generate_metrics_utils.py:88-112 — NOTE: the reference's eval variant does
  NOT take |dot|, unlike its training metric; we reproduce that faithfully and
  also expose the abs variant), aggregated over matches with error < 60 deg
  (generate_metrics.py:47,337-341).
* Translation error (cm): ||t_gt - t_pred||, depth-reliable matches only,
  aggregated over matches < 10 cm (generate_metrics.py:46,261-286).
* Pose success rate: angle < 60 deg AND trans < 10 cm (generate_metrics.py:289-294).
* Segmentation DICE: 2|A.B| / (|A|+|B|), with the teacher mask restricted to
  the student-visible boxes (generate_metrics.py:185-194,
  generate_metrics_utils.py:135-154).
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["MetricThresholds", "match_detections", "quaternion_diff_deg",
           "dice_score", "restrict_mask_to_boxes", "PoseMetrics",
           "MetricAccumulator"]


@dataclasses.dataclass(frozen=True)
class MetricThresholds:
    """generate_metrics.py:44-48."""

    detection_px: float = 20.0
    angle_deg: float = 60.0
    trans_cm: float = 10.0


def match_detections(gt_centers: np.ndarray, pred_centers: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
    """For each GT center, index + distance of the nearest predicted center
    (find_closest, generate_metrics_utils.py:82-85). Empty preds -> dist inf."""
    if len(pred_centers) == 0:
        return (np.full(len(gt_centers), -1, int),
                np.full(len(gt_centers), np.inf))
    d = np.linalg.norm(gt_centers[:, None] - pred_centers[None], axis=-1)
    idx = np.argmin(d, axis=1)
    return idx, d[np.arange(len(gt_centers)), idx]


def quaternion_diff_deg(q1: np.ndarray, q2: np.ndarray,
                        absolute: bool = False) -> np.ndarray:
    """2*acos(q1.q2) in degrees, normalized inputs.

    absolute=False reproduces the eval harness (quaternion_diff,
    generate_metrics_utils.py:88-112) which is sign-sensitive; absolute=True
    is the training metric (diff_quats, utils/loss.py).
    """
    q1 = q1 / np.linalg.norm(q1, axis=-1, keepdims=True)
    q2 = q2 / np.linalg.norm(q2, axis=-1, keepdims=True)
    dot = np.clip(np.sum(q1 * q2, axis=-1), -1.0, 1.0)
    if absolute:
        dot = np.abs(dot)
    return 2.0 * np.arccos(dot) * 180.0 / np.pi


def dice_score(mask1: np.ndarray, mask2: np.ndarray) -> float:
    """(generate_metrics_utils.py:135-154); both empty -> 1.0."""
    m1 = mask1.astype(np.float64)
    m2 = mask2.astype(np.float64)
    inter = float(np.sum(m1 * m2))
    total = float(np.sum(m1) + np.sum(m2))
    return 1.0 if total == 0 else 2.0 * inter / total


def restrict_mask_to_boxes(mask: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Zero the mask outside the union of boxes (the reference compares the
    SAM mask only where YOLO sees flowers, generate_metrics.py:185-194)."""
    out = np.zeros_like(mask)
    for (x0, y0, x1, y1) in np.asarray(boxes, int):
        out[max(y0, 0):max(y1, 0), max(x0, 0):max(x1, 0)] = \
            mask[max(y0, 0):max(y1, 0), max(x0, 0):max(x1, 0)]
    return out


@dataclasses.dataclass
class PoseMetrics:
    """Aggregated results (mirrors the all_metrics.pkl payload +
    rich summary panel of generate_metrics.py:303-359)."""

    n_frames: int = 0
    n_gt: int = 0
    n_det_matched: int = 0
    det_px_errors: list = dataclasses.field(default_factory=list)
    angle_errors: list = dataclasses.field(default_factory=list)
    trans_errors_cm: list = dataclasses.field(default_factory=list)
    n_pose_success: int = 0
    n_pose_evaluated: int = 0
    dice_scores: list = dataclasses.field(default_factory=list)

    def summary(self) -> dict:
        def m(x):
            return float(np.mean(x)) if len(x) else float("nan")

        return {
            "frames": self.n_frames,
            "detection_success_rate": (self.n_det_matched / self.n_gt
                                       if self.n_gt else float("nan")),
            "detection_px_error": m(self.det_px_errors),
            "rotation_angle_error_deg": m(self.angle_errors),
            "translation_error_cm": m(self.trans_errors_cm),
            "pose_success_rate": (self.n_pose_success / self.n_pose_evaluated
                                  if self.n_pose_evaluated else float("nan")),
            "mask_dice": m(self.dice_scores),
        }


class MetricAccumulator:
    """Per-frame accumulation with the reference's thresholds."""

    def __init__(self, thresholds: MetricThresholds = MetricThresholds()):
        self.th = thresholds
        self.metrics = PoseMetrics()

    def add_frame(self, gt_centers, gt_quats, gt_trans,
                  pred_centers, pred_quats, pred_trans, pred_reliable,
                  student_mask=None, teacher_mask=None, student_boxes=None):
        """All arrays already compacted to visible/valid entries.

        gt_*: (G, ...) ground truth (centers px, quats xyzw, trans meters).
        pred_*: (P, ...) predictions; pred_reliable: (P,) depth reliability.
        """
        m = self.metrics
        m.n_frames += 1
        g = len(gt_centers)
        m.n_gt += g
        if g == 0:
            return
        idx, dist = match_detections(np.asarray(gt_centers),
                                     np.asarray(pred_centers))
        matched = dist < self.th.detection_px
        m.n_det_matched += int(matched.sum())
        m.det_px_errors.extend(dist[matched].tolist())

        for gi in np.where(matched)[0]:
            pi = idx[gi]
            ang = float(quaternion_diff_deg(np.asarray(gt_quats[gi])[None],
                                            np.asarray(pred_quats[pi])[None])[0])
            tr_cm = float(np.linalg.norm(np.asarray(gt_trans[gi])
                                         - np.asarray(pred_trans[pi])) * 100.0)
            reliable = bool(pred_reliable[pi])
            # Reference aggregation: angle over matches with angle < 60 deg;
            # translation over depth-reliable matches with trans < 10 cm.
            if ang < self.th.angle_deg:
                m.angle_errors.append(ang)
            if reliable and tr_cm < self.th.trans_cm:
                m.trans_errors_cm.append(tr_cm)
            if reliable:
                m.n_pose_evaluated += 1
                if ang < self.th.angle_deg and tr_cm < self.th.trans_cm:
                    m.n_pose_success += 1

        if student_mask is not None and teacher_mask is not None:
            t = teacher_mask
            if student_boxes is not None:
                t = restrict_mask_to_boxes(teacher_mask, student_boxes)
            m.dice_scores.append(dice_score(
                (np.asarray(student_mask) > 128).astype(np.float64),
                (np.asarray(t) > 128).astype(np.float64)))

    def summary(self) -> dict:
        return self.metrics.summary()
