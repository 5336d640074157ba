"""Evaluation: the reference metric suite + synthetic-GT harness."""

from flope_tpu.eval.metrics import (
    MetricThresholds,
    MetricAccumulator,
    PoseMetrics,
    match_detections,
    quaternion_diff_deg,
    dice_score,
    restrict_mask_to_boxes,
)
from flope_tpu.eval.harness import EvalConfig, evaluate_pipeline
