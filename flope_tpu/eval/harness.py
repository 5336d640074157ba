"""Evaluation harness: generate_metrics.py re-created over synthetic scenes.

Runs the (student) pipeline frame by frame against exact synthetic ground
truth and scores it with the reference's metric suite. With a trained PoseNet
this is the fidelity gate (<2 deg mean rotation-error delta, BASELINE.json);
with GT boxes+masks it isolates the pose branch exactly like the reference
evaluates both branches with the same PoseNet (generate_metrics.py:222-233).
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp

from scipy.spatial.transform import Rotation as sciR

from flope_tpu.data.synthetic import (DomainConfig, SyntheticScene,
                                      render_frame, orbit_camera)
from flope_tpu.eval.metrics import MetricAccumulator, MetricThresholds
from flope_tpu.geometry import nullify_yaw
from flope_tpu.pipeline import PipelineConfig, predict_frame

__all__ = ["EvalConfig", "evaluate_pipeline"]


@dataclasses.dataclass
class EvalConfig:
    n_frames: int = 50
    n_flowers: int = 5
    height: int = 480
    width: int = 640
    seed: int = 0
    max_det: int = 16
    domain: str = "flat"          # rendering-domain preset (flat|hard)
    thresholds: MetricThresholds = dataclasses.field(default_factory=MetricThresholds)
    log_path: str | None = None


def evaluate_pipeline(posenet_variables: dict, pipeline_config: PipelineConfig,
                      eval_config: EvalConfig = EvalConfig(),
                      detector=None) -> dict:
    """Score the pipeline on a synthetic orbit sequence.

    detector=None uses ground-truth boxes+masks (isolates the pose branch);
    otherwise any pipeline-protocol detector (e.g. YoloJaxDetector).
    Returns the metric summary dict; writes JSONL per-frame logs if configured.
    """
    rng = np.random.default_rng(eval_config.seed)
    scene = SyntheticScene.random(rng, eval_config.n_flowers,
                                  eval_config.height, eval_config.width,
                                  domain=DomainConfig.named(eval_config.domain))
    acc = MetricAccumulator(eval_config.thresholds)
    logf = open(eval_config.log_path, "w") if eval_config.log_path else None

    for fi in range(eval_config.n_frames):
        ang = 2 * np.pi * fi / eval_config.n_frames
        frame = render_frame(scene, orbit_camera(scene, ang),
                             max_det=eval_config.max_det)
        if detector is None:
            boxes, det_valid, mask = frame.boxes, frame.valid, frame.mask
        else:
            boxes, det_valid, mask = detector.detect(frame.rgb)
        if pipeline_config.crop_backend == "pallas":
            # The Pallas crop kernel only activates in the batched entry
            # (it must not be vmapped) — evaluate via a singleton batch.
            from flope_tpu.pipeline import predict_frames
            batched = predict_frames(
                posenet_variables, jnp.asarray(frame.rgb)[None],
                jnp.asarray(frame.depth_mm)[None], jnp.asarray(boxes)[None],
                jnp.asarray(det_valid)[None], jnp.asarray(mask)[None],
                jnp.asarray(scene.K, jnp.float32), pipeline_config)
            pred = jax.tree.map(lambda x: x[0], batched)
        else:
            pred = predict_frame(
                posenet_variables, jnp.asarray(frame.rgb),
                jnp.asarray(frame.depth_mm), jnp.asarray(boxes),
                jnp.asarray(det_valid), jnp.asarray(mask),
                jnp.asarray(scene.K, jnp.float32), pipeline_config)

        pv = np.asarray(pred.valid)
        gv = frame.valid
        # GT rotations yaw-nullified like the pipeline output
        # (the flower is yaw-symmetric; both sides compare in the same gauge).
        gt_R = np.asarray(nullify_yaw(jnp.asarray(frame.gt_poses_cam[gv, :3, :3])))
        acc.add_frame(
            gt_centers=frame.centers_uv[gv],
            gt_quats=sciR.from_matrix(gt_R).as_quat(),
            gt_trans=frame.gt_poses_cam[gv, :3, 3],
            pred_centers=np.asarray(pred.uv)[pv],
            pred_quats=sciR.from_matrix(np.asarray(pred.rotmats)[pv]).as_quat(),
            pred_trans=np.asarray(pred.poses)[pv, :3, 3],
            pred_reliable=np.ones(int(pv.sum()), bool),  # pipeline valid == reliable
            student_mask=mask if detector is not None else None,
            teacher_mask=frame.mask if detector is not None else None,
            student_boxes=np.asarray(boxes)[det_valid.astype(bool)]
            if detector is not None else None,
        )
        if logf:
            logf.write(json.dumps({"frame": fi,
                                   "n_gt": int(gv.sum()),
                                   "n_pred": int(pv.sum())}) + "\n")
    if logf:
        logf.close()
    return acc.summary()
