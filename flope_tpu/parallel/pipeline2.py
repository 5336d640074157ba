"""Two-stage pipeline parallelism: detector chips / posenet chips.

SURVEY.md §2.4 plans an optional 2-stage pipelining of the streaming graph
(YOLO detect+segment stage, pose-tail stage) across the mesh. This is the
TPU-native formulation: a ('stage', 'stream') mesh where, per scan step,
stage-0 devices run detection on frame t while stage-1 devices run the pose
tail on frame t-1, with the detector outputs (boxes/valid/mask) moved
stage 0 -> stage 1 by `lax.ppermute` over ICI. Software pipelining via
`lax.scan`: T frames complete in T+1 steps, each step costing
max(det, tail) + ppermute instead of det + tail.

Throughput analysis (recorded decision, PERF.md): with 2S devices,
stream-DP processes 2S frames per (det + tail); this pipeline processes
S frames per max(det, tail) >= (det + tail)/2, so PP throughput <= DP
always for a stateless per-frame graph — plus it ships the full-resolution
mask across ICI. PP exists here as a capability (and wins only if a stage
needed device-local state or weights too big to replicate); stream-DP
(flope_tpu.parallel.shard_batch + predict_frames) is the deployment default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from flope_tpu.pipeline.predictor import PipelineConfig, predict_frame

__all__ = ["two_stage_detect_pose"]


def two_stage_detect_pose(mesh: Mesh, yolo_variables: dict,
                          posenet_variables: dict, rgb: jax.Array,
                          depth_raw: jax.Array, K: jax.Array,
                          det_size: int = 640, score_th: float = 0.25,
                          iou_th: float = 0.7, scale: str = "n",
                          config: PipelineConfig = PipelineConfig()):
    """Pipelined frames -> poses over a ('stage'=2, 'stream'=S) mesh.

    rgb: (T, S, H, W, 3); depth_raw: (T, S, H, W). Each stream lane processes
    its T frames through the two pipelined stages. Returns a FramePrediction
    pytree with leading (T, S) axes, identical to vmapped detect_and_pose.
    """
    from flope_tpu.pipeline.detector import yolo_detect

    assert mesh.shape["stage"] == 2, "two pipeline stages"
    t_steps = rgb.shape[0]
    h, w = rgb.shape[2], rgb.shape[3]
    d = config.max_det

    def detect(frame):
        return yolo_detect(yolo_variables, frame, det_size, d, score_th,
                           iou_th, scale)

    def tail(frame, depth, boxes, valid, mask):
        return predict_frame(posenet_variables, frame, depth, boxes, valid,
                             mask, K, config)

    def zero_inter():
        return (jnp.zeros((d, 4), jnp.int32), jnp.zeros((d,), jnp.int32),
                jnp.zeros((h, w), jnp.float32))

    def zero_pred():
        pred = jax.eval_shape(
            tail, jax.ShapeDtypeStruct((h, w, 3), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((d, 4), jnp.int32),
            jax.ShapeDtypeStruct((d,), jnp.bool_),
            jax.ShapeDtypeStruct((h, w), jnp.float32))
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), pred)

    def lane(rgb_lane, depth_lane):
        # Local per-device block: (T, 1, H, W, ...) -> (T, H, W, ...).
        rgb_lane = rgb_lane[:, 0].astype(jnp.float32)
        depth_lane = depth_lane[:, 0].astype(jnp.float32)
        stage = jax.lax.axis_index("stage")

        # Step t: stage 0 detects frame det_idx[t]=min(t, T-1) (dummy repeat
        # on the drain step), stage 1 poses frame t-1 from the carry.
        def step(carry, t):
            boxes_c, valid_c, mask_c = carry
            det_frame = rgb_lane[jnp.minimum(t, t_steps - 1)]
            boxes, valid, mask = jax.lax.cond(
                stage == 0,
                lambda: (lambda bb, _s, vv, mm:
                         (bb, vv.astype(jnp.int32), mm.astype(jnp.float32))
                         )(*detect(det_frame)),
                zero_inter)
            # Move stage-0 detections to stage 1 (ICI hop).
            boxes, valid, mask = jax.lax.ppermute(
                (boxes, valid, mask), "stage", [(0, 1)])
            tm1 = jnp.maximum(t - 1, 0)
            pred = jax.lax.cond(
                stage == 1,
                lambda: tail(rgb_lane[tm1], depth_lane[tm1], boxes_c,
                             valid_c.astype(bool),
                             mask_c),
                zero_pred)
            return (boxes, valid, mask), pred

        _, preds = jax.lax.scan(step, zero_inter(),
                                jnp.arange(t_steps + 1))
        # Drop the fill step; make results stage-replicated (stage 0
        # contributed zeros) so out_specs can omit the stage axis. Bools ride
        # the psum as int32.
        preds = jax.tree.map(lambda x: x[1:], preds)
        kinds = jax.tree.map(lambda x: x.dtype == jnp.bool_, preds)
        preds = jax.tree.map(
            lambda x: x.astype(jnp.int32) if x.dtype == jnp.bool_ else x, preds)
        preds = jax.lax.psum(preds, "stage")
        preds = jax.tree.map(
            lambda x, b: x.astype(bool) if b else x, preds, kinds)
        return jax.tree.map(lambda x: x[:, None], preds)  # re-add lane axis

    fn = shard_map(lane, mesh=mesh,
                   in_specs=(P(None, "stream"), P(None, "stream")),
                   out_specs=P(None, "stream"), check_vma=False)
    return fn(rgb, depth_raw)
