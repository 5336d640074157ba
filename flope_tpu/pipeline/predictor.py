"""The fused per-frame pose pipeline: one jitted XLA program per frame.

Reference call stack being reproduced (SURVEY.md §3.1/§3.2 — the teacher
PosePredictor.get_flower_poses, pose_predictor.py:69-186, and the student
FastPosePredictor, fast_pose_predictor.py:60-156): detector boxes + seg mask
-> large-box filter -> squarify + in-frame filter -> masked depth pooling ->
depth-reliability filter -> ray-depth lifting -> masked 512^2 crops -> PoseNet
-> Procrustes -> yaw-nullify -> (N,4,4) poses.

In the reference that chain is ~6 host<->device crossings and several Python
loops per frame; here it is a single fixed-shape XLA program
(`predict_frame`), batchable over frames (`predict_frames`) and shardable over
a device mesh (flope_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from flope_tpu.geometry import (
    box_centers,
    boxes_in_frame,
    filter_very_large_boxes,
    points3d_from_ray_depth,
    pose_matrix,
    squarify_boxes,
)
from flope_tpu.models.posenet import PoseNet
from flope_tpu.ops import crop_resize_with_mask, masked_depth_value
from flope_tpu.pipeline.types import FramePrediction

__all__ = ["PipelineConfig", "predict_frame", "predict_frames", "PosePredictor"]


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static pipeline parameters (hashable: part of the jit cache key).

    Defaults follow the student pipeline (fast_pose_predictor.py):
    depth_scale 1/1000 (mm -> m). The teacher uses 1/10000 for the RealSense
    405 (pose_predictor.py:118) and additionally drops very large boxes
    (pose_predictor.py:83); flip `filter_large` + `depth_scale` for that mode.
    """

    max_det: int = 16
    crop_size: int = 512
    depth_scale: float = 1.0 / 1000.0
    near_plane: float = 0.1
    far_plane: float = 2.5
    resize_method: str = "lanczos4"
    yaw_nullify: bool = True
    filter_large: bool = False
    min_depth_pixels: int = 50
    erode_ksize: int = 10
    # Depth-reliability fallback: instead of dropping a flower whose ERODED
    # mask count misses min_depth_pixels (the reference's hard drop,
    # pose_predictor.py:125-127), use the un-eroded masked mean when IT
    # clears min_depth_pixels. Recovers small/occluded flowers whose mask
    # erosion wipes out (~18% of true hard-domain detections, PERF.md r5).
    # Off by default = reference-parity semantics.
    depth_fallback: bool = False
    model_dtype: Any = jnp.float32
    # PoseNet backbone channel scale (0.5 = the distilled 512^2 student;
    # must match the checkpoint's width).
    model_width: float = 1.0
    # Crop windows slice a fixed region around each box before the sampling
    # matmuls (FLOP cut; exact while boxes fit). None = exact full-frame path.
    crop_region: int | None = 768
    # dtype of the crop sampling contractions: bfloat16 = single-pass MXU
    # matmuls (+-1 uint8 LSB vs the float32 bit-parity path — see
    # ops/crop_resize.py), float32 = exact.
    crop_dtype: Any = jnp.float32
    # "xla": region-sliced einsum crops (default). "pallas": the fused
    # HBM->VMEM Pallas kernel (ops/crop_pallas.py) — only takes effect in
    # predict_frames (the kernel needs the explicit frame batch; it must not
    # be vmapped), requires crop_region set, measured ~1.3x faster at
    # 16x1080p on v5e.
    crop_backend: str = "xla"
    # Pallas backend only: keep the kernel's native PLANAR crop layout and
    # run PoseNet's stem with NCHW dimension numbers, so the explicit
    # planar->NHWC transpose (measured 2.8 ms f32 / 16x1080p) never appears
    # in the graph — XLA schedules the relayout inside the stem conv.
    # (In-kernel NHWC interleave is a Mosaic unsupported shape cast on v5e.)
    planar_stem: bool = False

    def teacher(self) -> "PipelineConfig":
        return dataclasses.replace(self, depth_scale=1.0 / 10000.0, filter_large=True)


def _frame_geometry(depth_raw, boxes, det_valid, seg_mask, K, h, w,
                    config: PipelineConfig):
    """Stages 1-5 of the fused tail (everything before the crops): filters,
    masked depth pooling, ray-depth lifting. Returns (boxes_int, valid, sq,
    uv, xyz, depth_val)."""
    boxes = boxes.astype(jnp.int32)
    valid = det_valid.astype(bool)

    # 1. Teacher-mode large-box rejection (pose_predictor.py:83).
    if config.filter_large:
        valid = filter_very_large_boxes(boxes, valid)

    # 2. Detection centers from the ORIGINAL boxes (pose_predictor.py:99-101).
    uv = box_centers(boxes)

    # 3. Squarify; drop crops that leave the frame (pose_predictor.py:95-108).
    sq = squarify_boxes(boxes)
    valid = valid & boxes_in_frame(sq, h, w)

    # 4. Masked depth pooling over the ORIGINAL boxes (pose_predictor.py:118-122)
    #    and reliability filter (pose_predictor.py:125-127).
    depth_m = depth_raw.astype(jnp.float32) * config.depth_scale
    depth_val, reliable = masked_depth_value(
        boxes, depth_m, seg_mask,
        near_plane=config.near_plane, far_plane=config.far_plane,
        erode_ksize=config.erode_ksize, min_pixels=config.min_depth_pixels,
        fallback=config.depth_fallback,
    )
    valid = valid & reliable

    # 5. Ray-depth lifting (pose_predictor.py:135, mvg.py:387-408).
    xyz = points3d_from_ray_depth(uv, depth_val, K)
    return boxes, valid, sq, uv, xyz, depth_val


def _assemble(valid, boxes, sq, uv, xyz, depth_val, rotmats) -> FramePrediction:
    """Stage 8: (MAX_DET, 4, 4) poses (pose_predictor.py:172-174); invalid
    slots get identity rotation + zero translation."""
    poses = pose_matrix(
        jnp.where(valid[:, None, None], rotmats, jnp.eye(3)),
        jnp.where(valid[:, None], xyz, 0.0),
    )
    return FramePrediction(
        poses=poses,
        valid=valid,
        boxes=boxes,
        square_boxes=sq,
        uv=uv,
        depth=jnp.where(valid, depth_val, 0.0),
        rotmats=rotmats,
        num_valid=jnp.sum(valid).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("config",))
def predict_frame(
    variables: dict,
    rgb: jax.Array,
    depth_raw: jax.Array,
    boxes: jax.Array,
    det_valid: jax.Array,
    seg_mask: jax.Array,
    K: jax.Array,
    config: PipelineConfig = PipelineConfig(),
) -> FramePrediction:
    """Fused detect-tail: boxes+mask -> per-flower 6-DoF camera-frame poses.

    rgb: (H, W, 3) float/uint8 0..255. depth_raw: (H, W) sensor units.
    boxes: (MAX_DET, 4) int xyxy. det_valid: (MAX_DET,). seg_mask: (H, W)
    uint8 {0,255} or bool. K: (3, 3).
    """
    h, w = rgb.shape[0], rgb.shape[1]
    boxes, valid, sq, uv, xyz, depth_val = _frame_geometry(
        depth_raw, boxes, det_valid, seg_mask, K, h, w, config)

    # 6. Masked square crops on the MXU (pose_predictor.py:139-151).
    crops = crop_resize_with_mask(
        rgb.astype(jnp.float32), seg_mask.astype(jnp.float32), sq,
        out_size=config.crop_size, method=config.resize_method,
        region_size=config.crop_region, compute_dtype=config.crop_dtype,
    ) / 255.0

    # 7. PoseNet -> Procrustes -> yaw-nullify (pose_predictor.py:156-161).
    r9 = PoseNet(dtype=config.model_dtype, width_mult=config.model_width
                 ).apply(variables, crops, train=False)
    rotmats = PoseNet.to_rotmats(r9, yaw_nullify=config.yaw_nullify)

    return _assemble(valid, boxes, sq, uv, xyz, depth_val, rotmats)


@functools.partial(jax.jit, static_argnames=("config",))
def predict_frames(variables, rgb, depth_raw, boxes, det_valid, seg_mask, K,
                   config: PipelineConfig = PipelineConfig()) -> FramePrediction:
    """Batched variant: leading frame axis on every array input (K shared).

    This is the unit of multi-camera scale-out: shard the frame axis over the
    mesh's 'stream' axis (flope_tpu.parallel.shard_pipeline) and XLA keeps the
    whole fleet of frames on-device.

    With config.crop_backend == "pallas" the crop stage runs as ONE fused
    Pallas kernel over the whole frame batch (ops/crop_pallas.py — the
    kernel takes the batch explicitly because vmapping a pallas_call with
    scalar prefetch mis-binds program_id), and PoseNet then consumes one
    (F*MAX_DET) crop batch.
    """
    h, w = rgb.shape[1], rgb.shape[2]
    if (config.crop_backend == "pallas" and config.crop_region is not None
            and config.crop_region < min(h, w)):
        from flope_tpu.ops.crop_pallas import crop_resize_with_mask_pallas

        geo = jax.vmap(lambda d, b, v, m: _frame_geometry(
            d, b, v, m, K, h, w, config))(depth_raw, boxes, det_valid,
                                          seg_mask)
        boxes_i, valid, sq, uv, xyz, depth_val = geo
        layout = "NCHW" if config.planar_stem else "NHWC"
        crops = crop_resize_with_mask_pallas(
            rgb.astype(jnp.float32), seg_mask.astype(jnp.float32), sq,
            out_size=config.crop_size, method=config.resize_method,
            region_size=config.crop_region, compute_dtype=config.crop_dtype,
            interpret=jax.default_backend() == "cpu",
            layout=layout,
        ) / 255.0
        f, n = crops.shape[0], crops.shape[1]
        flat = crops.reshape(f * n, *crops.shape[2:])
        r9 = PoseNet(dtype=config.model_dtype, width_mult=config.model_width,
                     input_layout=layout
                     ).apply(variables, flat, train=False)
        rotmats = PoseNet.to_rotmats(
            r9, yaw_nullify=config.yaw_nullify).reshape(f, n, 3, 3)
        return jax.vmap(_assemble)(valid, boxes_i, sq, uv, xyz, depth_val,
                                   rotmats)

    fn = lambda r, d, b, v, m: predict_frame(variables, r, d, b, v, m, K, config)
    return jax.vmap(fn)(rgb, depth_raw, boxes, det_valid, seg_mask)


class PosePredictor:
    """Host-side convenience wrapper mirroring the reference predictor APIs.

    Reference: PosePredictor.get_flower_poses(rgb, depth) -> (N,4,4) | None
    (pose_predictor.py:69) and FastPosePredictor (fast_pose_predictor.py:60).
    The detector is pluggable: anything with
    ``detect(rgb) -> (boxes (D,4) int32, valid (D,) bool, seg_mask (H,W) uint8)``.
    """

    def __init__(self, variables: dict, detector, K: np.ndarray,
                 config: PipelineConfig = PipelineConfig()):
        self.variables = variables
        self.detector = detector
        self.K = jnp.asarray(K, jnp.float32)
        self.config = config

    def predict(self, rgb: np.ndarray, depth: np.ndarray) -> FramePrediction:
        """Fixed-shape prediction (the TPU-native API)."""
        boxes, valid, mask = self.detector.detect(rgb)
        return predict_frame(
            self.variables, jnp.asarray(rgb), jnp.asarray(depth),
            jnp.asarray(boxes), jnp.asarray(valid), jnp.asarray(mask),
            self.K, self.config,
        )

    def get_flower_poses(self, rgb: np.ndarray, depth: np.ndarray):
        """Reference-compatible API: compacted (N,4,4) numpy array or None."""
        pred = self.predict(rgb, depth)
        valid = np.asarray(pred.valid)
        if not valid.any():
            return None
        return np.asarray(pred.poses)[valid]
