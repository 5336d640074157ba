"""Detector front-ends for the pose pipeline.

The reference ships two: the slow teacher (GroundingDINO + SAM, HF
transformers — models/grounding_dino.py, models/sam.py) and the fast student
(ultralytics YOLO11-seg — fast_pose_predictor.py:36-57). Here:

* YoloJaxDetector — the TPU-native student: our Yolo11Seg + fixed-shape
  postprocess, fused with the pose tail in `detect_and_pose` (the whole
  frame -> poses computation as ONE XLA program: the BASELINE.json north star).
* TeacherDetector — host-side adapter around HF GroundingDINO + SAM for data
  generation / teacher evaluation, gated on local weight availability (this
  environment has no egress; the reference downloaded from the Hub).

Both satisfy the pipeline detector protocol:
    detect(rgb) -> (boxes (D,4) int32, valid (D,) bool, seg_mask (H,W) uint8)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from flope_tpu.models.yolo import Yolo11Seg, decode_predictions, postprocess
from flope_tpu.ops.crop_resize import resize_image
from flope_tpu.pipeline.predictor import (PipelineConfig, predict_frame,
                                          predict_frames)
from flope_tpu.pipeline.types import FramePrediction

__all__ = ["yolo_detect", "detect_and_pose", "detect_and_pose_frames",
           "YoloJaxDetector", "TeacherDetector"]


@functools.partial(jax.jit, static_argnames=("det_size", "max_det", "score_th",
                                             "iou_th", "scale", "num_classes",
                                             "refine_boxes", "resize_dtype",
                                             "model_dtype"))
def yolo_detect(yolo_variables: dict, rgb: jax.Array, det_size: int = 640,
                max_det: int = 16, score_th: float = 0.25, iou_th: float = 0.7,
                scale: str = "n", num_classes: int = 1,
                refine_boxes: bool = False, resize_dtype=jnp.float32,
                model_dtype=jnp.float32):
    """One frame -> (boxes in frame coords, scores, valid, union mask at frame res).

    The frame is stretch-resized to (det_size, det_size) for the net (the
    reference letterboxes via ultralytics; we train our own detector so the
    resize convention only needs self-consistency), boxes are mapped back to
    frame coordinates, and the union instance mask is upsampled to frame
    resolution like get_bbox_mask's cv2.resize (fast_pose_predictor.py:54).

    resize_dtype=jnp.bfloat16 runs both resize contractions (1080p->det_size
    frame, proto->frame mask) on the MXU in one pass; sub-LSB drift on the
    0..255 scale, feeding a bf16 model and a >128-thresholded mask.

    model_dtype=jnp.bfloat16 runs the YOLO forward itself in bf16 (params
    stay f32; decode_predictions/postprocess cast the raw heads back to f32
    before DFL decode, so box arithmetic is unaffected).
    """
    h, w = rgb.shape[0], rgb.shape[1]
    inp = resize_image(rgb.astype(jnp.float32), det_size, det_size,
                       method="bilinear", compute_dtype=resize_dtype) / 255.0
    raw = Yolo11Seg(num_classes=num_classes, scale=scale,
                    dtype=model_dtype).apply(
        yolo_variables, inp[None], train=False)
    dec = decode_predictions(raw)
    post = postprocess({k: v[0] for k, v in dec.items()}, raw["proto"][0],
                       max_det=max_det, score_th=score_th, iou_th=iou_th,
                       refine_boxes=refine_boxes)
    sx = w / det_size
    sy = h / det_size
    boxes = post["boxes"].astype(jnp.float32) * jnp.asarray([sx, sy, sx, sy])
    boxes = jnp.clip(boxes, 0, jnp.asarray([w, h, w, h], jnp.float32))
    mask = resize_image(post["union_mask"] * 255.0, h, w, method="bilinear",
                        compute_dtype=resize_dtype)
    return (boxes.astype(jnp.int32), post["scores"], post["valid"],
            jnp.clip(mask, 0, 255))


@functools.partial(jax.jit, static_argnames=("det_size", "config", "score_th",
                                             "iou_th", "scale", "refine_boxes"))
def detect_and_pose(yolo_variables: dict, posenet_variables: dict,
                    rgb: jax.Array, depth_raw: jax.Array, K: jax.Array,
                    det_size: int = 640, score_th: float = 0.25,
                    iou_th: float = 0.7, scale: str = "n",
                    refine_boxes: bool = False,
                    config: PipelineConfig = PipelineConfig()) -> FramePrediction:
    """THE fused graph: raw RGB-D frame -> (MAX_DET,4,4) poses + masks.

    Reproduces FastPosePredictor.get_flower_poses (fast_pose_predictor.py:60)
    end-to-end on device: YOLO detect+segment -> squarify/filters -> depth ->
    crops -> PoseNet -> poses, with zero host round trips.
    """
    boxes, _, valid, mask = yolo_detect(
        yolo_variables, rgb, det_size, config.max_det, score_th, iou_th, scale,
        refine_boxes=refine_boxes, resize_dtype=config.crop_dtype,
        model_dtype=config.model_dtype)
    return predict_frame(posenet_variables, rgb, depth_raw, boxes, valid,
                         mask, K, config)


@functools.partial(jax.jit, static_argnames=("det_size", "config", "score_th",
                                             "iou_th", "scale", "refine_boxes"))
def detect_and_pose_frames(yolo_variables: dict, posenet_variables: dict,
                           rgbs: jax.Array, depths_raw: jax.Array,
                           K: jax.Array, det_size: int = 640,
                           score_th: float = 0.25, iou_th: float = 0.7,
                           scale: str = "n", refine_boxes: bool = False,
                           config: PipelineConfig = PipelineConfig()
                           ) -> FramePrediction:
    """Batched fused graph: (F, H, W, 3) frames -> (F, MAX_DET, 4, 4) poses.

    Equivalent to vmapping `detect_and_pose`, but routes the tail through
    `predict_frames` so config.crop_backend == "pallas" takes effect (the
    Pallas crop kernel needs the explicit frame batch)."""
    det = jax.vmap(lambda r: yolo_detect(
        yolo_variables, r, det_size, config.max_det, score_th, iou_th, scale,
        refine_boxes=refine_boxes, resize_dtype=config.crop_dtype,
        model_dtype=config.model_dtype))(rgbs)
    boxes, _, valid, masks = det
    return predict_frames(posenet_variables, rgbs, depths_raw, boxes, valid,
                          masks, K, config)


class YoloJaxDetector:
    """Pipeline detector protocol wrapper around the jitted YOLO graph."""

    def __init__(self, variables: dict, det_size: int = 640, max_det: int = 16,
                 score_th: float = 0.25, iou_th: float = 0.7, scale: str = "n",
                 refine_boxes: bool = False, resize_dtype=jnp.float32,
                 model_dtype=jnp.float32):
        self.variables = variables
        self.det_size = det_size
        self.max_det = max_det
        self.score_th = score_th
        self.iou_th = iou_th
        self.scale = scale
        self.refine_boxes = refine_boxes
        self.resize_dtype = resize_dtype
        self.model_dtype = model_dtype

    def detect(self, rgb: np.ndarray):
        boxes, _, valid, mask = yolo_detect(
            self.variables, jnp.asarray(rgb), self.det_size, self.max_det,
            self.score_th, self.iou_th, self.scale,
            refine_boxes=self.refine_boxes, resize_dtype=self.resize_dtype,
            model_dtype=self.model_dtype)
        return (np.asarray(boxes), np.asarray(valid),
                np.asarray(mask).astype(np.uint8))


class TeacherDetector:
    """GroundingDINO + SAM teacher (host-side, torch CPU via HF transformers).

    Mirrors models/grounding_dino.py:17-44 (text prompt 'white flower.',
    box/text thresholds 0.3, label filter) and models/sam.py:13-49 (box-
    prompted masks OR-combined into one uint8 {0,255} mask). Weight loading
    requires the HF checkpoints on local disk — pass paths; there is no
    network egress in this environment.
    """

    def __init__(self, gdino_path: str, sam_path: str, max_det: int = 16,
                 prompt: str = "white flower.", box_th: float = 0.3,
                 text_th: float = 0.3, device: str = "cpu"):
        from transformers import (AutoModelForZeroShotObjectDetection,
                                  AutoProcessor, SamModel, SamProcessor)

        self.max_det = max_det
        self.prompt = prompt
        self.box_th = box_th
        self.text_th = text_th
        self.device = device
        self.gdino_processor = AutoProcessor.from_pretrained(gdino_path)
        self.gdino = AutoModelForZeroShotObjectDetection.from_pretrained(
            gdino_path).to(device)
        self.sam_processor = SamProcessor.from_pretrained(sam_path)
        self.sam = SamModel.from_pretrained(sam_path).to(device)

    def detect(self, rgb: np.ndarray):
        import torch
        from PIL import Image

        h, w = rgb.shape[:2]
        img = Image.fromarray(rgb)
        inputs = self.gdino_processor(images=img, text=self.prompt,
                                      return_tensors="pt").to(self.device)
        with torch.no_grad():
            out = self.gdino(**inputs)
        res = self.gdino_processor.post_process_grounded_object_detection(
            out, inputs.input_ids, threshold=self.box_th,
            text_threshold=self.text_th, target_sizes=[(h, w)])[0]
        # transformers >= 4.51 deprecates string `labels` for `text_labels`.
        labels = res.get("text_labels", res["labels"])
        boxes_list = [b for b, lab in zip(res["boxes"].cpu().numpy(), labels)
                      if "flower" in str(lab)][: self.max_det]
        boxes = np.zeros((self.max_det, 4), np.int32)
        valid = np.zeros((self.max_det,), bool)
        mask = np.zeros((h, w), np.uint8)
        if boxes_list:
            arr = np.array(boxes_list, np.int32)
            boxes[: len(arr)] = arr
            valid[: len(arr)] = True
            sam_in = self.sam_processor(
                img, input_boxes=[[list(map(float, b)) for b in arr]],
                return_tensors="pt").to(self.device)
            with torch.no_grad():
                sam_out = self.sam(**sam_in)
            masks = self.sam_processor.image_processor.post_process_masks(
                sam_out.pred_masks.cpu(), sam_in["original_sizes"].cpu(),
                sam_in["reshaped_input_sizes"].cpu())[0]
            # Keep channel 0 per box, OR everything (sam.py:36-39).
            union = masks[:, 0].any(0).numpy()
            mask = union.astype(np.uint8) * 255
        return boxes, valid, mask
