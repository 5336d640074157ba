"""Run the reference predictor's actual code path for fidelity A/B testing.

Imports the unmodified reference package (sunflower, at /root/reference by
default) and drives `PosePredictor.get_flower_poses` (pose_predictor.py:69-186
— the exact torch/cv2/scipy tail: filter_very_large_bb -> squarify ->
get_depth_value -> get_points3d -> cv2 Lanczos4 crops -> PoseResNet ->
roma-procrustes -> nullify_yaw -> Rt) with the detector and SAM replaced by
stubs that return known boxes/masks. This grounds the TPU pipeline's fidelity
against the reference's real implementation rather than a self-made oracle.

Two deliberate deviations, both documented:
- GroundingDINO/SAM are weight-gated (zero egress) and are exactly the two
  components whose OUTPUTS we control in the A/B; stubs inject those outputs.
- The reference never calls .eval() on PoseNet at inference
  (pose_predictor.py:51-52 — dropout p=0.5 stays ACTIVE and BatchNorm runs in
  batch-stats mode, making its deployed inference nondeterministic). We set
  eval mode so the comparison is deterministic; this matches the eval-mode
  handling the reference itself uses in training evaluation
  (train_posenet.py:154).
"""

from __future__ import annotations

import os
import sys

import numpy as np

DEFAULT_REFERENCE_ROOT = "/root/reference"

_SHIMS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims")


def add_reference_paths(reference_root: str = DEFAULT_REFERENCE_ROOT) -> None:
    """Make `sunflower` and the dependency shims importable.

    Both paths are APPENDED so any real installed package shadows its shim.
    """
    for p in (str(reference_root), _SHIMS_DIR):
        if p not in sys.path:
            sys.path.append(p)


class _StubGDino:
    """GroundingDINO stand-in: .detect(rgb) -> (N,4) int xyxy boxes
    (grounding_dino.py:17-44 contract)."""

    def __init__(self):
        self.boxes = np.zeros((0, 4), np.int64)

    def detect(self, _rgb):
        return np.asarray(self.boxes)


class _StubSAM:
    """SAM stand-in: .get_segmentation_mask(pil, boxes) -> (H,W) uint8 {0,255}
    union mask (sam.py:13-49 contract)."""

    def __init__(self):
        self.mask = None

    def get_segmentation_mask(self, _img, _boxes):
        return np.asarray(self.mask)


def make_reference_predictor(state_dict: dict, K: np.ndarray, height: int,
                             width: int,
                             reference_root: str = DEFAULT_REFERENCE_ROOT):
    """Build a reference PosePredictor running the real code with stub models.

    state_dict: torch-style PoseResNet weights as numpy arrays (e.g. from
    flope_tpu.models.posenet_state_dict_to_torch) or torch tensors.
    Constructed via object.__new__ so __init__ (which loads GDINO/SAM weights,
    pose_predictor.py:41-66) is skipped; every attribute the inference path
    reads is injected explicitly.
    """
    add_reference_paths(reference_root)
    import torch
    from sunflower.models.posenet import PoseResNet
    from sunflower.predictor.pose_predictor import PosePredictor

    posenet = PoseResNet()
    tensors = {k: torch.as_tensor(np.array(v, copy=True))
               for k, v in state_dict.items()}
    missing, unexpected = posenet.load_state_dict(tensors, strict=False)
    bad_missing = [k for k in missing if "num_batches_tracked" not in k]
    if bad_missing or unexpected:
        raise ValueError(f"state_dict mismatch: missing={bad_missing} "
                         f"unexpected={list(unexpected)}")
    posenet.eval()  # deterministic inference; see module docstring

    pred = object.__new__(PosePredictor)
    pred.device = "cpu"
    pred.debug = False
    pred.posenet = posenet
    pred.gdino = _StubGDino()
    pred.sam = _StubSAM()
    pred.K = np.asarray(K, np.float64)
    pred.height = int(height)
    pred.width = int(width)
    return pred


def run_reference_frames(pred, frames_rgb, frames_depth_units, boxes_per_frame,
                         masks) -> list:
    """Drive pred.get_flower_poses over frames with injected detections.

    frames_depth_units: raw sensor units; the reference divides by 10000
    (pose_predictor.py:118, RealSense 405 convention).
    Returns the reference's native output per frame: (N,4,4) float64 or None.
    """
    import torch

    out = []
    for rgb, depth, boxes, mask in zip(frames_rgb, frames_depth_units,
                                       boxes_per_frame, masks):
        pred.gdino.boxes = np.asarray(boxes, np.int64)
        pred.sam.mask = np.asarray(mask, np.uint8)
        with torch.no_grad():
            out.append(pred.get_flower_poses(np.asarray(rgb),
                                             np.asarray(depth)))
    return out
