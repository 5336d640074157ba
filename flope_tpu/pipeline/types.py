"""Fixed-shape result types for the fused pipeline.

The reference returns ``None`` when any stage empties (pose_predictor.py:76,
114,131) and variable-length (N,4,4) arrays otherwise. XLA requires static
shapes, so the pipeline's contract is: every frame yields MAX_DET slots plus a
validity mask — the "null-object" protocol of SURVEY.md §5.3 expressed as data.
"""

from __future__ import annotations

import flax.struct
import jax

__all__ = ["FramePrediction"]


@flax.struct.dataclass
class FramePrediction:
    """Per-frame pipeline output (all arrays have a leading MAX_DET axis).

    poses: (D, 4, 4) camera-frame flower poses (rotation + depth-lifted
        translation), identity in invalid slots.
    valid: (D,) slot validity after every filter stage (detection, in-frame,
        depth reliability).
    boxes: (D, 4) detector boxes (xyxy, int32).
    square_boxes: (D, 4) squarified crop boxes.
    uv: (D, 2) detection centers (pixels).
    depth: (D,) per-flower ray depth in meters (0 where unknown).
    rotmats: (D, 3, 3) SO(3) rotations (valid in every lane — padded lanes get
        the Procrustes projection of the net's response to a black crop).
    num_valid: () int32 count of valid slots.
    """

    poses: jax.Array
    valid: jax.Array
    boxes: jax.Array
    square_boxes: jax.Array
    uv: jax.Array
    depth: jax.Array
    rotmats: jax.Array
    num_valid: jax.Array
