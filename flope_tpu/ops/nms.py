"""Fixed-shape greedy IoU NMS for the detector head.

The reference delegates NMS to ultralytics' postprocessing
(fast_pose_predictor.py:49 via YOLO()); on TPU we need a static-shape,
compile-friendly version: scores are pre-sorted, then a sequential greedy
sweep suppresses overlapping boxes. O(K^2) with K = candidate count (<= a few
hundred), fully vectorized per step — negligible next to the conv backbone.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["iou_matrix", "nms"]


def iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU. a: (N,4), b: (M,4) xyxy -> (N,M)."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
        iou_threshold: float = 0.7) -> jax.Array:
    """Greedy NMS keep-mask over score-descending order.

    boxes: (K, 4) float xyxy; scores: (K,); valid: (K,) bool (padded lanes
    False). Returns keep: (K,) bool in the ORIGINAL box order.
    """
    k = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes[order]
    v = valid[order]
    iou = iou_matrix(b, b)

    def body(i, alive):
        # If candidate i is still alive, kill all lower-ranked overlaps.
        suppress = (iou[i] > iou_threshold) & (jnp.arange(k) > i) & alive[i]
        return alive & ~suppress

    alive = jax.lax.fori_loop(0, k, body, v)
    # Scatter back to original order.
    keep = jnp.zeros((k,), bool).at[order].set(alive)
    return keep
