"""Fixed-shape greedy IoU NMS for the detector head.

The reference delegates NMS to ultralytics' postprocessing
(fast_pose_predictor.py:49 via YOLO()); on TPU we need a static-shape,
compile-friendly version that produces the exact greedy keep set.

A literal greedy sweep is K sequential steps — latency-bound on TPU (each
step is a tiny op; round 1 measured it as the detector-path bottleneck).
Instead we solve the greedy recurrence

    alive[i] = valid[i] and no higher-scored ALIVE box overlaps i

as a fixpoint: iterate alive <- valid & (S @ alive == 0) where S is the
lower-triangular suppression matrix in score order. Each iteration is one
KxK matvec (MXU work, fully parallel); the iteration converges to the unique
fixpoint — which IS the greedy solution — in (longest suppression chain + 1)
steps, typically 2-3 for real scenes vs K=64 sequential steps before.

Convergence proof sketch: the update f is antitone, and f(a)[i] depends only
on a[j] for ranks j < i; by induction on rank, any pair of states with
a = f(b), b = f(a) must be equal, so there are no 2-cycles and the
even/odd-iterate sandwich collapses onto the fixpoint.
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
    # sup[i, j] = True if higher-ranked j would suppress i (strict lower
    # triangle of the thresholded IoU matrix, in score order).
    ranks = jnp.arange(k)
    sup = ((iou > iou_threshold) & (ranks[None, :] < ranks[:, None])
           ).astype(jnp.float32)

    def cond(carry):
        alive, prev, it = carry
        return (it < k) & jnp.any(alive != prev)

    def body(carry):
        alive, _, it = carry
        hits = sup @ alive.astype(jnp.float32)  # alive suppressors per box
        return v & (hits == 0), alive, it + 1

    alive, _, _ = jax.lax.while_loop(
        cond, body, (v, jnp.zeros_like(v), jnp.int32(0)))
    # Scatter back to original order.
    keep = jnp.zeros((k,), bool).at[order].set(alive)
    return keep
