"""Bounding-box ops, vectorized over a fixed MAX_DET slot axis with validity masks.

The reference handles variable flower counts with Python loops, ``None`` returns
and boolean-indexing filters (pose_predictor.py:95-132, mvg.py:324-362). XLA
needs static shapes, so every op here takes/returns a fixed-size box array plus
a ``valid`` mask; "filtering" means clearing mask bits, never changing shapes.

Boxes are [xmin, ymin, xmax, ymax]. Integer box math is done in int32 so the
reference's Python ``int()`` truncation semantics are reproduced exactly for
integer inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "squarify_boxes",
    "boxes_in_frame",
    "filter_very_large_boxes",
    "box_centers",
    "clamp_square_boxes",
    "masked_median",
]


def squarify_boxes(boxes: jax.Array) -> jax.Array:
    """Grow the short side of each box to make it square, centered.

    Semantics of the reference squarify_bb (mvg.py:324-346): the short side's
    min shrinks by ceil(diff/2) and its max grows by floor(diff/2); results are
    truncated to int. Integer inputs round-trip exactly.
    boxes: (..., 4) int or float -> (..., 4) int32.
    """
    b = jnp.asarray(boxes)
    if not jnp.issubdtype(b.dtype, jnp.integer):
        b = b.astype(jnp.int32)  # reference boxes are int before squarify
    b = b.astype(jnp.int32)
    xmin, ymin, xmax, ymax = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    xrange = xmax - xmin
    yrange = ymax - ymin
    diff = jnp.abs(xrange - yrange)
    dec = (diff + 1) // 2  # ceil(diff/2)
    inc = diff // 2        # floor(diff/2)
    wide = xrange > yrange
    tall = xrange < yrange
    ymin = jnp.where(wide, ymin - dec, ymin)
    ymax = jnp.where(wide, ymax + inc, ymax)
    xmin = jnp.where(tall, xmin - dec, xmin)
    xmax = jnp.where(tall, xmax + inc, xmax)
    return jnp.stack([xmin, ymin, xmax, ymax], axis=-1)


def boxes_in_frame(boxes: jax.Array, height, width) -> jax.Array:
    """True where the whole box lies inside the frame. (mvg.py:348-355)

    Note the reference uses strict ``xmax > w`` / ``ymax > h`` as out-of-frame,
    i.e. xmax == w is still in frame (slicing is exclusive).
    """
    b = boxes
    return (
        (b[..., 0] >= 0)
        & (b[..., 1] >= 0)
        & (b[..., 2] <= width)
        & (b[..., 3] <= height)
    )


def masked_median(x: jax.Array, valid: jax.Array) -> jax.Array:
    """Median over the valid entries of the last axis (numpy semantics: the mean
    of the two middle order statistics for even counts). Invalid lanes are
    ignored; returns 0 if nothing is valid."""
    n = x.shape[-1]
    big = jnp.asarray(jnp.finfo(jnp.float32).max, x.dtype)
    xs = jnp.sort(jnp.where(valid, x, big), axis=-1)
    cnt = jnp.sum(valid, axis=-1).astype(jnp.int32)
    hi = jnp.clip(cnt // 2, 0, n - 1)
    lo = jnp.clip((cnt - 1) // 2, 0, n - 1)
    med = 0.5 * (
        jnp.take_along_axis(xs, lo[..., None], axis=-1)[..., 0]
        + jnp.take_along_axis(xs, hi[..., None], axis=-1)[..., 0]
    )
    return jnp.where(cnt > 0, med, 0.0)


def filter_very_large_boxes(boxes: jax.Array, valid: jax.Array) -> jax.Array:
    """Clear mask bits for boxes with area > 5x the median area of valid boxes.

    Semantics of filter_very_large_bb (mvg.py:357-362), expressed as a mask
    update: the reference physically drops rows; we keep slots and invalidate.
    boxes: (..., N, 4), valid: (..., N) -> new valid mask.
    """
    w = (boxes[..., 2] - boxes[..., 0]).astype(jnp.float32)
    h = (boxes[..., 3] - boxes[..., 1]).astype(jnp.float32)
    area = w * h
    med = masked_median(area, valid)
    return valid & ~(area > 5.0 * med[..., None])


def box_centers(boxes: jax.Array) -> jax.Array:
    """(xmin+xmax)/2, (ymin+ymax)/2 as float. (pose_predictor.py:99-101)"""
    b = boxes.astype(jnp.float32)
    return jnp.stack(
        [(b[..., 0] + b[..., 2]) / 2.0, (b[..., 1] + b[..., 3]) / 2.0], axis=-1
    )


def clamp_square_boxes(boxes: jax.Array, height, width) -> jax.Array:
    """Shift out-of-frame square boxes back inside the frame.

    Semantics of get_square_bb's clamping branch
    (scripts/generate_metrics_utils.py:156-176): each violated side is shifted
    (not shrunk), applied in the order xmin, ymin, xmax, ymax.
    boxes: (..., 4) int32 square boxes.
    """
    b = boxes.astype(jnp.int32)
    xmin, ymin, xmax, ymax = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    # xmin < 0 -> shift right
    shift = jnp.where(xmin < 0, -xmin, 0)
    xmin, xmax = xmin + shift, xmax + shift
    # ymin < 0 -> shift down
    shift = jnp.where(ymin < 0, -ymin, 0)
    ymin, ymax = ymin + shift, ymax + shift
    # xmax > w -> shift left
    shift = jnp.where(xmax > width, xmax - width, 0)
    xmin, xmax = xmin - shift, xmax - shift
    # ymax > h -> shift up
    shift = jnp.where(ymax > height, ymax - height, 0)
    ymin, ymax = ymin - shift, ymax - shift
    return jnp.stack([xmin, ymin, xmax, ymax], axis=-1)
