"""Masked per-box depth pooling: the reference's get_depth_value, batched on TPU.

Reference semantics (sunflower/utils/image_manipulation.py:39-96):
  1. optional scale; band mask = (depth > near) & (depth < far)
  2. seg = (seg_mask > 128) & band, then elliptical erosion (ksize 10)
  3. per box: mean of depth over (eroded mask ∩ box rect); 0 if no pixels
  4. reliable iff >= 50 masked pixels in the box

The reference loops boxes in Python with numpy slicing; here each box becomes
a broadcasted-iota rectangle mask and the means are batched reductions — one
fused XLA kernel for all MAX_DET boxes. The reference's mm round trip
(*1000 then /1000 around the mean) is a numerical no-op and is omitted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flope_tpu.ops.morphology import erode

__all__ = ["masked_depth_value"]


@functools.partial(jax.jit, static_argnames=("erode_ksize", "min_pixels"))
def masked_depth_value(
    boxes: jax.Array,
    depth: jax.Array,
    seg_mask: jax.Array,
    near_plane: float = 0.1,
    far_plane: float = 3.0,
    erode_ksize: int = 10,
    min_pixels: int = 50,
) -> tuple[jax.Array, jax.Array]:
    """Per-box flower depth (meters) + reliability flags.

    boxes: (N, 4) int [xmin, ymin, xmax, ymax] (exclusive max, like numpy
    slicing in the reference). depth: (H, W) float meters. seg_mask: (H, W)
    uint8 {0,255} or bool. Returns (values (N,), reliable (N,)).
    Padded/degenerate boxes yield value 0 and reliable=False naturally.
    """
    h, w = depth.shape
    depth = depth.astype(jnp.float32)
    band = (depth > near_plane) & (depth < far_plane)
    seg = seg_mask > 128 if seg_mask.dtype != jnp.bool_ else seg_mask
    m = erode(seg & band, erode_ksize)

    b = boxes.astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    rect = (
        (rows >= b[:, 1, None, None])
        & (rows < b[:, 3, None, None])
        & (cols >= b[:, 0, None, None])
        & (cols < b[:, 2, None, None])
    )  # (N, H, W)
    sel = rect & m[None]
    cnt = jnp.sum(sel, axis=(1, 2))
    total = jnp.sum(jnp.where(sel, depth[None], 0.0), axis=(1, 2))
    values = jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)
    reliable = cnt >= min_pixels
    return values, reliable
