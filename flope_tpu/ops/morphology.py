"""Binary morphology: cv2-compatible elliptical structuring elements + erosion.

Replaces the reference's ``cv2.erode`` with elliptical kernel
(sunflower/utils/image_manipulation.py:21-36, shrink_mask) with an XLA
convolution: erosion(mask) = (conv(mask, SE) == SE.count), using cv2's border
semantics (erode's default border acts as +inf, i.e. True for binary masks).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["ellipse_kernel", "erode"]


@functools.lru_cache(maxsize=None)
def ellipse_kernel(ksize: int) -> np.ndarray:
    """cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize)) replica.

    Reimplements OpenCV's inscribed-ellipse rasterization so the reference's
    exact pixel footprint (kernel_size=10 at image_manipulation.py:67) is
    reproduced without a cv2 runtime dependency. Verified against cv2 in tests.
    """
    rows = cols = ksize
    r = rows // 2
    c = cols // 2
    inv_r2 = 1.0 / (r * r) if r else 0.0
    k = np.zeros((rows, cols), dtype=np.uint8)
    for i in range(rows):
        dy = i - r
        if abs(dy) <= r:
            # OpenCV's saturate_cast<int>(double) rounds half-to-even (cvRound).
            dx = int(np.rint(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
            j1 = max(c - dx, 0)
            j2 = min(c + dx + 1, cols)
            k[i, j1:j2] = 1
    return k


@functools.lru_cache(maxsize=None)
def _rect_decomposition(ksize: int) -> tuple[tuple[int, int, int, int], ...]:
    """Decompose the convex elliptical SE into maximal rectangles
    (r0, r1, c0, c1), inclusive. Union of rects == SE exactly, so
    erosion(SE) == AND of per-rectangle erosions — and each rectangle erosion
    is a separable min-pool, which XLA lowers orders of magnitude faster than
    a single-channel 2-D convolution (measured 88 ms -> sub-ms at 1080p x16).
    """
    k = ellipse_kernel(ksize)
    rows = []
    for i in range(ksize):
        js = np.where(k[i])[0]
        rows.append((int(js[0]), int(js[-1])) if len(js) else None)
    rects = []
    widths = sorted({(c0, c1) for r in rows if r for (c0, c1) in [r]})
    for (c0, c1) in widths:
        # Rows whose interval covers [c0, c1] form a contiguous block
        # (convexity of the ellipse).
        covering = [i for i, r in enumerate(rows)
                    if r and r[0] <= c0 and r[1] >= c1]
        r0, r1 = covering[0], covering[-1]
        assert covering == list(range(r0, r1 + 1))
        rects.append((r0, r1, c0, c1))
    # Validate exactness.
    rec = np.zeros_like(k)
    for (r0, r1, c0, c1) in rects:
        rec[r0:r1 + 1, c0:c1 + 1] = 1
    assert (rec == k).all(), "rect decomposition must reproduce the SE"
    return tuple(rects)


@functools.partial(jax.jit, static_argnames=("ksize", "iterations"))
def erode(mask: jax.Array, ksize: int = 3, iterations: int = 1) -> jax.Array:
    """Binary erosion with a cv2 elliptical SE; matches cv2.erode defaults.

    mask: (H, W) bool/0-1. Border pixels are treated as True (cv2's
    morphologyDefaultBorderValue is +inf for erosion). Anchor is the cv2
    default center (ksize//2), which for even kernels pads asymmetrically.

    Implementation: union-of-rectangles decomposition of the SE; erosion by a
    union of SEs is the intersection of the individual erosions, and each
    rectangle erosion is a fast separable min-pool (reduce_window).
    """
    anchor = ksize // 2
    h, w = mask.shape
    rects = _rect_decomposition(ksize)
    x = mask.astype(jnp.bool_)
    for _ in range(iterations):
        # True border = erosion-neutral (cv2's +inf default border).
        padded = jnp.pad(x, ksize, constant_values=True)
        out = jnp.ones_like(x)
        for (r0, r1, c0, c1) in rects:
            hh, ww = r1 - r0 + 1, c1 - c0 + 1
            mins = jax.lax.reduce_window(
                padded, True, jax.lax.bitwise_and,
                window_dimensions=(hh, ww), window_strides=(1, 1),
                padding="VALID")
            y0 = ksize + r0 - anchor
            x0 = ksize + c0 - anchor
            out = out & jax.lax.dynamic_slice(mins, (y0, x0), (h, w))
        x = out
    return x
