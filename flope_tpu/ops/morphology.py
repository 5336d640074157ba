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


@functools.partial(jax.jit, static_argnames=("ksize", "iterations"))
def erode(mask: jax.Array, ksize: int = 3, iterations: int = 1) -> jax.Array:
    """Binary erosion with a cv2 elliptical SE; matches cv2.erode defaults.

    mask: (H, W) bool/0-1. Border pixels are treated as True (cv2's
    morphologyDefaultBorderValue is +inf for erosion). Anchor is the cv2
    default center (ksize//2), which for even kernels pads asymmetrically.
    """
    se = jnp.asarray(ellipse_kernel(ksize), jnp.float32)[..., None, None]  # HWIO
    count = float(ellipse_kernel(ksize).sum())
    anchor = ksize // 2
    pad = ((anchor, ksize - 1 - anchor), (anchor, ksize - 1 - anchor))
    x = mask.astype(jnp.float32)[None, ..., None]  # NHWC
    for _ in range(iterations):
        x = jnp.where(
            jax.lax.conv_general_dilated(
                jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)), constant_values=1.0),
                se,
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            >= count - 0.5,
            1.0,
            0.0,
        )
    return x[0, ..., 0] > 0.5
