"""Batched box crop + resize as MXU matmuls.

The reference's per-flower Python loop (pose_predictor.py:139-149) does N
variable-size `cv2.resize(..., INTER_LANCZOS4)` crops per frame on the CPU.
On TPU, gathers are slow and variable shapes don't compile, so we express
crop+resize of N boxes as two dense contractions with per-box **separable
sampling matrices**:

    out[n,i,j,c] = sum_y sum_x  Wy[n,i,y] * image[y,x,c] * Wx[n,j,x]

Each row of W holds the (lanczos4 | bilinear) interpolation taps for one
output coordinate; everything lands on the systolic array as batched matmuls.
Border taps are folded onto edge pixels (cv2 BORDER_REPLICATE semantics for
resize) and weights are row-normalized like cv2's fixed-point coefficients.

cv2 writes each resized crop back to uint8 (saturating + rounding) before the
mask multiply; `quantize_uint8=True` replicates that for bit-level parity.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["sampling_weights", "crop_resize", "crop_resize_with_mask", "resize_image"]

_MARGIN = 8  # max tap overhang: lanczos4 reaches floor(s)-3 .. floor(s)+4


def _lanczos4(x: jax.Array) -> jax.Array:
    """Lanczos kernel with a=4 (cv2 INTER_LANCZOS4's 8-tap kernel)."""
    a = 4.0
    pix = jnp.pi * x
    # sinc(x)*sinc(x/a) with the removable singularity at 0.
    safe = jnp.where(jnp.abs(x) < 1e-7, 1.0, pix)
    val = a * jnp.sin(safe) * jnp.sin(safe / a) / (safe * safe)
    val = jnp.where(jnp.abs(x) < 1e-7, 1.0, val)
    return jnp.where(jnp.abs(x) < a, val, 0.0)


def _bilinear(x: jax.Array) -> jax.Array:
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


_KERNELS = {"lanczos4": _lanczos4, "bilinear": _bilinear}


def sampling_weights(start: jax.Array, size: jax.Array, out_size: int, in_size: int,
                     method: str = "lanczos4",
                     valid_size: jax.Array | None = None) -> jax.Array:
    """Per-box 1-D resampling matrices.

    For box axis [start, start+size) resized to out_size, output index i
    samples source coordinate s = start + (i + 0.5) * size / out_size - 0.5
    (cv2's align convention). Crucially, the reference crops *before* resizing
    (pose_predictor.py:139-146), so kernel taps that fall outside the **box**
    replicate the box-edge pixel — not neighboring image content. Taps outside
    [start, start+size) are therefore folded onto the box-edge pixels, then
    rows are normalized to unit sum (cv2 scales its fixed-point coefficients
    the same way).

    start, size: (N,) floats (integer-valued for crop parity). Returns
    (N, out_size, in_size); degenerate boxes produce all-zero rows (finite).

    valid_size: optional (N,) — taps at coordinates >= valid_size are DROPPED
    before the fold (excluded from the folded mass; normalization rescales
    the survivors). This reproduces, inside a window that extends past the
    image, exactly what the windowless path does for boxes at the image
    boundary, where out-of-image taps don't exist at all. Used by the Pallas
    crop kernel, whose tile-aligned windows can cover padded rows/cols.
    """
    scale = (size / out_size)[:, None]  # (N,1)
    i = jax.lax.broadcasted_iota(jnp.float32, (1, out_size), 1)
    s = start[:, None] + (i + 0.5) * scale - 0.5  # (N,out) image coords

    ye = jax.lax.broadcasted_iota(jnp.float32, (1, 1, in_size), 2)
    if method == "lanczos4":
        # Dense L(s - y) evaluation would cost O(N*out*in) transcendentals —
        # the pipeline's hot spot. Factor them out instead: for integer y,
        #   sin(pi(s-y))   = (-1)^y sin(pi s)
        #   sin(pi(s-y)/4) = sin(pi s/4) cos(pi y/4) - cos(pi s/4) sin(pi y/4)
        # so only O(N*out + in) sin/cos evaluations remain; the (N,out,in)
        # grid is pure multiply/divide on the VPU.
        x = s[..., None] - ye                      # (N,out,in)
        sin_pis = jnp.sin(jnp.pi * s)[..., None]   # (N,out,1)
        sin_pis4 = jnp.sin(jnp.pi * s / 4.0)[..., None]
        cos_pis4 = jnp.cos(jnp.pi * s / 4.0)[..., None]
        y_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, in_size), 2)
        neg1_y = jnp.where((y_i % 2) == 0, 1.0, -1.0)
        cos_piy4 = jnp.cos(jnp.pi * ye / 4.0)      # (1,1,in): in-axis constants
        sin_piy4 = jnp.sin(jnp.pi * ye / 4.0)
        sin_a = neg1_y * sin_pis                   # sin(pi x)
        sin_b = sin_pis4 * cos_piy4 - cos_pis4 * sin_piy4  # sin(pi x / 4)
        x2 = x * x
        val = 4.0 * sin_a * sin_b / (jnp.pi * jnp.pi * jnp.maximum(x2, 1e-14))
        val = jnp.where(jnp.abs(x) < 1e-7, 1.0, val)
        w = jnp.where(jnp.abs(x) < 4.0, val, 0.0)  # (N,out,in)
    else:
        w = _KERNELS[method](s[..., None] - ye)

    if valid_size is not None:
        ve = jax.lax.broadcasted_iota(jnp.float32, (1, 1, in_size), 2)
        w = jnp.where(ve < valid_size[:, None, None], w, 0.0)

    # Box-edge replicate: move weight mass outside [start, start+size) onto the
    # first/last pixel of the box. Taps beyond kernel support are zero anyway.
    lo = jnp.clip(jnp.floor(start).astype(jnp.int32), 0, in_size - 1)  # (N,)
    hi = jnp.clip(jnp.ceil(start + size).astype(jnp.int32) - 1, 0, in_size - 1)
    yi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, in_size), 2)
    left_of = yi < lo[:, None, None]
    right_of = yi > hi[:, None, None]
    left_mass = jnp.sum(jnp.where(left_of, w, 0.0), axis=-1)   # (N,out)
    right_mass = jnp.sum(jnp.where(right_of, w, 0.0), axis=-1)
    w = jnp.where(left_of | right_of, 0.0, w)
    w = w + left_mass[..., None] * (yi == lo[:, None, None])
    w = w + right_mass[..., None] * (yi == hi[:, None, None])

    # Row-normalize; degenerate (zero-mass) rows stay zero instead of NaN.
    denom = jnp.sum(w, axis=-1, keepdims=True)
    return jnp.where(denom > 1e-8, w / jnp.where(denom > 1e-8, denom, 1.0), 0.0)


def _quantize(x: jax.Array) -> jax.Array:
    """cv2 stores resized uint8 images with saturate+round; replicate."""
    return jnp.clip(jnp.round(x), 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("out_size", "method", "quantize_uint8"))
def crop_resize(image: jax.Array, boxes: jax.Array, out_size: int = 512,
                method: str = "lanczos4", quantize_uint8: bool = True) -> jax.Array:
    """Crop N boxes out of one image and resize each to (out_size, out_size).

    image: (H, W, C) float32 in [0, 255]; boxes: (N, 4) [xmin, ymin, xmax, ymax]
    (any dtype; zero-size boxes in padded lanes are safe — they produce a
    degenerate but finite sample of the corner pixel). Returns (N, out, out, C).
    """
    image = image.astype(jnp.float32)
    h, w = image.shape[0], image.shape[1]
    b = boxes.astype(jnp.float32)
    xsize = jnp.maximum(b[:, 2] - b[:, 0], 1e-3)
    ysize = jnp.maximum(b[:, 3] - b[:, 1], 1e-3)
    wy = sampling_weights(b[:, 1], ysize, out_size, h, method)  # (N,out,H)
    wx = sampling_weights(b[:, 0], xsize, out_size, w, method)  # (N,out,W)
    # Contract H first: (N,out,H) x (H,W,C) -> (N,out,W,C), then W.
    tmp = jnp.einsum("niy,ywc->niwc", wy, image, preferred_element_type=jnp.float32)
    out = jnp.einsum("njw,niwc->nijc", wx, tmp, preferred_element_type=jnp.float32)
    if quantize_uint8:
        out = _quantize(out)
    return out


@functools.partial(jax.jit, static_argnames=("out_size", "method",
                                             "quantize_uint8", "region_size",
                                             "compute_dtype"))
def crop_resize_with_mask(image: jax.Array, mask: jax.Array, boxes: jax.Array,
                          out_size: int = 512, method: str = "lanczos4",
                          quantize_uint8: bool = True,
                          region_size: int | None = None,
                          compute_dtype: Any = jnp.float32) -> jax.Array:
    """The reference's crop pipeline (pose_predictor.py:139-149), fused:

    resize(image crop) * (resize(mask crop) / 255), both Lanczos4, where mask
    is the {0,255} uint8 segmentation image. Returns (N, out, out, C) floats
    in [0, 255] (background-zeroed crops, NOT yet /255-normalized — the model
    input normalization divides by 255 exactly like pose_predictor.py:151).

    region_size: if set, each box first dynamic-slices a (region, region)
    window around itself and the sampling matmuls contract over `region`
    instead of the full frame axis — a ~2-3x FLOP cut at 1080p. Exact as long
    as every box fits in the window (boxes larger than region_size get their
    overhang replicated from the window edge). None = exact full-frame path.

    compute_dtype: dtype for the sampling contractions. jnp.bfloat16 runs the
    einsums as single-pass MXU matmuls (uint8 pixel values are exact in bf16;
    the ~2^-8 relative tap-weight rounding lands within +-1 uint8 LSB after
    quantization) — the deployment fast path. float32 is the bit-parity path.
    Accumulation is float32 either way.
    """
    image = image.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    h, w = image.shape[0], image.shape[1]
    b = boxes.astype(jnp.float32)
    xsize = jnp.maximum(b[:, 2] - b[:, 0], 1e-3)
    ysize = jnp.maximum(b[:, 3] - b[:, 1], 1e-3)
    stacked = jnp.concatenate([image, mask[..., None]], axis=-1)  # (H,W,C+1)

    if region_size is not None and region_size < min(h, w):
        r = region_size
        # Window origin: center the box, clamp into the frame (dynamic_slice
        # clamps too, but we need the actual origin for weight coordinates).
        cx = (b[:, 0] + b[:, 2]) / 2.0
        cy = (b[:, 1] + b[:, 3]) / 2.0
        rx = jnp.clip(jnp.round(cx - r / 2.0), 0, w - r).astype(jnp.int32)
        ry = jnp.clip(jnp.round(cy - r / 2.0), 0, h - r).astype(jnp.int32)
        regions = jax.vmap(
            lambda y0, x0: jax.lax.dynamic_slice(stacked, (y0, x0, 0),
                                                 (r, r, stacked.shape[-1]))
        )(ry, rx)  # (N, r, r, C+1)
        wy = sampling_weights(b[:, 1] - ry, ysize, out_size, r, method)
        wx = sampling_weights(b[:, 0] - rx, xsize, out_size, r, method)
        tmp = jnp.einsum("niy,nywc->niwc", wy.astype(compute_dtype),
                         regions.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
    else:
        wy = sampling_weights(b[:, 1], ysize, out_size, h, method)
        wx = sampling_weights(b[:, 0], xsize, out_size, w, method)
        tmp = jnp.einsum("niy,ywc->niwc", wy.astype(compute_dtype),
                         stacked.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
    out = jnp.einsum("njw,niwc->nijc", wx.astype(compute_dtype),
                     tmp.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    if quantize_uint8:
        out = _quantize(out)
    img_rs, mask_rs = out[..., :-1], out[..., -1:]
    return img_rs * (mask_rs / 255.0)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "method",
                                             "quantize_uint8", "compute_dtype"))
def resize_image(image: jax.Array, out_h: int, out_w: int,
                 method: str = "bilinear", quantize_uint8: bool = False,
                 compute_dtype: Any = jnp.float32) -> jax.Array:
    """Whole-image resize with the same matmul machinery (used e.g. to scale
    the detector's proto-resolution mask up to frame resolution, matching
    fast_pose_predictor.py:54's cv2.resize default INTER_LINEAR).

    compute_dtype=jnp.bfloat16 runs the two sampling contractions on the MXU
    in one pass (f32 accumulation); for uint8-range imagery the output drift
    is sub-LSB — use it when the consumer is a bf16 model input or a
    thresholded mask."""
    image = image.astype(jnp.float32)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    h, w = image.shape[0], image.shape[1]
    zero = jnp.zeros((1,), jnp.float32)
    wy = sampling_weights(zero, jnp.full((1,), float(h)), out_h, h, method)[0]
    wx = sampling_weights(zero, jnp.full((1,), float(w)), out_w, w, method)[0]
    tmp = jnp.einsum("iy,ywc->iwc", wy.astype(compute_dtype),
                     image.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("jw,iwc->ijc", wx.astype(compute_dtype),
                     tmp.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    if quantize_uint8:
        out = _quantize(out)
    return out[..., 0] if squeeze else out
