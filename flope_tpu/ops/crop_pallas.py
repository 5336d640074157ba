"""Pallas TPU kernel for the batched masked crop+resize.

The XLA region path (ops/crop_resize.py, `region_size=`) materializes every
box's (r, r, 4) window to HBM (dynamic_slice), reads it back for the first
sampling contraction, and writes the (out, r) intermediate — ~3 HBM round
trips over ~400 MB per 16-frame batch. This kernel fuses the whole per-box
pipeline in VMEM:

    HBM window DMA -> Wy @ region (MXU) -> tmp @ Wx^T (MXU)
    -> uint8 quantize -> mask multiply -> (3, out, out) crop

one grid step per box, with the window origins + frame indices scalar-
prefetched so each DMA address is known before the body runs, and the
window DMA double-buffered across grid steps (next box's window streams in
while this box's matmuls run). Frames are passed PLANAR ((4, H, W): rgb +
segmentation mask) so each channel's two contractions are clean MXU matmuls
— channels-last would put C=4 in the lane dimension and waste 97% of the
MXU.

Batching is EXPLICIT: (F, H, W, 3) frames x (F, N, 4) boxes flatten to one
F*N-step grid. Do NOT vmap this function — jax's pallas batching rule
prepends a grid axis, which silently re-targets `pl.program_id(0)` and
breaks the scalar-prefetch indexing (observed as wrong crops on TPU while
interpret mode stays correct).

Sampling semantics are identical to ops/crop_resize.py: the separable
Lanczos4/bilinear weights (with box-edge replication + row normalization)
are computed OUTSIDE the kernel by `sampling_weights` — the kernel is pure
data movement + matmul, so cv2-parity lives in one place.

Reference being accelerated: the per-flower crop loop of
pose_predictor.py:139-149 / fast_pose_predictor.py:109-119.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flope_tpu.ops.crop_resize import sampling_weights

__all__ = ["crop_resize_with_mask_pallas"]


def _kernel(fidx_ref, ry_ref, rx_ref, frames_ref, wy_ref, wx_ref, out_ref,
            region, sem, *, r: int, rw: int, out_size: int, quantize: bool,
            compute_dtype):
    k = pl.program_id(0)
    total = pl.num_programs(0)

    def start_dma(step, slot):
        # Window DMA: (4, r, rw) from the planar frame at this box's origin.
        # Mosaic must prove the slice start divisible by the tile in both
        # tiled dims; the host aligned ry to 16 and rx to 128, but it can't
        # see through the prefetched scalars — assert with multiple_of.
        f = fidx_ref[step]
        y0 = pl.multiple_of(ry_ref[step], 16)
        x0 = pl.multiple_of(rx_ref[step], 128)
        return pltpu.make_async_copy(
            frames_ref.at[f, :, pl.ds(y0, r), pl.ds(x0, rw)],
            region.at[slot], sem.at[slot])

    slot = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _():
        start_dma(0, 0).start()

    @pl.when(k + 1 < total)
    def _():
        start_dma(k + 1, jax.lax.rem(k + 1, 2)).start()

    start_dma(k, slot).wait()

    wy = wy_ref[0].astype(compute_dtype)          # (out, r)
    wx_t = wx_ref[0].astype(compute_dtype)        # (rw, out), pre-transposed
    reg = region[slot].astype(compute_dtype)      # (4, r, rw)

    # Stage 1: per-channel row contraction, stacked along sublanes so stage
    # 2 is ONE (4*out, rw) @ (rw, out) MXU matmul instead of four — the MXU
    # stays busy through what used to be three extra dispatch/VPU gaps, and
    # the quantize tail runs once over the fused block.
    tmp = jnp.concatenate(
        [jnp.dot(wy, reg[c], preferred_element_type=jnp.float32
                 ).astype(compute_dtype) for c in range(4)],
        axis=0)                                   # (4*out, rw)
    res = jnp.dot(tmp, wx_t, preferred_element_type=jnp.float32)  # (4*out, out)
    if quantize:
        res = jnp.clip(jnp.round(res), 0.0, 255.0)
    planes = res.reshape(4, out_size, out_size)
    m = planes[3] * (1.0 / 255.0)
    dt = out_ref.dtype
    # Crops leave the kernel PLANAR (3, out, out) — their natural layout.
    # In-kernel NHWC interleave is NOT possible: the (out, out, 3) ->
    # (out, 3*out) lane-stride-3 relayout is a Mosaic "unsupported shape
    # cast" on real TPU (v5e, 2026-08), and the cross-register lane shuffle
    # it would need is the same cost the XLA transpose already pays. Feed
    # planar crops to the model instead (PoseNet input_layout="NCHW").
    out_ref[0, 0] = (planes[0] * m).astype(dt)
    out_ref[0, 1] = (planes[1] * m).astype(dt)
    out_ref[0, 2] = (planes[2] * m).astype(dt)


@functools.partial(jax.jit, static_argnames=("out_size", "method",
                                             "quantize_uint8", "region_size",
                                             "compute_dtype", "interpret",
                                             "layout"))
def crop_resize_with_mask_pallas(
    image: jax.Array, mask: jax.Array, boxes: jax.Array,
    out_size: int = 256, method: str = "lanczos4",
    quantize_uint8: bool = True, region_size: int = 448,
    compute_dtype: Any = jnp.float32, interpret: bool = False,
    layout: str = "NHWC") -> jax.Array:
    """Drop-in for ops/crop_resize.crop_resize_with_mask (region path), as a
    fused Pallas kernel. Single frame: image (H, W, 3), mask (H, W) {0,255},
    boxes (N, 4) xyxy -> (N, out, out, 3). Batched: image (F, H, W, 3), mask
    (F, H, W), boxes (F, N, 4) -> (F, N, out, out, 3). Background-zeroed
    crops in [0, 255] float32 (identical contract to the XLA path).

    layout="NCHW" returns the kernel's NATIVE planar crops ((..., 3, out,
    out)) with no transpose in the graph — pair with PoseNet
    input_layout="NCHW" so the stem conv absorbs the relayout. (In-kernel
    NHWC interleave is a Mosaic unsupported shape cast on real TPU; the
    planar path is the supported way to skip the explicit transpose.)

    Exactness bound (same caveat family as the XLA region path, tightened by
    DMA tile alignment): box height <= region_size - 16 and box width <=
    round_up(region_size, 128) - 128; larger boxes degrade gracefully to
    window-edge replication. interpret=True runs the kernel in interpreter
    mode (CPU testing). Do NOT vmap — pass the batch explicitly.
    """
    batched = image.ndim == 4
    if not batched:
        image, mask, boxes = image[None], mask[None], boxes[None]
    fcount, h, w = image.shape[0], image.shape[1], image.shape[2]
    r = region_size
    n = boxes.shape[1]
    if r % 16:
        raise ValueError(f"region_size must be a multiple of 16, got {r}")
    h_pad = -(-h // 16) * 16
    rw = -(-r // 128) * 128
    w_pad = max(-(-w // 128) * 128, rw)
    if r > h_pad:
        raise ValueError(
            f"region_size={r} exceeds the padded frame height {h_pad} "
            f"(frame {h}x{w}); window origins would go negative. Use "
            f"region_size <= {h_pad} or the XLA crop backend")
    # VMEM budget guard: the double-buffered window scratch is
    # 2*4*r*round_up(r,128)*itemsize bytes and must leave room for the
    # pipelined weight/output blocks inside ~16 MB of VMEM. The deployed
    # 448/bf16 config uses 3.7 MB; region 768 in f32 would need 18.9 MB and
    # Mosaic would fail to allocate — fail early with guidance instead.
    itemsize = 2 if compute_dtype == jnp.bfloat16 else 4
    scratch_bytes = 2 * 4 * r * (-(-r // 128) * 128) * itemsize
    if scratch_bytes > 12 * 1024 * 1024:
        raise ValueError(
            f"region_size={r} with {'bf16' if itemsize == 2 else 'f32'} "
            f"windows needs {scratch_bytes / 2**20:.1f} MB of VMEM scratch "
            f"(> 12 MB budget); use region_size <= "
            f"{'768' if itemsize == 2 else '512'} or "
            f"compute_dtype=jnp.bfloat16, or the XLA crop backend")

    b = boxes.reshape(fcount * n, 4).astype(jnp.float32)
    fidx = jnp.repeat(jnp.arange(fcount, dtype=jnp.int32), n)
    xsize = jnp.maximum(b[:, 2] - b[:, 0], 1e-3)
    ysize = jnp.maximum(b[:, 3] - b[:, 1], 1e-3)
    cx = (b[:, 0] + b[:, 2]) / 2.0
    cy = (b[:, 1] + b[:, 3]) / 2.0
    # Tile-aligned window origins (16 sublanes, 128 lanes). The sampling
    # weights take the actual origin, so alignment only shifts the window;
    # frames are zero-padded to tile-multiple H/W so edge-of-frame windows
    # stay aligned — padded pixels carry zero weight after box-edge folding
    # (the box itself is always inside the real image), so their content
    # never leaks.
    ry = jnp.clip(jnp.round(cy - r / 2.0), 0, h_pad - r).astype(jnp.int32)
    ry = (ry // 16) * 16
    ry = ry + 16 * jnp.ceil(
        jnp.maximum(b[:, 3] - (ry + r).astype(jnp.float32), 0.0) / 16.0
    ).astype(jnp.int32)
    ry = jnp.clip(ry, 0, h_pad - r)
    rx = jnp.clip(jnp.round(cx - rw / 2.0), 0, w_pad - rw).astype(jnp.int32)
    rx = (rx // 128) * 128
    rx = rx + 128 * jnp.ceil(
        jnp.maximum(b[:, 2] - (rx + rw).astype(jnp.float32), 0.0) / 128.0
    ).astype(jnp.int32)
    rx = jnp.clip(rx, 0, w_pad - rw)
    # valid_size: drop taps that land in the zero-padded region beyond the
    # real image, matching the windowless path's boundary-box behavior
    # (taps outside the image don't exist; normalization rescales).
    wy = sampling_weights(b[:, 1] - ry, ysize, out_size, r, method,
                          valid_size=(h - ry).astype(jnp.float32))
    wx = sampling_weights(b[:, 0] - rx, xsize, out_size, rw, method,
                          valid_size=(w - rx).astype(jnp.float32))

    store = jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32
    frames = jnp.concatenate(
        [image.astype(jnp.float32).transpose(0, 3, 1, 2),
         mask.astype(jnp.float32)[:, None]], axis=1).astype(store)
    if h_pad != h or w_pad != w:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, h_pad - h),
                                  (0, w_pad - w)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # fidx, ry, rx
        grid=(fcount * n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # frames in HBM
            pl.BlockSpec((1, out_size, r), lambda i, *_: (i, 0, 0)),  # wy
            pl.BlockSpec((1, rw, out_size), lambda i, *_: (i, 0, 0)),  # wx^T
        ],
        out_specs=pl.BlockSpec((1, 3, out_size, out_size),
                               lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 4, r, rw), store),                # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, r=r, rw=rw, out_size=out_size,
                               quantize=quantize_uint8,
                               compute_dtype=compute_dtype)
    # bf16 output when computing in bf16: quantized crop values (integers
    # <= 255) are exact in bf16, the mask product rounds at the same 8-bit
    # precision the model input cast would apply anyway, and the planar ->
    # NHWC transpose moves half the bytes (measured 2.8 ms f32 at 16x1080p).
    n_steps = fcount * n
    cost = pl.CostEstimate(
        flops=2 * n_steps * 4 * (out_size * r * rw + out_size * out_size * rw),
        bytes_accessed=n_steps * (4 * r * rw + 2 * out_size * (r + rw)
                                  + 3 * out_size * out_size) * itemsize,
        transcendentals=0,
    )
    crops = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps, 3, out_size, out_size),
                                       store),
        grid_spec=grid_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(fidx, ry, rx, frames, wy.astype(store),
      wx.astype(store).transpose(0, 2, 1))
    if layout == "NCHW":
        crops = crops.astype(jnp.float32)  # native planar, no transpose
        if batched:
            crops = crops.reshape(fcount, n, 3, out_size, out_size)
        return crops
    crops = crops.transpose(0, 2, 3, 1).astype(jnp.float32)  # -> NHWC
    if batched:
        crops = crops.reshape(fcount, n, out_size, out_size, 3)
    return crops
