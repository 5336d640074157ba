"""ResNet-18 backbone in Flax, bit-compatible with torchvision's resnet18.

The reference PoseNet wraps torchvision resnet18 (sunflower/models/posenet.py:10).
To make its checkpoints convertible and outputs comparable, this implementation
reproduces torch's exact geometry:

* explicit symmetric padding (torch pads (3,3) for conv1; XLA 'SAME' would pad
  (2,3) asymmetrically on even inputs — a silent parity killer),
* max-pool 3x3/2 with pad 1 and -inf fill,
* BatchNorm eps 1e-5 with running statistics,
* NHWC layout (TPU-native) with converter-handled transposition.

Compute dtype is configurable (bfloat16 recommended on TPU); parameters and
batch statistics stay float32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["BasicBlock", "ResNet18", "STAGE_SIZES"]

STAGE_SIZES = ((64, 1), (128, 2), (256, 2), (512, 2))  # (features, first-stride)


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/downsample shortcut (torchvision BasicBlock)."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = norm("bn2")(y)
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               padding="VALID", use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class _StemKernel(nn.Module):
    """Bare (7,7,3,F) kernel param at the same tree path nn.Conv('conv1')
    would create — lets the s2d stem reuse standard checkpoints verbatim."""

    features: int = 64

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, self.features))


def _s2d_stem_kernel(w: jax.Array) -> jax.Array:
    """Exact space-to-depth reparametrization of the 7x7/2 stem conv.

    A stride-2 7x7 conv over (H, W, 3) equals a stride-1 4x4 conv over the
    2x2 space-to-depth view (H/2, W/2, 12): source pixel offset u = i - 3
    decomposes as u = 2q + dy with q in [-2, 1], dy in {0, 1}, so original
    tap (i, j, c) lands at block tap (q+2, p+2) on packed channel
    (dy*2+dx)*3 + c; never-read sub-positions stay zero. Same 9.4k params,
    16x deeper contraction (4*4*12=192 vs 7*7*3=147 is modest — the real
    win is feeding the MXU 12 input channels instead of 3).
    """
    ks = jnp.zeros((4, 4, 12, w.shape[-1]), w.dtype)
    for i in range(7):
        qi, dy = divmod(i - 3, 2)
        for j in range(7):
            qj, dx = divmod(j - 3, 2)
            cc = (dy * 2 + dx) * 3
            ks = ks.at[qi + 2, qj + 2, cc:cc + 3, :].set(w[i, j])
    return ks


class ResNet18(nn.Module):
    """Feature extractor: (B, H, W, 3) -> (B, 512) after global average pool.

    s2d_stem=True runs the stem conv on the 2x2 space-to-depth input view
    with the exactly-reparametrized kernel (`_s2d_stem_kernel`) — identical
    math and identical parameter tree (checkpoints interchange), much
    better MXU utilization for the 3-channel first layer. Requires even
    H, W.

    width_mult scales every stage's channel count (the half-width student
    backbone for the 512^2 distillation path — VERDICT r2 item 3; the
    reference's own signature move is distilling a slow teacher into a fast
    student, prepare_yolo_data.py). width_mult=1 is torchvision-exact.
    """

    dtype: Any = jnp.float32
    s2d_stem: bool = False
    width_mult: float = 1.0
    # "NHWC" (default) or "NCHW": accept planar input and fold the layout
    # change into the stem conv's dimension numbers instead of an explicit
    # transpose. The Pallas crop kernel emits planar (3, H, W) crops
    # natively (channels-last would put C=3 in the lane dim); in-kernel
    # interleave is NOT lowerable (Mosaic "unsupported shape cast" on the
    # (H, W, 3)->(H, 3W) lane-stride-3 relayout, measured on v5e), so the
    # planar tensor feeds the stem directly and XLA schedules the relayout
    # inside the conv. Same parameter tree as the NHWC stem (checkpoints
    # interchange).
    input_layout: str = "NHWC"

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm = self.width_mult
        stem_f = max(int(64 * wm), 8)
        x = x.astype(self.dtype)
        if self.input_layout == "NCHW":
            if self.s2d_stem:
                raise ValueError("s2d_stem expects NHWC input")
            w = _StemKernel(name="conv1", features=stem_f)()
            x = jax.lax.conv_general_dilated(
                x, w.astype(self.dtype), window_strides=(2, 2),
                padding=((3, 3), (3, 3)),
                dimension_numbers=("NCHW", "HWIO", "NHWC"))
        elif self.s2d_stem:
            w = _StemKernel(name="conv1", features=stem_f)()
            b, h, ww = x.shape[0], x.shape[1], x.shape[2]
            xs = x.reshape(b, h // 2, 2, ww // 2, 2, 3)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h // 2, ww // 2, 12)
            x = jax.lax.conv_general_dilated(
                xs, _s2d_stem_kernel(w).astype(self.dtype),
                window_strides=(1, 1), padding=((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            x = nn.Conv(stem_f, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(kernel_size=3, stride=2, padding=1): pad with -inf.
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        for si, (features, stride) in enumerate(STAGE_SIZES, start=1):
            for bi in range(2):
                x = BasicBlock(max(int(features * wm), 8),
                               strides=stride if bi == 0 else 1,
                               dtype=self.dtype,
                               name=f"layer{si}_{bi}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        return x.astype(jnp.float32)
