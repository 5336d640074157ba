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


class ResNet18(nn.Module):
    """Feature extractor: (B, H, W, 3) -> (B, 512) after global average pool."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(kernel_size=3, stride=2, padding=1): pad with -inf.
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        for si, (features, stride) in enumerate(STAGE_SIZES, start=1):
            for bi in range(2):
                x = BasicBlock(features, strides=stride if bi == 0 else 1,
                               dtype=self.dtype,
                               name=f"layer{si}_{bi}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        return x.astype(jnp.float32)
