"""PoseNet: the rotation regressor at the heart of the pipeline.

Topology of the reference PoseResNet (sunflower/models/posenet.py:5-34):
ResNet-18 backbone, fc replaced by Linear(512 -> 2048) + ReLU, dropout 0.5,
head Linear(2048 -> 9); the 9-dim output is an unconstrained 3x3 projected to
SO(3) by special Procrustes downstream (the reference keeps the projection in
the predictor; here `predict_rotmats` fuses it — and optionally the yaw
nullification — into the same XLA program).

Note: the reference applies ReLU twice back-to-back (inside base.fc and again
in extract_features, posenet.py:16,26) — idempotent, so a single ReLU here is
mathematically identical.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from flope_tpu.models.resnet import ResNet18
from flope_tpu.geometry import special_procrustes, nullify_yaw

__all__ = ["PoseNet"]


class PoseNet(nn.Module):
    backbone_out_dim: int = 2048
    dropout: float = 0.5
    dtype: Any = jnp.float32
    # Exact space-to-depth stem reparametrization (see models/resnet.py):
    # same params/checkpoints, better MXU utilization; inference-time knob.
    s2d_stem: bool = False
    # Backbone channel scale (0.5 = the distilled 512^2 student).
    width_mult: float = 1.0
    # "NHWC" or "NCHW" (planar crops straight from the Pallas kernel; the
    # stem conv absorbs the layout change — see ResNet18.input_layout).
    input_layout: str = "NHWC"

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) float in [0, 1] -> (B, 9) unconstrained rotation
        ((B, 3, H, W) when input_layout == "NCHW")."""
        feats = ResNet18(dtype=self.dtype, s2d_stem=self.s2d_stem,
                         width_mult=self.width_mult,
                         input_layout=self.input_layout,
                         name="backbone")(x, train=train)
        feats = nn.Dense(self.backbone_out_dim, name="fc")(feats)
        feats = nn.relu(feats)
        if self.dropout > 0:
            feats = nn.Dropout(rate=self.dropout, deterministic=not train,
                               name="drop")(feats)
        return nn.Dense(9, name="fc_rot")(feats)

    @staticmethod
    def to_rotmats(r9: jax.Array, yaw_nullify: bool = False) -> jax.Array:
        """(B, 9) -> (B, 3, 3) in SO(3); optionally yaw-nullified
        (pose_predictor.py:156-161 fused in-graph)."""
        R = special_procrustes(r9.reshape(-1, 3, 3))
        return nullify_yaw(R) if yaw_nullify else R


def init_posenet(rng: jax.Array, image_size: int = 512, dtype=jnp.float32,
                 dropout: float = 0.5, width_mult: float = 1.0):
    """Convenience initializer returning (model, variables). Init is jitted so
    it compiles once (and lands in the persistent compilation cache) instead
    of dispatching every layer eagerly."""
    model = PoseNet(dtype=dtype, dropout=dropout, width_mult=width_mult)
    init = jax.jit(lambda r: model.init(r, jnp.zeros((1, image_size,
                                                      image_size, 3)),
                                        train=False))
    return model, init(rng)
