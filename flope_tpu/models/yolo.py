"""YOLO11-seg in Flax: the student flower detector/segmenter, TPU-native.

The reference uses ultralytics YOLO11n-seg as its fast detector
(fast_pose_predictor.py:36-57, trained via scripts/train_yolo_seg.py on
config/flower_seg_yolo.yaml, single class "flower"). This is a from-scratch
NHWC implementation of the YOLO11 architecture — C3k2 / SPPF / C2PSA backbone,
PAN-FPN neck, anchor-free DFL detect head, prototype-coefficient segmentation
head — sized by the standard depth/width multiples (n/s/m/l scales).

Inference postprocessing is fixed-shape: top-K candidate selection + masked
greedy NMS (flope_tpu.ops.nms) + mask assembly, all jittable, so the whole
detect -> segment -> pose pipeline compiles into one XLA program.

No pretrained weights exist in this environment (zero egress, and the
reference's .pt requires the ultralytics unpickler); the supported path is the
reference's own: distill from a teacher (scripts/prepare_yolo_data.py
semantics) or train on labeled data via flope_tpu.train.yolo_train.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["YoloScale", "SCALES", "Yolo11Seg", "decode_predictions",
           "postprocess", "init_yolo"]


@dataclasses.dataclass(frozen=True)
class YoloScale:
    depth: float
    width: float
    max_channels: int


SCALES = {
    "n": YoloScale(0.50, 0.25, 1024),
    "s": YoloScale(0.50, 0.50, 1024),
    "m": YoloScale(0.50, 1.00, 512),
    "l": YoloScale(1.00, 1.00, 512),
}


def _ch(c: int, scale: YoloScale) -> int:
    return max(int(round(min(c, scale.max_channels) * scale.width)), 1)


def _n(n: int, scale: YoloScale) -> int:
    return max(int(round(n * scale.depth)), 1)


class ConvBNAct(nn.Module):
    """Conv2d + BatchNorm + SiLU (ultralytics Conv)."""

    features: int
    kernel: int = 1
    strides: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=((p, p), (p, p)), feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    e: float = 0.5
    k1: int = 3
    k2: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.e)
        y = ConvBNAct(c_, self.k1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBNAct(self.features, self.k2, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class C3k(nn.Module):
    """C3 block with 3x3 bottlenecks (used inside C3k2 when c3k=True)."""

    features: int
    n: int = 2
    shortcut: bool = True
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.e)
        a = ConvBNAct(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBNAct(c_, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, e=1.0, dtype=self.dtype,
                           name=f"m_{i}")(a, train)
        return ConvBNAct(self.features, 1, dtype=self.dtype,
                         name="cv3")(jnp.concatenate([a, b], -1), train)


class C3k2(nn.Module):
    """YOLO11's C2f-style block: split, iterate blocks, concat everything."""

    features: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.e)
        y = ConvBNAct(2 * c_, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c_], y[..., c_:]]
        for i in range(self.n):
            if self.c3k:
                parts.append(C3k(c_, 2, self.shortcut, dtype=self.dtype,
                                 name=f"m_{i}")(parts[-1], train))
            else:
                parts.append(Bottleneck(c_, self.shortcut, e=0.5,
                                        dtype=self.dtype,
                                        name=f"m_{i}")(parts[-1], train))
        return ConvBNAct(self.features, 1, dtype=self.dtype,
                         name="cv2")(jnp.concatenate(parts, -1), train)


class SPPF(nn.Module):
    features: int
    pool: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBNAct(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        p = self.pool // 2
        pools = [y]
        for _ in range(3):
            pools.append(nn.max_pool(pools[-1], (self.pool, self.pool),
                                     strides=(1, 1),
                                     padding=((p, p), (p, p))))
        return ConvBNAct(self.features, 1, dtype=self.dtype,
                         name="cv2")(jnp.concatenate(pools, -1), train)


class Attention(nn.Module):
    """Spatial self-attention with depthwise positional encoding (YOLO11 PSA)."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        hd = self.dim // self.num_heads
        kd = int(hd * self.attn_ratio)
        scale = kd ** -0.5
        qkv = ConvBNAct(self.dim + self.num_heads * kd * 2, 1, act=False,
                        dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(b, h * w, self.num_heads, kd * 2 + hd)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h, w, self.dim)
        pe = ConvBNAct(self.dim, 3, groups=self.dim, act=False,
                       dtype=self.dtype, name="pe")(v.reshape(b, h, w, self.dim), train)
        return ConvBNAct(self.dim, 1, act=False, dtype=self.dtype,
                         name="proj")(out + pe, train)


class PSABlock(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + Attention(self.dim, self.num_heads, dtype=self.dtype,
                          name="attn")(x, train)
        y = ConvBNAct(self.dim * 2, 1, dtype=self.dtype, name="ffn1")(x, train)
        y = ConvBNAct(self.dim, 1, act=False, dtype=self.dtype,
                      name="ffn2")(y, train)
        return x + y


class C2PSA(nn.Module):
    features: int
    n: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.e)
        y = ConvBNAct(2 * c_, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c_], y[..., c_:]
        heads = max(c_ // 64, 1)
        for i in range(self.n):
            b = PSABlock(c_, heads, dtype=self.dtype, name=f"m_{i}")(b, train)
        return ConvBNAct(self.features, 1, dtype=self.dtype,
                         name="cv2")(jnp.concatenate([a, b], -1), train)


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


class Proto(nn.Module):
    """Mask prototype net: P3 features -> (2x upsampled) nm prototype maps."""

    mid: int
    nm: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.mid, 3, dtype=self.dtype, name="cv1")(x, train)
        x = nn.ConvTranspose(self.mid, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="up")(x)
        x = ConvBNAct(self.mid, 3, dtype=self.dtype, name="cv2")(x, train)
        return ConvBNAct(self.nm, 1, dtype=self.dtype, name="cv3")(x, train)


class Yolo11Seg(nn.Module):
    """Full YOLO11-seg: returns per-level raw heads + prototypes.

    Input (B, H, W, 3) with H, W divisible by 32. Output dict:
      'box':   list of (B, Hl, Wl, 4*reg_max) DFL logits per level (P3,P4,P5)
      'cls':   list of (B, Hl, Wl, nc) class logits
      'mc':    list of (B, Hl, Wl, nm) mask coefficients
      'proto': (B, H/4, W/4, nm) prototype maps
    """

    num_classes: int = 1
    scale: str = "n"
    reg_max: int = 16
    nm: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = SCALES[self.scale]
        dt = self.dtype
        x = x.astype(dt)

        # ----- backbone -----
        x = ConvBNAct(_ch(64, s), 3, 2, dtype=dt, name="b0")(x, train)    # P1
        x = ConvBNAct(_ch(128, s), 3, 2, dtype=dt, name="b1")(x, train)   # P2
        x = C3k2(_ch(256, s), _n(2, s), False, 0.25, dtype=dt, name="b2")(x, train)
        x = ConvBNAct(_ch(256, s), 3, 2, dtype=dt, name="b3")(x, train)   # P3
        p3 = C3k2(_ch(512, s), _n(2, s), False, 0.25, dtype=dt, name="b4")(x, train)
        x = ConvBNAct(_ch(512, s), 3, 2, dtype=dt, name="b5")(p3, train)  # P4
        p4 = C3k2(_ch(512, s), _n(2, s), True, dtype=dt, name="b6")(x, train)
        x = ConvBNAct(_ch(1024, s), 3, 2, dtype=dt, name="b7")(p4, train)  # P5
        x = C3k2(_ch(1024, s), _n(2, s), True, dtype=dt, name="b8")(x, train)
        x = SPPF(_ch(1024, s), 5, dtype=dt, name="b9")(x, train)
        p5 = C2PSA(_ch(1024, s), _n(2, s), dtype=dt, name="b10")(x, train)

        # ----- PAN-FPN neck -----
        x = jnp.concatenate([_upsample2(p5), p4], -1)
        n13 = C3k2(_ch(512, s), _n(2, s), False, dtype=dt, name="n13")(x, train)
        x = jnp.concatenate([_upsample2(n13), p3], -1)
        n16 = C3k2(_ch(256, s), _n(2, s), False, dtype=dt, name="n16")(x, train)  # P3 out
        x = ConvBNAct(_ch(256, s), 3, 2, dtype=dt, name="n17")(n16, train)
        x = jnp.concatenate([x, n13], -1)
        n19 = C3k2(_ch(512, s), _n(2, s), False, dtype=dt, name="n19")(x, train)  # P4 out
        x = ConvBNAct(_ch(512, s), 3, 2, dtype=dt, name="n20")(n19, train)
        x = jnp.concatenate([x, p5], -1)
        n22 = C3k2(_ch(1024, s), _n(2, s), True, dtype=dt, name="n22")(x, train)  # P5 out

        feats = [n16, n19, n22]
        ch0 = feats[0].shape[-1]

        # ----- detect + segment heads -----
        c2 = max(16, ch0 // 4, self.reg_max * 4)
        c3 = max(ch0, min(self.num_classes, 100))
        c4 = max(ch0 // 4, self.nm)
        boxes, clss, mcs = [], [], []
        for li, f in enumerate(feats):
            b = ConvBNAct(c2, 3, dtype=dt, name=f"box{li}_0")(f, train)
            b = ConvBNAct(c2, 3, dtype=dt, name=f"box{li}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), dtype=dt,
                        name=f"box{li}_2")(b)
            boxes.append(b)
            # cls branch (v11 style: depthwise + pointwise pairs)
            cch = f.shape[-1]
            c = ConvBNAct(cch, 3, groups=cch, dtype=dt, name=f"cls{li}_dw0")(f, train)
            c = ConvBNAct(c3, 1, dtype=dt, name=f"cls{li}_pw0")(c, train)
            c = ConvBNAct(c3, 3, groups=c3, dtype=dt, name=f"cls{li}_dw1")(c, train)
            c = ConvBNAct(c3, 1, dtype=dt, name=f"cls{li}_pw1")(c, train)
            c = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                        name=f"cls{li}_2")(c)
            clss.append(c)
            m = ConvBNAct(c4, 3, dtype=dt, name=f"mc{li}_0")(f, train)
            m = ConvBNAct(c4, 3, dtype=dt, name=f"mc{li}_1")(m, train)
            m = nn.Conv(self.nm, (1, 1), dtype=dt, name=f"mc{li}_2")(m)
            mcs.append(m)

        proto = Proto(_ch(256, s), self.nm, dtype=dt, name="proto")(n16, train)
        return {"box": boxes, "cls": clss, "mc": mcs, "proto": proto}


STRIDES = (8, 16, 32)


def decode_predictions(raw: dict, reg_max: int = 16) -> dict:
    """Raw heads -> flat candidate tensors.

    Returns {'boxes': (B, A, 4) xyxy pixels, 'scores': (B, A, nc) sigmoid,
    'mc': (B, A, nm)} with A = sum of level cells. DFL: softmax expectation
    over reg_max distance bins, scaled by the level stride, around cell
    centers (+0.5) — anchor-free decode.
    """
    all_boxes, all_scores, all_mc = [], [], []
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    for lvl, stride in enumerate(STRIDES):
        b = raw["box"][lvl].astype(jnp.float32)
        B, H, W, _ = b.shape
        d = b.reshape(B, H * W, 4, reg_max)
        d = jnp.sum(jax.nn.softmax(d, axis=-1) * bins, axis=-1)  # (B,HW,4) ltrb
        cx = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5).reshape(-1)
        cy = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5).reshape(-1)
        x1 = (cx[None] - d[..., 0]) * stride
        y1 = (cy[None] - d[..., 1]) * stride
        x2 = (cx[None] + d[..., 2]) * stride
        y2 = (cy[None] + d[..., 3]) * stride
        all_boxes.append(jnp.stack([x1, y1, x2, y2], -1))
        all_scores.append(jax.nn.sigmoid(
            raw["cls"][lvl].astype(jnp.float32).reshape(B, H * W, -1)))
        all_mc.append(raw["mc"][lvl].astype(jnp.float32).reshape(B, H * W, -1))
    return {"boxes": jnp.concatenate(all_boxes, 1),
            "scores": jnp.concatenate(all_scores, 1),
            "mc": jnp.concatenate(all_mc, 1)}


@functools.partial(jax.jit, static_argnames=("max_det", "score_th", "iou_th",
                                             "topk", "refine_boxes"))
def postprocess(decoded: dict, proto: jax.Array, max_det: int = 16,
                score_th: float = 0.25, iou_th: float = 0.7,
                topk: int = 64, refine_boxes: bool = False) -> dict:
    """Fixed-shape candidate selection + NMS + instance masks. Single image
    (no batch dim on inputs; vmap for batches).

    Returns {'boxes': (max_det, 4) int32, 'scores': (max_det,),
    'valid': (max_det,), 'masks': (max_det, Hp, Wp) float [0,1] at proto res,
    'union_mask': (Hp, Wp) float} — union semantics of get_bbox_mask
    (fast_pose_predictor.py:49-57): sum instance masks, clip to [0,1].

    refine_boxes=True replaces each regressed box by the tight bounding box
    of its instance mask (> 0.5, proto resolution x4) when the mask is
    non-empty. Regressed boxes can sit a few pixels off the flower; the crop
    tail squarifies the box, so box misalignment translates directly into
    PoseNet rotation error — the mask is the better localizer.
    """
    from flope_tpu.ops.nms import nms

    scores = decoded["scores"].max(-1)  # (A,) single class anyway
    k = min(topk, scores.shape[0])
    top_s, top_i = jax.lax.top_k(scores, k)
    boxes = decoded["boxes"][top_i]
    mc = decoded["mc"][top_i]
    cand_valid = top_s > score_th
    keep = nms(boxes, top_s, cand_valid, iou_th)
    # Compact kept candidates into the first max_det slots (stable order by score).
    rank = jnp.cumsum(keep) - 1
    slot = jnp.where(keep & (rank < max_det), rank, max_det)  # overflow -> bin
    out_boxes = jnp.zeros((max_det + 1, 4)).at[slot].set(boxes)[:max_det]
    out_scores = jnp.zeros((max_det + 1,)).at[slot].set(top_s)[:max_det]
    out_mc = jnp.zeros((max_det + 1, mc.shape[-1])).at[slot].set(mc)[:max_det]
    out_valid = jnp.zeros((max_det + 1,), bool).at[slot].set(keep)[:max_det]

    hp, wp, nm = proto.shape
    masks = jax.nn.sigmoid(
        jnp.einsum("dm,hwm->dhw", out_mc, proto.astype(jnp.float32)))
    # Crop each mask to its box (proto is at 1/4 input resolution).
    ys = jax.lax.broadcasted_iota(jnp.float32, (1, hp, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (1, 1, wp), 2)
    bx = out_boxes / 4.0
    inside = ((xs >= bx[:, 0, None, None]) & (xs < bx[:, 2, None, None])
              & (ys >= bx[:, 1, None, None]) & (ys < bx[:, 3, None, None]))
    masks = jnp.where(inside & out_valid[:, None, None], masks, 0.0)
    union = jnp.clip(jnp.sum(jnp.where(masks > 0.5, masks, 0.0), 0), 0.0, 1.0)
    if refine_boxes:
        hard = masks > 0.5  # (D, hp, wp)
        col_any = hard.any(axis=1)  # (D, wp)
        row_any = hard.any(axis=2)  # (D, hp)
        xi = jnp.arange(wp, dtype=jnp.float32)[None]
        yi = jnp.arange(hp, dtype=jnp.float32)[None]
        x1 = jnp.min(jnp.where(col_any, xi, jnp.inf), axis=1)
        x2 = jnp.max(jnp.where(col_any, xi, -jnp.inf), axis=1) + 1.0
        y1 = jnp.min(jnp.where(row_any, yi, jnp.inf), axis=1)
        y2 = jnp.max(jnp.where(row_any, yi, -jnp.inf), axis=1) + 1.0
        tight = jnp.stack([x1, y1, x2, y2], axis=-1) * 4.0  # proto stride
        nonempty = col_any.any(axis=1)
        out_boxes = jnp.where(nonempty[:, None], tight, out_boxes)
    return {"boxes": out_boxes.astype(jnp.int32), "scores": out_scores,
            "valid": out_valid, "masks": masks, "union_mask": union}


def init_yolo(rng: jax.Array, image_size: int = 640, scale: str = "n",
              num_classes: int = 1, dtype=jnp.float32):
    model = Yolo11Seg(num_classes=num_classes, scale=scale, dtype=dtype)
    # jit the init: eager init dispatches ~300 ops one by one (slow on CPU);
    # the jitted version also lands in the persistent compilation cache.
    init = jax.jit(lambda r: model.init(r, jnp.zeros((1, image_size,
                                                      image_size, 3)),
                                        train=False))
    return model, init(rng)
