"""YOLO11-seg training: task-aligned assignment + CIoU/DFL/BCE/mask losses.

The reference trains its detector by calling ultralytics
(scripts/train_yolo_seg.py on config/flower_seg_yolo.yaml) on data distilled
from the GDINO+SAM teacher (scripts/prepare_yolo_data.py). This module is the
TPU-native equivalent of ultralytics' v8SegmentationLoss stack:

* Task-Aligned Assigner: per GT, score^alpha * IoU^beta over anchors whose
  center lies inside the GT box, top-k candidates, conflicts resolved to the
  highest-metric GT. Fixed shapes: GT padded to MAX_GT with validity masks.
* Losses: BCE on classification (targets = per-anchor normalized align
  metric), CIoU on assigned boxes, Distribution Focal Loss on the two adjacent
  distance bins, and per-instance mask BCE (sigmoid(coeff . proto)) cropped to
  the GT box and normalized by box area.
* Default loss weights follow ultralytics: box 7.5, cls 0.5, dfl 1.5.

Everything is one jitted train step; data parallelism via the same
('data',...) mesh pattern as PoseNet training.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax

from flope_tpu.models.yolo import STRIDES, Yolo11Seg

__all__ = ["YoloTrainConfig", "make_anchors", "ciou", "assign_targets",
           "yolo_loss", "augment_batch", "make_yolo_train_step"]


@dataclasses.dataclass(frozen=True)
class YoloTrainConfig:
    image_size: int = 640
    num_classes: int = 1
    scale: str = "n"
    reg_max: int = 16
    max_gt: int = 16
    topk: int = 10
    alpha: float = 0.5
    beta: float = 6.0
    w_box: float = 7.5
    w_cls: float = 0.5
    w_dfl: float = 1.5
    w_seg: float = 1.0
    lr: float = 1e-3
    weight_decay: float = 5e-4


def make_anchors(image_size: int) -> tuple[jax.Array, jax.Array]:
    """Anchor centers (A, 2) in pixels and per-anchor strides (A,)."""
    pts, strides = [], []
    for s in STRIDES:
        n = image_size // s
        cy = (jax.lax.broadcasted_iota(jnp.float32, (n, n), 0) + 0.5) * s
        cx = (jax.lax.broadcasted_iota(jnp.float32, (n, n), 1) + 0.5) * s
        pts.append(jnp.stack([cx.reshape(-1), cy.reshape(-1)], -1))
        strides.append(jnp.full((n * n,), float(s)))
    return jnp.concatenate(pts), jnp.concatenate(strides)


def ciou(box1: jax.Array, box2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Complete IoU between xyxy boxes, elementwise over matching leading dims."""
    x11, y11, x12, y12 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
    x21, y21, x22, y22 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
    w1, h1 = x12 - x11, y12 - y11
    w2, h2 = x22 - x21, y22 - y21
    inter = (jnp.maximum(0.0, jnp.minimum(x12, x22) - jnp.maximum(x11, x21))
             * jnp.maximum(0.0, jnp.minimum(y12, y22) - jnp.maximum(y11, y21)))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    # Enclosing box diagonal + center distance.
    cw = jnp.maximum(x12, x22) - jnp.minimum(x11, x21)
    ch = jnp.maximum(y12, y22) - jnp.minimum(y11, y21)
    c2 = cw * cw + ch * ch + eps
    rho2 = (((x21 + x22) - (x11 + x12)) ** 2
            + ((y21 + y22) - (y11 + y12)) ** 2) / 4.0
    v = (4 / jnp.pi**2) * (jnp.arctan(w2 / (h2 + eps))
                           - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v


def assign_targets(anchor_pts: jax.Array, pred_boxes: jax.Array,
                   pred_scores: jax.Array, gt_boxes: jax.Array,
                   gt_valid: jax.Array, cfg: YoloTrainConfig):
    """Task-aligned assignment for one image.

    anchor_pts: (A, 2); pred_boxes: (A, 4); pred_scores: (A,) sigmoid of the
    (single) class; gt_boxes: (G, 4); gt_valid: (G,).
    Returns dict with per-anchor: assigned gt index (A,), fg mask (A,),
    cls target (A,) in [0,1].
    """
    a = anchor_pts.shape[0]
    g = gt_boxes.shape[0]
    # Candidates: anchor center strictly inside the GT box.
    inside = ((anchor_pts[None, :, 0] > gt_boxes[:, None, 0])
              & (anchor_pts[None, :, 0] < gt_boxes[:, None, 2])
              & (anchor_pts[None, :, 1] > gt_boxes[:, None, 1])
              & (anchor_pts[None, :, 1] < gt_boxes[:, None, 3])
              & gt_valid[:, None])  # (G, A)
    iou = jnp.maximum(ciou(pred_boxes[None].repeat(g, 0),
                           gt_boxes[:, None].repeat(a, 1)), 0.0)  # (G, A)
    align = (pred_scores[None] ** cfg.alpha) * (iou ** cfg.beta)
    align = jnp.where(inside, align, 0.0)
    # Top-k per GT.
    topv, _ = jax.lax.top_k(align, min(cfg.topk, a))
    kth = topv[:, -1:]
    cand = inside & (align >= jnp.maximum(kth, 1e-12)) & (align > 0)
    # Conflicts: anchor claimed by the GT with the highest align metric.
    align_masked = jnp.where(cand, align, -1.0)
    gt_idx = jnp.argmax(align_masked, axis=0)          # (A,)
    fg = jnp.max(align_masked, axis=0) > 0             # (A,)
    # Cls target: align normalized per GT so max candidate ~ its max IoU
    # (ultralytics' norm_align_metric).
    max_align = jnp.max(jnp.where(cand, align, 0.0), axis=1, keepdims=True)
    max_iou = jnp.max(jnp.where(cand, iou, 0.0), axis=1, keepdims=True)
    norm = align * max_iou / jnp.maximum(max_align, 1e-9)  # (G, A)
    cls_t = jnp.where(fg, norm[gt_idx, jnp.arange(a)], 0.0)
    return {"gt_idx": gt_idx, "fg": fg, "cls_target": cls_t, "iou": iou}


def _dfl_loss(dist_logits: jax.Array, target: jax.Array, reg_max: int) -> jax.Array:
    """Distribution focal loss: CE on the two integer bins bracketing target.
    dist_logits: (..., 4, reg_max); target: (..., 4) in [0, reg_max-1]."""
    tl = jnp.floor(target)
    tr = tl + 1.0
    wl = tr - target
    wr = target - tl
    logp = jax.nn.log_softmax(dist_logits, axis=-1)
    il = jnp.clip(tl, 0, reg_max - 1).astype(jnp.int32)
    ir = jnp.clip(tr, 0, reg_max - 1).astype(jnp.int32)
    ll = jnp.take_along_axis(logp, il[..., None], axis=-1)[..., 0]
    lr = jnp.take_along_axis(logp, ir[..., None], axis=-1)[..., 0]
    return -(wl * ll + wr * lr)


def yolo_loss(raw: dict, gt_boxes: jax.Array, gt_valid: jax.Array,
              gt_masks: jax.Array, cfg: YoloTrainConfig) -> tuple[jax.Array, dict]:
    """Total loss for a batch.

    raw: Yolo11Seg output. gt_boxes: (B, G, 4) pixels xyxy. gt_valid: (B, G).
    gt_masks: (B, G, Hp, Wp) instance masks at PROTO resolution (1/4 input).
    """
    from flope_tpu.models.yolo import decode_predictions

    b = raw["proto"].shape[0]
    anchor_pts, strides = make_anchors(cfg.image_size)
    dec = decode_predictions(raw, cfg.reg_max)
    dist_logits = jnp.concatenate(
        [r.reshape(b, -1, 4, cfg.reg_max) for r in raw["box"]], axis=1)
    cls_logits = jnp.concatenate(
        [c.reshape(b, -1, cfg.num_classes) for c in raw["cls"]], axis=1)

    def per_image(pred_boxes, scores, dlog, clog, mc, proto, gtb, gtv, gtm):
        # Assignment is TARGET CONSTRUCTION, not a differentiable stage —
        # ultralytics runs its assigner under torch.no_grad. Differentiating
        # through it is also numerically fatal: d/dx x**alpha (alpha=0.5) is
        # infinite at x=0, and background sigmoid scores underflow to exactly
        # 0.0 as training pushes their logits down — observed as a skip rate
        # climbing from 0 to ~90% of steps by epoch 25 of the hard-domain
        # run (NaN grads on most batches, probe: logits -200 -> grad NaN).
        asg = assign_targets(anchor_pts, jax.lax.stop_gradient(pred_boxes),
                             jax.lax.stop_gradient(scores[:, 0]), gtb, gtv,
                             cfg)
        fg = asg["fg"]
        n_fg = jnp.maximum(jnp.sum(asg["cls_target"]), 1.0)
        # cls: BCE with soft targets over ALL anchors.
        cls_l = optax.sigmoid_binary_cross_entropy(
            clog[:, 0], asg["cls_target"]).sum() / n_fg
        # box: CIoU on fg anchors, weighted by cls target.
        tgt_boxes = gtb[asg["gt_idx"]]
        w = jnp.where(fg, asg["cls_target"], 0.0)
        box_l = jnp.sum((1.0 - ciou(pred_boxes, tgt_boxes)) * w) / n_fg
        # dfl: distances of the target box from anchor centers, in strides.
        t_ltrb = jnp.stack([
            (anchor_pts[:, 0] - tgt_boxes[:, 0]) / strides,
            (anchor_pts[:, 1] - tgt_boxes[:, 1]) / strides,
            (tgt_boxes[:, 2] - anchor_pts[:, 0]) / strides,
            (tgt_boxes[:, 3] - anchor_pts[:, 1]) / strides,
        ], axis=-1)
        t_ltrb = jnp.clip(t_ltrb, 0, cfg.reg_max - 1.001)
        dfl = _dfl_loss(dlog, t_ltrb, cfg.reg_max).mean(-1)
        dfl_l = jnp.sum(dfl * w) / n_fg
        # seg: BCE of predicted instance mask vs assigned GT mask, inside the
        # GT box, normalized by box area (ultralytics single_mask_loss).
        # Only foreground anchors contribute, and task-aligned assignment
        # bounds them at topk * MAX_GT — so gather that fixed top-K superset
        # first instead of materializing (A, Hp, Wp) masks for all 8400
        # anchors (22 GB at det 640 x batch 16: instant OOM). Every fg
        # anchor has cls_target > 0 > the -1 key of non-fg lanes, so the
        # gathered set provably covers fg and the loss is unchanged.
        hp, wp = proto.shape[0], proto.shape[1]
        k_seg = min(mc.shape[0], cfg.topk * gtb.shape[0])
        _, sel = jax.lax.top_k(jnp.where(fg, asg["cls_target"], -1.0), k_seg)
        fg_k = fg[sel]
        tgt_k = tgt_boxes[sel]
        pm_logits = jnp.einsum("am,hwm->ahw", mc[sel], proto)  # (K, Hp, Wp)
        tm = gtm[asg["gt_idx"][sel]]                           # (K, Hp, Wp)
        bce = optax.sigmoid_binary_cross_entropy(pm_logits, tm)
        bx = tgt_k / 4.0
        ys = jax.lax.broadcasted_iota(jnp.float32, (1, hp, 1), 1)
        xs = jax.lax.broadcasted_iota(jnp.float32, (1, 1, wp), 2)
        in_box = ((xs >= bx[:, 0, None, None]) & (xs < bx[:, 2, None, None])
                  & (ys >= bx[:, 1, None, None]) & (ys < bx[:, 3, None, None]))
        area = jnp.maximum((bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1]), 1.0)
        seg_per_anchor = jnp.sum(jnp.where(in_box, bce, 0.0), axis=(1, 2)) / area
        seg_l = jnp.sum(jnp.where(fg_k, seg_per_anchor, 0.0)) / n_fg
        return cls_l, box_l, dfl_l, seg_l

    cls_l, box_l, dfl_l, seg_l = jax.vmap(per_image)(
        dec["boxes"], dec["scores"], dist_logits, cls_logits, dec["mc"],
        raw["proto"], gt_boxes, gt_valid, gt_masks)
    losses = {"cls": cls_l.mean(), "box": box_l.mean(),
              "dfl": dfl_l.mean(), "seg": seg_l.mean()}
    total = (cfg.w_cls * losses["cls"] + cfg.w_box * losses["box"]
             + cfg.w_dfl * losses["dfl"] + cfg.w_seg * losses["seg"])
    return total, losses


def augment_batch(key: jax.Array, images: jax.Array, gt_boxes: jax.Array,
                  gt_masks: jax.Array, image_size: int):
    """In-graph training augmentation: flips + photometric jitter.

    The reference's detector training inherited ultralytics' augmentation
    stack (hsv/flip/mosaic) for free; without any augmentation our trainer
    overfits the rendered scenes' lighting and layout chirality. This is the
    cheap, fixed-shape subset that moves detection recall: per-image
    horizontal/vertical flips (label-consistent: boxes mirrored in pixel
    coords, instance masks mirrored at proto resolution) and photometric
    jitter (brightness x U(0.6,1.4), per-channel gain U(0.85,1.15), additive
    U(-0.05,0.05)). Geometric rescaling stays in the data generator
    (homography augmentation) where resampling is free.

    images: (B, S, S, 3) float in [0,1]; gt_boxes: (B, G, 4) pixel xyxy;
    gt_masks: (B, G, Hp, Wp) float instance masks at proto resolution.
    """
    b = images.shape[0]
    kh, kv, kb, kc, ka = jax.random.split(key, 5)
    hflip = jax.random.bernoulli(kh, 0.5, (b,))
    vflip = jax.random.bernoulli(kv, 0.5, (b,))

    def flip_one(img, boxes, masks, h, v):
        img = jnp.where(h, img[:, ::-1], img)
        img = jnp.where(v, img[::-1], img)
        masks = jnp.where(h, masks[:, :, ::-1], masks)
        masks = jnp.where(v, masks[:, ::-1, :], masks)
        x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
        s = float(image_size)
        x1, x2 = (jnp.where(h, s - x2, x1), jnp.where(h, s - x1, x2))
        y1, y2 = (jnp.where(v, s - y2, y1), jnp.where(v, s - y1, y2))
        return img, jnp.stack([x1, y1, x2, y2], -1), masks

    images, gt_boxes, gt_masks = jax.vmap(flip_one)(
        images, gt_boxes, gt_masks, hflip, vflip)
    bright = jax.random.uniform(kb, (b, 1, 1, 1), minval=0.6, maxval=1.4)
    gain = jax.random.uniform(kc, (b, 1, 1, 3), minval=0.85, maxval=1.15)
    add = jax.random.uniform(ka, (b, 1, 1, 1), minval=-0.05, maxval=0.05)
    images = jnp.clip(images * bright * gain + add, 0.0, 1.0)
    return images, gt_boxes, gt_masks


def make_yolo_optimizer(lr, cfg: YoloTrainConfig,
                        clip_norm: float = 10.0) -> optax.GradientTransformation:
    """Clipped AdamW with non-finite steps skipped, never applied.

    Unguarded AdamW on the YOLO loss blows up sporadically (observed: flat
    run NaN at epoch 148/150, hard-1600 warm-started runs at epochs 6 and 17
    at two different LRs) — one bad batch poisons the params and ends the
    run. Global-norm clipping bounds the update; `apply_if_finite` restores
    the optimizer state and leaves params untouched whenever any gradient
    leaf is non-finite, so a single pathological batch costs one step
    instead of the whole run.

    `max_consecutive_errors` is set effectively to infinity on purpose:
    optax's give-up path APPLIES the non-finite update (poisoning params
    silently), which is never acceptable. Aborting after too many
    consecutive skips is the training loop's job — the train step exposes
    the consecutive-skip counter as the `nf_count` metric so the loop can
    stop and restore a finite snapshot instead.
    """
    inner = optax.chain(optax.clip_by_global_norm(clip_norm),
                        optax.adamw(lr, weight_decay=cfg.weight_decay))
    return optax.apply_if_finite(inner, max_consecutive_errors=2**30)


def make_yolo_train_step(model: Yolo11Seg, tx: optax.GradientTransformation,
                         cfg: YoloTrainConfig, augment: bool = False):
    """One jitted train step. With augment=True the step takes a trailing
    PRNG key and applies `augment_batch` on device before the forward."""

    @jax.jit
    def step(params, batch_stats, opt_state, images, gt_boxes, gt_valid,
             gt_masks, aug_key=None):
        if augment:
            images, gt_boxes, gt_masks = augment_batch(
                aug_key, images, gt_boxes, gt_masks, cfg.image_size)

        def loss_fn(p):
            raw, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, images, train=True,
                mutable=["batch_stats"])
            total, parts = yolo_loss(raw, gt_boxes, gt_valid, gt_masks, cfg)
            return total, (parts, updates["batch_stats"])

        (total, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # A non-finite forward also poisons the batch-norm running stats,
        # which apply_if_finite cannot see — gate them on the same predicate.
        ok = jnp.isfinite(total)
        for g in jax.tree.leaves(grads):
            ok &= jnp.all(jnp.isfinite(g))
        new_stats = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_stats, batch_stats)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # apply_if_finite skips on non-finite UPDATES (post-clip grads); our
        # `ok` predicate (raw grads + loss) can disagree on edge cases, so
        # report the optimizer's own consecutive-skip counter too — the
        # training loop aborts on it rather than trusting a re-derivation.
        nf_count = getattr(new_opt, "notfinite_count",
                           jnp.zeros([], jnp.int32))
        return new_params, new_stats, new_opt, {
            "total": total, **parts, "skipped": 1.0 - ok.astype(jnp.float32),
            "nf_count": nf_count.astype(jnp.float32)}

    return step
