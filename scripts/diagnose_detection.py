"""Diagnose WHERE hard-domain detection recall is lost.

The 5-scene hard protocol has been stuck at ~69% detection success for two
rounds (PERF.md). This tool decomposes the misses: it runs the detector once
per frame at a LOW score threshold (NMS keeps the top-scoring survivors, so
higher thresholds are exact subsets), matches predictions to GT centers with
the reference's <20 px rule (generate_metrics.py:199-215), and reports

  - recall vs score threshold (the PR operating-point curve),
  - recall binned by GT visible fraction (occlusion) and by GT box size,
  - the GT-GT overlap ceiling: flowers whose boxes overlap a nearer flower
    above the NMS IoU would be suppressed even by a perfect detector.

This tells us whether the lever is the threshold, the NMS, the detector, or
an occlusion ceiling in the protocol itself.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import json
import sys

import numpy as np


def _match(pred_uv, gt_uv, th=20.0):
    """Greedy nearest matching (reference KD-tree semantics): each GT matches
    at most one prediction within th px. Returns bool mask over GT."""
    matched = np.zeros(len(gt_uv), bool)
    used = np.zeros(len(pred_uv), bool)
    if len(pred_uv) == 0 or len(gt_uv) == 0:
        return matched
    d = np.linalg.norm(gt_uv[:, None] - pred_uv[None], axis=-1)
    order = np.argsort(d, axis=None)
    for k in order:
        gi, pi = divmod(int(k), len(pred_uv))
        if d[gi, pi] > th:
            break
        if matched[gi] or used[pi]:
            continue
        matched[gi] = used[pi] = True
    return matched


def _iou(a, b):
    x0 = max(a[0], b[0]); y0 = max(a[1], b[1])
    x1 = min(a[2], b[2]); y1 = min(a[3], b[3])
    inter = max(x1 - x0, 0) * max(y1 - y0, 0)
    area = ((a[2] - a[0]) * (a[3] - a[1])
            + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / max(area, 1e-9)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--yolo-ckpt", required=True)
    ap.add_argument("--det-size", type=int, default=640)
    ap.add_argument("--scenes", type=int, default=5)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--domain", default="hard")
    ap.add_argument("--max-det", type=int, default=16)
    ap.add_argument("--iou-th", type=float, default=0.7)
    ap.add_argument("--floor-th", type=float, default=0.03,
                    help="lowest score threshold (the single detector pass)")
    ap.add_argument("--thresholds", default="0.05,0.1,0.15,0.2,0.25,0.35,0.5")
    ap.add_argument("--refine-boxes", action="store_true", default=True)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu)
    import jax.numpy as jnp

    from flope_tpu.data.synthetic import (DomainConfig, SyntheticScene,
                                          orbit_camera, render_frame)
    from flope_tpu.pipeline.detector import yolo_detect
    from flope_tpu.utils.checkpoint import load_ckpt

    yolo_v = load_ckpt(args.yolo_ckpt)
    ths = [float(t) for t in args.thresholds.split(",")]

    rows = []          # per-GT: vis_frac, size_px, n_pred-match score (0 if none)
    n_nms_shadowed = 0  # GT boxes IoU>iou_th with a NEARER (earlier-slot) GT
    n_gt = 0
    for s in range(args.scenes):
        rng = np.random.default_rng(args.seed + s)
        scene = SyntheticScene.random(rng, 5, 480, 640,
                                      domain=DomainConfig.named(args.domain))
        for fi in range(args.frames):
            ang = 2 * np.pi * fi / args.frames
            fr = render_frame(scene, orbit_camera(scene, ang),
                              max_det=args.max_det)
            boxes, scores, valid, _ = yolo_detect(
                yolo_v, jnp.asarray(fr.rgb), args.det_size, args.max_det,
                args.floor_th, args.iou_th,
                refine_boxes=args.refine_boxes,
                resize_dtype=jnp.bfloat16, model_dtype=jnp.bfloat16)
        # (bf16 matches the deployed fast config; threshold subsets of one
        # low-threshold pass are exact because NMS ranks by score.)
            boxes = np.asarray(boxes)[np.asarray(valid).astype(bool)]
            scores = np.asarray(scores)[np.asarray(valid).astype(bool)]
            pred_uv = (boxes[:, :2] + boxes[:, 2:]) / 2.0
            gv = fr.valid
            gt_uv = fr.centers_uv[gv]
            gt_boxes = fr.boxes[gv]
            vis = (fr.visible_frac[gv] if fr.visible_frac is not None
                   else np.ones(int(gv.sum())))
            n_gt += len(gt_uv)
            # NMS shadow ceiling: slots are assigned far-to-near, so a LATER
            # slot is nearer; a GT whose box overlaps a nearer GT's box above
            # iou_th would be suppressed even with perfect detections.
            for a in range(len(gt_boxes)):
                for b in range(a + 1, len(gt_boxes)):
                    if _iou(gt_boxes[a], gt_boxes[b]) > args.iou_th:
                        n_nms_shadowed += 1
                        break
            # Exact per-threshold recall: rerun matching on each subset.
            per_th = []
            for th in ths:
                keep = scores >= th
                per_th.append(_match(pred_uv[keep], gt_uv))
            sizes = np.maximum(gt_boxes[:, 2] - gt_boxes[:, 0],
                               gt_boxes[:, 3] - gt_boxes[:, 1])
            for gi in range(len(gt_uv)):
                rows.append((float(vis[gi]), float(sizes[gi]),
                             [bool(p[gi]) for p in per_th]))

    print(f"GT flowers scored: {n_gt}; "
          f"NMS-shadowed (GT-GT IoU>{args.iou_th}): {n_nms_shadowed} "
          f"({100*n_nms_shadowed/max(n_gt,1):.1f}%)")
    print("\nrecall vs score threshold:")
    for i, th in enumerate(ths):
        r = np.mean([row[2][i] for row in rows])
        print(f"  th={th:4.2f}: {100*r:5.1f}%")
    i25 = min(range(len(ths)), key=lambda i: abs(ths[i] - 0.25))
    print(f"\nrecall by GT visible fraction (at th={ths[i25]}):")
    for lo, hi in [(0.25, 0.4), (0.4, 0.6), (0.6, 0.8), (0.8, 1.01)]:
        sel = [row for row in rows if lo <= row[0] < hi]
        if sel:
            r = np.mean([row[2][i25] for row in sel])
            print(f"  vis [{lo:.2f},{hi:.2f}): n={len(sel):4d}  "
                  f"recall {100*r:5.1f}%")
    print(f"\nrecall by GT box size (at th={ths[i25]}):")
    for lo, hi in [(0, 20), (20, 35), (35, 60), (60, 1e9)]:
        sel = [row for row in rows if lo <= row[1] < hi]
        if sel:
            r = np.mean([row[2][i25] for row in sel])
            print(f"  size [{lo:3.0f},{hi:3.0f}) px: n={len(sel):4d}  "
                  f"recall {100*r:5.1f}%")
    print(json.dumps({"n_gt": n_gt,
                      "recall_by_th": {str(t): float(np.mean([r[2][i] for r in rows]))
                                       for i, t in enumerate(ths)}}))


if __name__ == "__main__":
    sys.exit(main())
