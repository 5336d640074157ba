"""Detector-matched PoseNet training crops.

The deployed pipeline feeds PoseNet crops cut at the STUDENT detector's
(mask-refined) boxes and background-zeroed by the STUDENT's predicted
segmentation mask — while `synthetic_crops` trains on GT-centered boxes
(uniform jitter) zeroed by the PERFECT mask. On the hard domain that
train/serve distribution gap costs ~2x rotation error (9.4 deg held-out
crop angle vs 21.5 deg deployed, PERF.md round 3). This script closes it:
render scenes, run the actual YOLO student + the pipeline's exact crop
machinery (squarify -> in-frame filter -> masked Lanczos4 crop), match
each detection to its GT flower by center distance, and emit a train cache
(tr_/ev_ npz, the --synthetic-cache format) labeled with the matched
yaw-nullified camera-frame GT rotations.

Reference analogue: posenet_data_generator.py labels crops from (teacher)
detections rather than GT boxes (posenet_data_generator.py:418); this is
the same move with the student detector, possible here because the
synthetic world has exact GT.
"""

import _bootstrap  # noqa: F401
import argparse
import functools
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--yolo-ckpt", required=True)
    ap.add_argument("--out", required=True, help="npz cache path (tr_/ev_)")
    ap.add_argument("--crops", type=int, default=8192,
                    help="target train-crop count (eval = crops/5)")
    ap.add_argument("--scenes", type=int, default=60)
    ap.add_argument("--frames", type=int, default=40, help="per scene")
    ap.add_argument("--flowers", type=int, default=8)
    ap.add_argument("--seed", type=int, default=1000,
                    help="scene seeds seed..seed+scenes-1 (keep disjoint "
                         "from the eval seeds 0..4)")
    ap.add_argument("--domain", default="hard", choices=["flat", "hard"])
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--det-size", type=int, default=640)
    ap.add_argument("--score-th", type=float, default=0.25)
    ap.add_argument("--refine-boxes", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--match-px", type=float, default=25.0,
                    help="max detection-center to GT-center distance")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu)
    import jax
    import jax.numpy as jnp

    from flope_tpu.data.synthetic import (DomainConfig, SyntheticScene,
                                          orbit_camera, render_frame)
    from flope_tpu.geometry import (box_centers, boxes_in_frame, nullify_yaw,
                                    squarify_boxes)
    from flope_tpu.ops import crop_resize_with_mask
    from flope_tpu.pipeline.detector import yolo_detect
    from flope_tpu.utils.checkpoint import check_ckpt_meta, load_ckpt

    yolo_v = load_ckpt(args.yolo_ckpt)
    check_ckpt_meta(args.yolo_ckpt, image_size=args.det_size)
    domain = DomainConfig.named(args.domain)

    @functools.partial(jax.jit, static_argnames=("det_size", "max_det",
                                                 "score_th", "refine",
                                                 "crop", "h", "w"))
    def detect_and_crop(yv, rgbs, det_size, max_det, score_th, refine,
                        crop, h, w):
        def one(rgb):
            boxes, _, valid, mask = yolo_detect(
                yv, rgb, det_size, max_det, score_th,
                refine_boxes=refine)
            sq = squarify_boxes(boxes)
            valid = valid & boxes_in_frame(sq, h, w)
            uv = box_centers(boxes)
            crops = crop_resize_with_mask(
                rgb.astype(jnp.float32), mask.astype(jnp.float32), sq,
                out_size=crop)
            # uint8 over the relay (quantize_uint8 crops are integral in
            # [0, 255]); the host converts matched ones to [0, 1] f32.
            return crops.astype(jnp.uint8), uv, valid
        return jax.vmap(one)(rgbs)

    target_tr = args.crops
    target_ev = max(args.crops // 5, 4)
    ev_scenes = max(args.scenes // 6, 1)   # held-out scenes -> eval split
    out = {"tr": {"images": [], "rotations": [], "translations": []},
           "ev": {"images": [], "rotations": [], "translations": []}}

    for si in range(args.scenes):
        tag = "ev" if si >= args.scenes - ev_scenes else "tr"
        if len(out[tag]["images"]) >= (target_ev if tag == "ev" else target_tr):
            continue
        rng = np.random.default_rng(args.seed + si)
        scene = SyntheticScene.random(rng, args.flowers, args.height,
                                      args.width, domain=domain)
        frames = [render_frame(scene,
                               orbit_camera(scene, 2 * np.pi * fi / args.frames
                                            + rng.uniform(0, 0.2)),
                               max_det=16)
                  for fi in range(args.frames)]
        for b0 in range(0, len(frames), args.batch):
            chunk = frames[b0:b0 + args.batch]
            if len(chunk) < args.batch:   # static shapes: pad by repetition
                chunk = chunk + [chunk[-1]] * (args.batch - len(chunk))
            rgbs = jnp.asarray(np.stack([f.rgb for f in chunk]))
            crops, uvs, valids = jax.device_get(detect_and_crop(
                yolo_v, rgbs, args.det_size, 16, args.score_th,
                args.refine_boxes, args.crop, args.height, args.width))
            for k, f in enumerate(frames[b0:b0 + args.batch]):
                gv = f.valid
                if not gv.any():
                    continue
                gt_uv = f.centers_uv[gv]
                gt_R = np.asarray(nullify_yaw(
                    jnp.asarray(f.gt_poses_cam[gv, :3, :3])))
                gt_t = f.gt_poses_cam[gv, :3, 3]
                for d in np.flatnonzero(valids[k]):
                    dist = np.linalg.norm(gt_uv - uvs[k, d], axis=1)
                    j = int(dist.argmin())
                    if dist[j] > args.match_px:
                        continue
                    out[tag]["images"].append(
                        crops[k, d].astype(np.float32) / 255.0)
                    out[tag]["rotations"].append(gt_R[j].astype(np.float32))
                    out[tag]["translations"].append(gt_t[j].astype(np.float32))
        print(f"scene {si} ({tag}): totals tr={len(out['tr']['images'])} "
              f"ev={len(out['ev']['images'])}", flush=True)

    arrays = {}
    for tag, n in (("tr", target_tr), ("ev", target_ev)):
        got = len(out[tag]["images"])
        if got == 0:
            print(f"no {tag} crops matched — aborting", file=sys.stderr)
            return 1
        take = min(got, n)
        arrays[f"{tag}_images"] = np.stack(out[tag]["images"][:take])
        arrays[f"{tag}_rotations"] = np.stack(out[tag]["rotations"][:take])
        arrays[f"{tag}_translations"] = np.stack(out[tag]["translations"][:take])
        # Fake fixed crop intrinsics, same convention as synthetic_crops
        # (posenet_labeled_data.py:292-296).
        arrays[f"{tag}_intrinsics"] = np.tile(
            np.array([2433.0, 2433.0, args.crop / 2.0, args.crop / 2.0],
                     np.float32), (take, 1))
        print(f"{tag}: {take} crops (matched {got})")
    np.savez(args.out, **arrays)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
