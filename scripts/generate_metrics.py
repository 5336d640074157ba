"""Evaluation harness CLI (reference: scripts/generate_metrics.py).

Scores the pipeline with the reference's metric suite (detection success +
px error, rotation angle error, translation error, pose success rate, DICE)
on the synthetic ground-truth world. --detector gt isolates the pose branch
(both reference branches share the same PoseNet, generate_metrics.py:222-233);
--detector yolo evaluates the full student stack.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--posenet-ckpt", default=None)
    ap.add_argument("--detector", choices=["gt", "yolo"], default="gt")
    ap.add_argument("--yolo-ckpt", default=None)
    ap.add_argument("--det-size", type=int, default=640)
    ap.add_argument("--score-th", type=float, default=0.25)
    ap.add_argument("--refine-boxes", action="store_true",
                    help="replace regressed boxes by instance-mask tight "
                         "boxes (in-graph)")
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--flowers", type=int, default=5)
    ap.add_argument("--domain", default="flat", choices=["flat", "hard"],
                    help="rendering-domain preset: hard = petal flowers, "
                         "foliage clutter, occluding leaves, lighting/noise/"
                         "blur (data/synthetic.py::DomainConfig.hard)")
    ap.add_argument("--scenes", type=int, default=1,
                    help="evaluate N held-out scene seeds (seed..seed+N-1) "
                         "and report per-scene + mean/std aggregates")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--model-width", type=float, default=1.0,
                    help="PoseNet backbone width (0.5 = distilled student; "
                    "must match the checkpoint)")
    ap.add_argument("--max-det", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="score the deployed fast config exactly as bench.py "
                         "runs it: crop_region 448 + bf16 model/crop/resize "
                         "contractions")
    ap.add_argument("--crop-backend", default="xla", choices=["xla", "pallas"],
                    help="crop stage implementation (pallas takes effect in "
                         "batched prediction on TPU)")
    ap.add_argument("--depth-fallback", action="store_true",
                    help="un-eroded masked-mean depth fallback for flowers "
                         "whose eroded mask misses min_depth_pixels (the "
                         "reference hard-drops them; PipelineConfig."
                         "depth_fallback)")
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu)
    import jax

    from flope_tpu.eval import EvalConfig, evaluate_pipeline
    from flope_tpu.models import init_posenet
    from flope_tpu.pipeline import PipelineConfig
    from flope_tpu.utils.checkpoint import check_ckpt_meta, load_posenet_ckpt

    _, variables = init_posenet(jax.random.PRNGKey(0), image_size=args.crop,
                                width_mult=args.model_width)
    if args.posenet_ckpt:
        variables = load_posenet_ckpt(args.posenet_ckpt)
        check_ckpt_meta(args.posenet_ckpt, image_size=args.crop,
                        width_mult=args.model_width)

    detector = None
    if args.detector == "yolo":
        from flope_tpu.models.yolo import init_yolo
        from flope_tpu.pipeline.detector import YoloJaxDetector
        _, yolo_v = init_yolo(jax.random.PRNGKey(1), image_size=args.det_size)
        if args.yolo_ckpt:
            from flope_tpu.utils.checkpoint import load_ckpt
            yolo_v = load_ckpt(args.yolo_ckpt)
            check_ckpt_meta(args.yolo_ckpt, image_size=args.det_size)
        import jax.numpy as jnp
        detector = YoloJaxDetector(
            yolo_v, det_size=args.det_size, max_det=args.max_det,
            score_th=args.score_th, refine_boxes=args.refine_boxes,
            resize_dtype=jnp.bfloat16 if args.fast else jnp.float32,
            model_dtype=jnp.bfloat16 if args.fast else jnp.float32)

    if args.fast:
        import jax.numpy as jnp
        cfg = PipelineConfig(max_det=args.max_det, crop_size=args.crop,
                             model_dtype=jnp.bfloat16, crop_region=448,
                             crop_dtype=jnp.bfloat16,
                             model_width=args.model_width,
                             crop_backend=args.crop_backend,
                             depth_fallback=args.depth_fallback)
    else:
        # The pallas backend only activates when crop_region < min(H, W)
        # (predict_frames falls back to XLA otherwise); the default region
        # (768) never fires at the default 480x640 eval resolution, so pick
        # the deployed 448 window when pallas is requested.
        region = 448 if args.crop_backend == "pallas" else None
        kw = {"crop_region": region} if region else {}
        cfg = PipelineConfig(max_det=args.max_det, crop_size=args.crop,
                             model_width=args.model_width,
                             crop_backend=args.crop_backend,
                             depth_fallback=args.depth_fallback, **kw)
    if args.crop_backend == "pallas" and (
            cfg.crop_region is None
            or cfg.crop_region >= min(args.height, args.width)):
        print(f"warning: crop_region {cfg.crop_region} >= frame "
              f"{args.width}x{args.height}; the pallas backend will fall "
              f"back to the XLA crop path", file=sys.stderr)
    summaries = []
    for scene_i in range(args.scenes):
        log = args.log
        if log and args.scenes > 1:
            log = f"{log}.scene{scene_i}"
        summary = evaluate_pipeline(
            variables, cfg,
            EvalConfig(n_frames=args.frames, n_flowers=args.flowers,
                       height=args.height, width=args.width,
                       seed=args.seed + scene_i, domain=args.domain,
                       max_det=args.max_det, log_path=log),
            detector=detector)
        summary["seed"] = args.seed + scene_i
        summaries.append(summary)
    if args.scenes == 1:
        print(json.dumps(summaries[0], indent=2))
        return
    import numpy as np
    keys = [k for k in summaries[0] if k not in ("seed", "frames")]
    agg = {"scenes": args.scenes, "domain": args.domain,
           "per_scene": summaries,
           "mean": {k: float(np.nanmean([s[k] for s in summaries])) for k in keys},
           "std": {k: float(np.nanstd([s[k] for s in summaries])) for k in keys}}
    print(json.dumps(agg, indent=2))


if __name__ == "__main__":
    sys.exit(main())
