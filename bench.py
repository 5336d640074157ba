"""Benchmark: end-to-end flower-pose throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the fused detector-tail pipeline (boxes+mask -> masked crops ->
PoseNet -> Procrustes -> depth-lifted poses) on 1080p frames with MAX_DET=16
flowers each — crops/sec/chip, against the BASELINE.json north-star target of
5000 crops/sec/chip (the reference publishes no numbers; SURVEY.md §6).

Runs on whatever backend jax picks (the real TPU under the driver); pass
--cpu to force the CPU backend for a quick sanity run.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--frames", type=int, default=32, help="frames per timed batch")
    ap.add_argument("--iters", type=int, default=10, help="timed iterations")
    ap.add_argument("--max-det", type=int, default=16)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    # 256^2 crops are the validated deployment config (2.96 deg rotation /
    # 0.53 cm translation error on the synthetic-GT harness — see PERF.md);
    # --crop 512 benches the reference-parity resolution.
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--crop-region", type=int, default=448,
                    help="fixed window sliced around each box for the crop "
                         "sampling contractions (exact while boxes fit; "
                         "0 = full-frame exact path). Depth pooling always "
                         "runs the exact full-frame reduction.")
    ap.add_argument("--crop-backend", default="pallas",
                    choices=["xla", "pallas"],
                    help="crop stage implementation: XLA region einsums or "
                         "the fused Pallas HBM->VMEM kernel")
    ap.add_argument("--model-width", type=float, default=1.0,
                    help="PoseNet backbone width multiplier (0.5 = the "
                         "distilled 512^2 student)")
    ap.add_argument("--planar-stem", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="pallas backend: feed the kernel's native planar "
                         "crops straight into an NCHW PoseNet stem (no "
                         "planar->NHWC transpose in the graph)")
    ap.add_argument("--with-detector", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="bench the FULL frame->poses graph including the "
                         "YOLO11-seg detector (throughput is weight-"
                         "independent); --no-with-detector benches the "
                         "boxes+mask->poses tail only")
    ap.add_argument("--det-size", type=int, default=640)
    ap.add_argument("--latency-iters", type=int, default=30,
                    help="fenced iterations for the p50/p99 frame-latency "
                         "measurement (0 = skip latency)")
    ap.add_argument("--streaming", action="store_true",
                    help="feed each iteration's frames host->device (uint8 "
                         "rgb + uint16 depth-mm) through the double-buffered "
                         "FrameFeeder instead of pre-staging — the live-"
                         "camera regime (flower_model.py:277-291)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.frames = min(args.frames, 2)
        args.height, args.width = 270, 480
        args.crop = 64
    # Persistent compile cache: first compile through the TPU relay takes
    # minutes; repeats are seconds.
    import pathlib
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parent / ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from flope_tpu.data.synthetic import SyntheticScene, render_frame, orbit_camera
    from flope_tpu.models import init_posenet
    from flope_tpu.pipeline import PipelineConfig, predict_frames

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    scene = SyntheticScene.random(rng, n_flowers=12, height=args.height,
                                  width=args.width)
    frames = [render_frame(scene, orbit_camera(scene, 0.15 * i),
                           max_det=args.max_det) for i in range(args.frames)]
    fast_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = PipelineConfig(
        max_det=args.max_det, crop_size=args.crop, model_dtype=fast_dtype,
        crop_region=args.crop_region or None, crop_dtype=fast_dtype,
        crop_backend=args.crop_backend, planar_stem=args.planar_stem,
        model_width=args.model_width)
    _, variables = init_posenet(jax.random.PRNGKey(0), image_size=args.crop,
                                dtype=cfg.model_dtype,
                                width_mult=args.model_width)

    batch = (
        jnp.asarray(np.stack([f.rgb for f in frames]), jnp.float32),
        jnp.asarray(np.stack([f.depth_mm for f in frames])),
        jnp.asarray(np.stack([f.boxes for f in frames])),
        jnp.asarray(np.stack([f.valid for f in frames])),
        jnp.asarray(np.stack([f.mask for f in frames])),
    )
    K = jnp.asarray(scene.K, jnp.float32)
    batch = jax.device_put(batch, dev)

    # Compile + warm up. NOTE: block_until_ready does not actually block
    # through this environment's remote-execution relay, so timing uses a
    # forced host readback of a scalar that depends on the result; chained
    # dispatches execute in order on the device stream, so one final fetch
    # fences all iterations.
    if args.with_detector:
        from flope_tpu.models.yolo import init_yolo
        from flope_tpu.pipeline.detector import detect_and_pose_frames

        _, yolo_v = init_yolo(jax.random.PRNGKey(1), image_size=args.det_size,
                              dtype=cfg.model_dtype)

        def run_and_reduce(variables, batch, K):
            rgbs, depths = batch[0], batch[1]
            pred = detect_and_pose_frames(
                yolo_v, variables, rgbs, depths, K, det_size=args.det_size,
                score_th=0.0, config=cfg)
            return jnp.sum(pred.poses) + jnp.sum(pred.depth)
    else:
        def run_and_reduce(variables, batch, K):
            pred = predict_frames(variables, *batch, K, cfg)
            return jnp.sum(pred.poses) + jnp.sum(pred.depth)

    run = jax.jit(run_and_reduce, static_argnames=())

    if args.streaming:
        # Live-camera regime: every iteration's frames cross host->device in
        # compact sensor dtypes (uint8 rgb, uint16 depth-mm), double-buffered
        # so transfer overlaps compute. The jitted graphs cast on device.
        from flope_tpu.parallel import device_stream

        host_all = (
            np.stack([f.rgb for f in frames]),  # uint8
            np.stack([f.depth_mm for f in frames]).astype(np.uint16),
            np.stack([f.boxes for f in frames]),
            np.stack([f.valid for f in frames]),
            np.stack([f.mask for f in frames]),  # uint8
        )
        host_batch = host_all[:2] if args.with_detector else host_all
        warm = jax.device_put(host_batch, dev)
        float(run(variables, warm, K))  # compile + warm
        float(run(variables, warm, K))

        def batches(n):
            for _ in range(n):
                yield host_batch

        t0 = time.perf_counter()
        out = None
        for db in device_stream(batches(args.iters), target=dev, depth=2):
            out = run(variables, db, K)
        float(out)  # single fence for the whole chain
        dt = (time.perf_counter() - t0) / args.iters
    else:
        float(run(variables, batch, K))  # compile + warm
        float(run(variables, batch, K))  # steady-state warm

        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = run(variables, batch, K)
        float(out)  # single fence for the whole chain
        dt = (time.perf_counter() - t0) / args.iters

    crops_per_sec = args.frames * args.max_det / dt

    # Frame latency, first-class (BASELINE.json names "p50 frame latency";
    # the reference's per-frame loop is scripts/live_pose.py:22-41). Each
    # iteration is fenced by a scalar host readback — the only reliable
    # fence through the remote-execution relay — so the numbers include one
    # host round-trip, an upper bound on true device latency.
    def fenced_ms(fn, iters):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn())
            ts.append((time.perf_counter() - t0) * 1e3)
        return ts

    latency = {}
    if args.latency_iters > 0:
        b1 = jax.tree.map(lambda x: x[:1], batch)
        float(run(variables, b1, K))  # compile batch-1 graph
        float(run(variables, b1, K))
        lat_b1 = fenced_ms(lambda: run(variables, b1, K), args.latency_iters)
        lat_bn = fenced_ms(lambda: run(variables, batch, K),
                           args.latency_iters)
        latency = {
            "latency_b1_p50_ms": round(float(np.percentile(lat_b1, 50)), 2),
            "latency_b1_p99_ms": round(float(np.percentile(lat_b1, 99)), 2),
            f"latency_b{args.frames}_p50_ms":
                round(float(np.percentile(lat_bn, 50)), 2),
            f"latency_b{args.frames}_p99_ms":
                round(float(np.percentile(lat_bn, 99)), 2),
        }

    baseline = 5000.0  # BASELINE.json north star: >=5k crops/sec/chip
    metric = ("detect_to_pose_crops_per_sec_per_chip" if args.with_detector
              else "detect_tail_crops_per_sec_per_chip")
    if args.streaming:
        metric = "streaming_" + metric
    print(json.dumps({
        "metric": metric,
        "value": round(crops_per_sec, 1),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / baseline, 3),
        **latency,
        "config": {"crop": args.crop, "frames": args.frames,
                   "max_det": args.max_det, "dtype": args.dtype,
                   "resolution": f"{args.width}x{args.height}",
                   "detector": bool(args.with_detector),
                   "streaming": bool(args.streaming)},
    }))


if __name__ == "__main__":
    main()
