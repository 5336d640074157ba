"""Sweep the detect-tail (predict_frames) over pipeline-config variants.

Times the fused boxes+mask -> poses graph (the bench.py tail) for a grid of
crop_region x crop_dtype x crop_size so the crop-machinery levers can be
ranked on the real chip. Relay-safe fence (on-device scalar reduce).
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--max-det", type=int, default=16)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--crops", default="256")
    ap.add_argument("--regions", default="768,512,448")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu)
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        args.frames, args.height, args.width = 2, 270, 480
        args.crops, args.regions = "64", "128"

    from flope_tpu.data.synthetic import SyntheticScene, render_frame, orbit_camera
    from flope_tpu.models import init_posenet
    from flope_tpu.pipeline import PipelineConfig, predict_frames

    rng = np.random.default_rng(0)
    scene = SyntheticScene.random(rng, n_flowers=12, height=args.height,
                                  width=args.width)
    frames = [render_frame(scene, orbit_camera(scene, 0.15 * i),
                           max_det=args.max_det) for i in range(args.frames)]
    batch = (
        jnp.asarray(np.stack([f.rgb for f in frames]), jnp.float32),
        jnp.asarray(np.stack([f.depth_mm for f in frames])),
        jnp.asarray(np.stack([f.boxes for f in frames])),
        jnp.asarray(np.stack([f.valid for f in frames])),
        jnp.asarray(np.stack([f.mask for f in frames])),
    )
    K = jnp.asarray(scene.K, jnp.float32)
    total = args.frames * args.max_det

    for crop in (int(c) for c in args.crops.split(",")):
        _, pvars = init_posenet(jax.random.PRNGKey(0), image_size=crop,
                                dtype=jnp.bfloat16)
        for region in (int(r) for r in args.regions.split(",")):
            for dt in args.dtypes.split(","):
                cfg = PipelineConfig(max_det=args.max_det, crop_size=crop,
                                     model_dtype=jnp.bfloat16,
                                     crop_region=region,
                                     crop_dtype=getattr(jnp, dt))
                run = jax.jit(lambda v, b, cfg=cfg: jnp.sum(
                    predict_frames(v, *b, K, cfg).poses))
                float(run(pvars, batch))
                float(run(pvars, batch))
                t0 = time.perf_counter()
                out = None
                for _ in range(args.iters):
                    out = run(pvars, batch)
                float(out)
                ms = (time.perf_counter() - t0) / args.iters * 1e3
                print(json.dumps({"crop": crop, "region": region, "dtype": dt,
                                  "ms": round(ms, 2),
                                  "crops_per_s": round(total / ms * 1e3)}),
                      flush=True)


if __name__ == "__main__":
    main()
