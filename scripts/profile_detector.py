"""Stage-level TPU timing of the full detect->pose graph.

Times each stage of detect_and_pose separately (same shapes as bench.py):
frame resize, YOLO forward, decode+postprocess (NMS + mask assembly), union
mask upsample, and the pose tail — so optimization effort goes where the
milliseconds are. Uses the chained-dispatch + scalar-readback fence pattern
(block_until_ready does not block through the remote relay; see bench.py).
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import time

import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _fence(out)
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def _fence(tree):
    # Reduce to a scalar ON DEVICE and fetch only that: fetching a raw leaf
    # would drag the whole array (up to hundreds of MB) through the remote
    # relay and time the transfer, not the compute.
    import jax
    import jax.numpy as jnp
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--max-det", type=int, default=16)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--det-size", type=int, default=640)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.frames, args.height, args.width, args.crop = 2, 270, 480, 64
    import pathlib
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parent.parent / ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from flope_tpu.data.synthetic import SyntheticScene, render_frame, orbit_camera
    from flope_tpu.models import init_posenet
    from flope_tpu.models.yolo import Yolo11Seg, decode_predictions, init_yolo, postprocess
    from flope_tpu.ops.crop_resize import resize_image
    from flope_tpu.pipeline import PipelineConfig, predict_frames
    from flope_tpu.pipeline.detector import detect_and_pose, yolo_detect

    dtype = jnp.bfloat16
    cfg = PipelineConfig(max_det=args.max_det, crop_size=args.crop,
                         model_dtype=dtype)
    rng = np.random.default_rng(0)
    scene = SyntheticScene.random(rng, n_flowers=12, height=args.height,
                                  width=args.width)
    frames = [render_frame(scene, orbit_camera(scene, 0.15 * i),
                           max_det=args.max_det) for i in range(args.frames)]
    _, pvars = init_posenet(jax.random.PRNGKey(0), image_size=args.crop, dtype=dtype)
    _, yvars = init_yolo(jax.random.PRNGKey(1), image_size=args.det_size, dtype=dtype)

    rgbs = jnp.asarray(np.stack([f.rgb for f in frames]), jnp.float32)
    depths = jnp.asarray(np.stack([f.depth_mm for f in frames]))
    boxes = jnp.asarray(np.stack([f.boxes for f in frames]))
    valids = jnp.asarray(np.stack([f.valid for f in frames]))
    masks = jnp.asarray(np.stack([f.mask for f in frames]))
    K = jnp.asarray(scene.K, jnp.float32)

    ds = args.det_size
    yolo = Yolo11Seg(num_classes=1, scale="n")

    @jax.jit
    def stage_resize(rgbs):
        f = lambda r: resize_image(r, ds, ds, method="bilinear") / 255.0
        return jax.vmap(f)(rgbs)

    @jax.jit
    def stage_yolo(inp):
        return yolo.apply(yvars, inp, train=False)

    @jax.jit
    def stage_post(raw):
        dec = decode_predictions(raw)
        f = lambda d, p: postprocess(d, p, max_det=args.max_det, score_th=0.0,
                                     iou_th=0.7)
        return jax.vmap(f)({k: v for k, v in dec.items()}, raw["proto"])

    @jax.jit
    def stage_maskup(union):
        f = lambda m: resize_image(m * 255.0, args.height, args.width,
                                   method="bilinear")
        return jax.vmap(f)(union)

    @jax.jit
    def stage_tail(rgbs, depths, boxes, valids, masks):
        return predict_frames(pvars, rgbs, depths, boxes, valids, masks, K, cfg)

    @jax.jit
    def full(rgbs, depths):
        f = lambda r, d: detect_and_pose(yvars, pvars, r, d, K, det_size=ds,
                                         score_th=0.0, config=cfg)
        return jax.vmap(f)(rgbs, depths)

    inp = stage_resize(rgbs)
    raw = stage_yolo(inp)
    post = stage_post(raw)

    results = {}
    results["1_frame_resize_to_det"] = timeit(stage_resize, rgbs)
    results["2_yolo_forward"] = timeit(stage_yolo, inp)
    results["3_decode_postprocess"] = timeit(stage_post, raw)
    results["4_mask_upsample"] = timeit(stage_maskup, post["union_mask"])
    results["5_pose_tail"] = timeit(stage_tail, rgbs, depths, boxes, valids, masks)
    results["6_full_detect_and_pose"] = timeit(full, rgbs, depths)

    total_crops = args.frames * args.max_det
    print(f"\n== {args.frames} frames x {args.max_det} det, det={ds}, "
          f"crop={args.crop}, {args.width}x{args.height} ==")
    for k, v in results.items():
        print(f"{k:28s} {v:8.2f} ms/batch")
    full_ms = results["6_full_detect_and_pose"]
    print(f"{'crops/s (full graph)':28s} {total_crops / full_ms * 1000:8.0f}")


if __name__ == "__main__":
    main()
