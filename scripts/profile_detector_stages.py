"""Isolate the detector half's per-stage cost on the real chip.

Times, with the relay-safe on-device-scalar fence: the frame resize to
det_size, the YOLO11-seg forward, decode+postprocess (top-k, NMS fixpoint,
proto-mask einsum, box compaction), the union-mask upsample back to frame
resolution, the whole `yolo_detect`, and the whole fused `detect_and_pose` —
so detector levers are ranked by milliseconds, not guesses.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse

from _profile_util import timeit


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--max-det", type=int, default=16)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--det-size", type=int, default=640)
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu)
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        args.frames, args.height, args.width = 2, 270, 480
        args.crop, args.det_size = 64, 160

    from flope_tpu.data.synthetic import SyntheticScene, render_frame, orbit_camera
    from flope_tpu.models import init_posenet
    from flope_tpu.models.yolo import (Yolo11Seg, decode_predictions, init_yolo,
                                       postprocess)
    from flope_tpu.ops.crop_resize import resize_image
    from flope_tpu.pipeline import PipelineConfig
    from flope_tpu.pipeline.detector import detect_and_pose, yolo_detect

    rng = np.random.default_rng(0)
    scene = SyntheticScene.random(rng, n_flowers=12, height=args.height,
                                  width=args.width)
    frames = [render_frame(scene, orbit_camera(scene, 0.15 * i),
                           max_det=args.max_det) for i in range(args.frames)]
    rgbs = jnp.asarray(np.stack([f.rgb for f in frames]), jnp.float32)
    depths = jnp.asarray(np.stack([f.depth_mm for f in frames]), jnp.float32)
    K = jnp.asarray(scene.K, jnp.float32)

    dt = jnp.bfloat16
    _, pvars = init_posenet(jax.random.PRNGKey(0), image_size=args.crop, dtype=dt)
    _, yvars = init_yolo(jax.random.PRNGKey(1), image_size=args.det_size, dtype=dt)
    cfg = PipelineConfig(max_det=args.max_det, crop_size=args.crop,
                         model_dtype=dt, crop_region=448, crop_dtype=dt)

    model = Yolo11Seg(num_classes=1, scale="n", dtype=dt)

    resize_fn = jax.jit(lambda r: jax.vmap(
        lambda x: resize_image(x, args.det_size, args.det_size,
                               method="bilinear") / 255.0)(r))
    inp = resize_fn(rgbs)

    fwd_fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    raw = fwd_fn(yvars, inp)

    def post_mapped(raw):
        def one(box0, box1, box2, cls0, cls1, cls2, mc0, mc1, mc2, proto):
            r = {"box": [box0[None], box1[None], box2[None]],
                 "cls": [cls0[None], cls1[None], cls2[None]],
                 "mc": [mc0[None], mc1[None], mc2[None]]}
            dec = decode_predictions(r)
            return postprocess({k: v[0] for k, v in dec.items()}, proto,
                               max_det=args.max_det, score_th=0.0, iou_th=0.7)
        return jax.vmap(one)(*raw["box"], *raw["cls"], *raw["mc"], raw["proto"])

    post_fn = jax.jit(post_mapped)
    post = post_fn(raw)

    up_fn = jax.jit(lambda m: jax.vmap(
        lambda x: resize_image(x * 255.0, args.height, args.width,
                               method="bilinear"))(m))

    det_fn = jax.jit(lambda v, r: jax.vmap(
        lambda x: yolo_detect(v, x, args.det_size, args.max_det, 0.0, 0.7)[0]
    )(r))
    full_fn = jax.jit(lambda yv, pv, r, d: jax.vmap(
        lambda rr, dd: detect_and_pose(yv, pv, rr, dd, K,
                                       det_size=args.det_size, score_th=0.0,
                                       config=cfg).poses)(r, d))

    res = {}
    res["frame_resize"] = timeit(resize_fn, rgbs)
    res["yolo_forward"] = timeit(fwd_fn, yvars, inp)
    res["decode_postprocess"] = timeit(post_fn, raw)
    res["mask_upsample"] = timeit(up_fn, post["union_mask"])
    res["yolo_detect_full"] = timeit(det_fn, yvars, rgbs)
    res["detect_and_pose"] = timeit(full_fn, yvars, pvars, rgbs, depths)
    flat = args.frames * args.max_det
    print(f"== {args.frames}x{args.max_det} det, det_size={args.det_size}, "
          f"crop={args.crop}, {args.width}x{args.height} ==")
    for k, v in res.items():
        print(f"{k:20s} {v:8.2f} ms/batch")
    print(f"{'crops/s (full)':20s} {flat / res['detect_and_pose'] * 1e3:8.0f}")


if __name__ == "__main__":
    main()
