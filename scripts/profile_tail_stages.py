"""Isolate the detect-tail's per-stage cost on the real chip.

Times, with the relay-safe on-device-scalar fence: erosion+depth pooling,
masked crop+resize (at the deployed crop_region), PoseNet forward, and the
whole fused tail — so crop-machinery levers are ranked by milliseconds, not
guesses.
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
    ap.add_argument("--region", type=int, default=448)
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu)
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        args.frames, args.height, args.width, args.crop, args.region = 2, 270, 480, 64, 128

    from flope_tpu.data.synthetic import SyntheticScene, render_frame, orbit_camera
    from flope_tpu.models import PoseNet, init_posenet
    from flope_tpu.ops import crop_resize_with_mask, masked_depth_value
    from flope_tpu.pipeline import PipelineConfig, predict_frames

    rng = np.random.default_rng(0)
    scene = SyntheticScene.random(rng, n_flowers=12, height=args.height,
                                  width=args.width)
    frames = [render_frame(scene, orbit_camera(scene, 0.15 * i),
                           max_det=args.max_det) for i in range(args.frames)]
    rgbs = jnp.asarray(np.stack([f.rgb for f in frames]), jnp.float32)
    depths = jnp.asarray(np.stack([f.depth_mm for f in frames]), jnp.float32)
    boxess = jnp.asarray(np.stack([f.boxes for f in frames]))
    valids = jnp.asarray(np.stack([f.valid for f in frames]))
    masks = jnp.asarray(np.stack([f.mask for f in frames]), jnp.float32)
    K = jnp.asarray(scene.K, jnp.float32)

    model, pvars = init_posenet(jax.random.PRNGKey(0), image_size=args.crop,
                                dtype=jnp.bfloat16)
    cfg = PipelineConfig(max_det=args.max_det, crop_size=args.crop,
                         model_dtype=jnp.bfloat16, crop_region=args.region,
                         crop_dtype=jnp.bfloat16)

    depth_fn = jax.jit(lambda b, d, m: jax.vmap(
        lambda bb, dd, mm: masked_depth_value(bb, dd * 1e-3, mm)[0]
    )(b, d, m))
    depth_region_fn = jax.jit(lambda b, d, m: jax.vmap(
        lambda bb, dd, mm: masked_depth_value(bb, dd * 1e-3, mm,
                                              region_size=args.region)[0]
    )(b, d, m))
    from flope_tpu.ops.morphology import erode
    erode_fn = jax.jit(lambda m: jax.vmap(
        lambda mm: erode(mm > 128, 10))(m))
    crops_fn = jax.jit(lambda r, m, b: jax.vmap(
        lambda rr, mm, bb: jnp.sum(crop_resize_with_mask(
            rr, mm, bb, out_size=args.crop, region_size=args.region,
            compute_dtype=jnp.bfloat16))
    )(r, m, b))
    flat = args.frames * args.max_det
    crop_batch = jnp.zeros((flat, args.crop, args.crop, 3), jnp.float32)
    pose_fn = jax.jit(lambda v, x: jnp.sum(PoseNet.to_rotmats(
        PoseNet(dtype=jnp.bfloat16).apply(v, x, train=False))))
    tail_fn = jax.jit(lambda v, r, d, b, va, m: jnp.sum(predict_frames(
        v, r, d, b, va, m, K, cfg).poses))

    res = {}
    res["erode_only"] = timeit(erode_fn, masks)
    res["erode_depth_pool"] = timeit(depth_fn, boxess, depths, masks)
    res["erode_depth_region"] = timeit(depth_region_fn, boxess, depths, masks)
    res["crop_resize_mask"] = timeit(crops_fn, rgbs, masks, boxess)
    res["posenet_forward"] = timeit(pose_fn, pvars, crop_batch)
    res["full_tail"] = timeit(tail_fn, pvars, rgbs, depths, boxess, valids, masks)
    print(f"== {args.frames}x{args.max_det} det, crop={args.crop}, "
          f"region={args.region}, {args.width}x{args.height} ==")
    for k, v in res.items():
        print(f"{k:20s} {v:8.2f} ms/batch")
    print(f"{'crops/s (tail)':20s} {flat / res['full_tail'] * 1e3:8.0f}")


if __name__ == "__main__":
    main()
