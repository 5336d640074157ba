"""A/B the Pallas fused crop kernel vs the XLA region path on the real chip."""

import _bootstrap  # noqa: F401
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
        args.frames, args.height, args.width = 2, 270, 480
        args.crop, args.region = 64, 192

    from flope_tpu.data.synthetic import SyntheticScene, render_frame, orbit_camera
    from flope_tpu.ops import crop_resize_with_mask
    from flope_tpu.ops.crop_pallas import crop_resize_with_mask_pallas

    rng = np.random.default_rng(0)
    scene = SyntheticScene.random(rng, n_flowers=12, height=args.height,
                                  width=args.width)
    frames = [render_frame(scene, orbit_camera(scene, 0.15 * i),
                           max_det=args.max_det) for i in range(args.frames)]
    rgbs = jnp.asarray(np.stack([f.rgb for f in frames]), jnp.float32)
    masks = jnp.asarray(np.stack([f.mask for f in frames]), jnp.float32)
    boxess = jnp.asarray(np.stack([f.boxes for f in frames]), jnp.float32)

    interp = bool(args.cpu)
    xla_fn = jax.jit(lambda r, m, b: jax.vmap(
        lambda rr, mm, bb: jnp.sum(crop_resize_with_mask(
            rr, mm, bb, out_size=args.crop, region_size=args.region,
            compute_dtype=jnp.bfloat16)))(r, m, b))
    pallas_fn = jax.jit(lambda r, m, b: jnp.sum(crop_resize_with_mask_pallas(
        r, m, b, out_size=args.crop, region_size=args.region,
        compute_dtype=jnp.bfloat16, interpret=interp)))


    # Correctness first (bf16 paths should agree closely).
    a = jax.vmap(lambda rr, mm, bb: crop_resize_with_mask(
        rr, mm, bb, out_size=args.crop, region_size=args.region,
        compute_dtype=jnp.bfloat16))(rgbs, masks, boxess)
    b = crop_resize_with_mask_pallas(
        rgbs, masks, boxess, out_size=args.crop, region_size=args.region,
        compute_dtype=jnp.bfloat16, interpret=interp)
    diff = float(jnp.max(jnp.abs(a - b)))
    print(f"max abs diff vs XLA path: {diff}")

    t_xla = timeit(xla_fn, rgbs, masks, boxess)
    t_pls = timeit(pallas_fn, rgbs, masks, boxess)
    print(f"xla region path   {t_xla:8.2f} ms/batch")
    print(f"pallas fused      {t_pls:8.2f} ms/batch")


if __name__ == "__main__":
    main()
