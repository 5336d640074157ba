"""Single-frame predictor demo (reference: scripts/simple_pose_plot.py):
run the pipeline on one rgb+depth pair and save the axes overlay."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rgb", required=True)
    ap.add_argument("--depth", required=True)
    ap.add_argument("--intrinsics", required=True)
    ap.add_argument("--mask", default=None, help="segmentation mask png")
    ap.add_argument("--posenet-ckpt", default=None)
    ap.add_argument("--out", default="axis_projected.png")
    ap.add_argument("--depth-scale", type=float, default=1e-3)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu)
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from flope_tpu.models import init_posenet
    from flope_tpu.pipeline import PipelineConfig, predict_frame
    from flope_tpu.pipeline.precomputed import boxes_from_mask
    from flope_tpu.utils.checkpoint import load_posenet_ckpt
    from flope_tpu.utils.io import read_intrinsics_yaml
    from flope_tpu.utils.plot import plot_flower_poses_on_image

    rgb = np.asarray(Image.open(args.rgb))[..., :3]
    depth = (np.load(args.depth) / args.depth_scale
             if args.depth.endswith(".npy")
             else np.asarray(Image.open(args.depth), np.float32))
    K, _, _ = read_intrinsics_yaml(args.intrinsics)
    assert args.mask, "this build needs --mask (or use live_pose with a detector)"
    mask = np.asarray(Image.open(args.mask))
    if mask.ndim == 3:
        mask = mask[..., 0]
    boxes, valid = boxes_from_mask(mask)

    _, variables = init_posenet(jax.random.PRNGKey(0), image_size=args.crop)
    if args.posenet_ckpt:
        variables = load_posenet_ckpt(args.posenet_ckpt)
    cfg = PipelineConfig(crop_size=args.crop, depth_scale=args.depth_scale)
    pred = predict_frame(variables, jnp.asarray(rgb),
                         jnp.asarray(depth.astype(np.float32)),
                         jnp.asarray(boxes), jnp.asarray(valid),
                         jnp.asarray(mask), jnp.asarray(K, jnp.float32), cfg)
    keep = np.asarray(pred.valid)
    vis = rgb[..., ::-1].copy()
    plot_flower_poses_on_image(vis, np.asarray(pred.poses)[keep], K)
    Image.fromarray(vis[..., ::-1]).save(args.out)
    print(f"{int(keep.sum())} flowers -> {args.out}")


if __name__ == "__main__":
    sys.exit(main())
