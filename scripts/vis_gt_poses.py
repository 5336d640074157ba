"""Project gt_poses.npy into every frame (reference: scripts/vis_gt_poses.py,
a stub there; functional here): world-frame GT flower poses -> per-frame
camera-frame overlay images in vis_gt/."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from flope_tpu.geometry import invert_pose
    from flope_tpu.utils.io import DatasetPaths, load_pose, read_intrinsics_yaml, pth
    from flope_tpu.utils.plot import plot_flower_poses_on_image

    data = DatasetPaths(args.data_dir)
    data.vis_gt.mkdir(exist_ok=True, parents=True)
    K, _, _ = read_intrinsics_yaml(data.intrin)
    gt = np.load(data.gt_poses)

    for name in data.files:
        rgb = np.asarray(Image.open(pth(data.rgb, name, "png")))[..., :3]
        cam = load_pose(pth(data.pose, name, "txt"))
        w2c = np.asarray(invert_pose(jnp.asarray(cam)))
        cam_frame = w2c @ gt
        vis = rgb[..., ::-1].copy()
        plot_flower_poses_on_image(vis, cam_frame, K, plot_distance=False)
        Image.fromarray(vis[..., ::-1]).save(pth(data.vis_gt, name, "png"))
    print(f"projected {gt.shape[0]} GT poses into {len(data.files)} frames")


if __name__ == "__main__":
    sys.exit(main())
