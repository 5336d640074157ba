"""Project fused flower poses back into every frame; optionally render video.

Reference: scripts/plot_measurements.py — reads aligned/average_poses.pkl,
projects the world-frame fused poses through each frame's camera, draws axes,
writes vis_gt/, then ffmpeg-renders a video (utils/io.py:101-104).
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import pickle
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--score-th", type=float, default=0.0)
    ap.add_argument("--video", action="store_true")
    ap.add_argument("--tpu", action="store_true", help="run on the TPU backend (default: CPU)")
    ap.add_argument("--fps", type=int, default=10)
    args = ap.parse_args(argv)

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from flope_tpu.geometry import invert_pose, pose_matrix, quat_to_rotmat
    from flope_tpu.utils.io import DatasetPaths, load_pose, read_intrinsics_yaml, pth
    from flope_tpu.utils.plot import plot_flower_poses_on_image

    data = DatasetPaths(args.data_dir)
    data.vis_gt.mkdir(exist_ok=True, parents=True)
    K, _, _ = read_intrinsics_yaml(data.intrin)
    with open(data.aligned / "average_poses.pkl", "rb") as f:
        avg = pickle.load(f)
    keep = avg["score"] > args.score_th
    trans, quat = avg["trans"][keep], avg["quat"][keep]
    world = np.asarray(pose_matrix(quat_to_rotmat(jnp.asarray(quat)),
                                   jnp.asarray(trans)))
    print(f"projecting {world.shape[0]} fused flowers into {len(data.files)} frames")

    for name in data.files:
        rgb = np.asarray(Image.open(pth(data.rgb, name, "png")))[..., :3]
        cam = load_pose(pth(data.pose, name, "txt"))
        w2c = np.asarray(invert_pose(jnp.asarray(cam)))
        cam_frame = w2c @ world
        vis = rgb[..., ::-1].copy()
        plot_flower_poses_on_image(vis, cam_frame, K, plot_distance=False)
        Image.fromarray(vis[..., ::-1]).save(pth(data.vis_gt, name, "png"))

    if args.video:
        import os
        cmd = (f"ffmpeg -framerate {args.fps} -pattern_type glob "
               f"-i '{data.vis_gt}/*.png' -y -c:v libx264 -pix_fmt yuv420p "
               f"{data.vis_gt}/all_frames.mp4")
        print("running:", cmd)
        os.system(cmd)


if __name__ == "__main__":
    sys.exit(main())
