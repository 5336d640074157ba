"""Streaming pose loop over an rgb/depth dataset dir (reference: live_pose.py).

Per frame: detect -> fused pipeline -> overlay poses -> save to vis_pose/.
Optionally runs the online Kalman tracker over camera poses (the FlowerModel
loop, flower_model.py:277-291) with --track.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--posenet-ckpt", default=None)
    ap.add_argument("--detector", choices=["mask", "yolo"], default="mask")
    ap.add_argument("--yolo-ckpt", default=None)
    ap.add_argument("--max-det", type=int, default=16)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--depth-scale", type=float, default=1e-3)
    ap.add_argument("--track", action="store_true")
    ap.add_argument("--live-plot", action="store_true",
                    help="with --track: live per-track 7-D state plots, the "
                         "reference FlowerModel's live views "
                         "(flower_model.py:47-143); interactive figure when a "
                         "display exists, else atomically rewrites "
                         "live_state.png every frame")
    ap.add_argument("--dist-th-mm", type=float, default=50.0)
    ap.add_argument("--out", default=None, help="output vis dir (default <data>/vis_pose)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu)
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from flope_tpu.geometry import pose_cam_to_world, rotmat_to_quat
    from flope_tpu.models import init_posenet
    from flope_tpu.pipeline import PipelineConfig, predict_frame
    from flope_tpu.pipeline.precomputed import MaskDirDetector
    from flope_tpu.tracking import init_tracks, tracker_step
    from flope_tpu.utils.checkpoint import load_posenet_ckpt
    from flope_tpu.utils.io import DatasetPaths, load_pose, read_intrinsics_yaml, pth
    from flope_tpu.utils.plot import plot_flower_poses_on_image

    data = DatasetPaths(args.data_dir)
    K, h, w = read_intrinsics_yaml(data.intrin)
    out_dir = Path(args.out) if args.out else data.vis_pose
    out_dir.mkdir(exist_ok=True, parents=True)

    _, variables = init_posenet(jax.random.PRNGKey(0), image_size=args.crop)
    if args.posenet_ckpt:
        variables = load_posenet_ckpt(args.posenet_ckpt)
    cfg = PipelineConfig(max_det=args.max_det, crop_size=args.crop,
                         depth_scale=args.depth_scale)

    if args.detector == "mask":
        detector = MaskDirDetector(data.mask, args.max_det)
    else:
        from flope_tpu.models.yolo import init_yolo
        from flope_tpu.pipeline.detector import YoloJaxDetector
        _, yolo_v = init_yolo(jax.random.PRNGKey(1))
        if args.yolo_ckpt:
            from flope_tpu.utils.checkpoint import load_ckpt
            yolo_v = load_ckpt(args.yolo_ckpt)
        detector = YoloJaxDetector(yolo_v, max_det=args.max_det)

    tracks = init_tracks(64) if args.track else None
    live = None
    if args.track and args.live_plot:
        from flope_tpu.tracking import LiveStatePlot
        live = LiveStatePlot(out_png=out_dir / "live_state.png")

    for name in data.files:
        rgb = np.asarray(Image.open(pth(data.rgb, name, "png")))[..., :3]
        dpath_npy = pth(data.depth, name, "npy")
        if dpath_npy.exists():
            depth = np.load(dpath_npy) * 1000.0  # stored meters -> mm units
        else:
            depth = np.asarray(Image.open(pth(data.depth, name, "png")),
                               np.float32)
        if hasattr(detector, "set_frame"):
            detector.set_frame(name)
        boxes, valid, mask = detector.detect(rgb)
        pred = predict_frame(variables, jnp.asarray(rgb),
                             jnp.asarray(depth.astype(np.float32)),
                             jnp.asarray(boxes), jnp.asarray(valid),
                             jnp.asarray(mask), jnp.asarray(K, jnp.float32), cfg)
        keep = np.asarray(pred.valid)
        poses = np.asarray(pred.poses)

        if tracks is not None:
            cam = load_pose(pth(data.pose, name, "txt"))
            world = np.asarray(pose_cam_to_world(jnp.asarray(poses),
                                                 jnp.asarray(cam)))
            quat = np.asarray(rotmat_to_quat(jnp.asarray(world[:, :3, :3])))
            meas = np.concatenate([world[:, :3, 3], quat], axis=1)
            tracks = tracker_step(tracks, jnp.asarray(meas),
                                  jnp.asarray(keep), args.dist_th_mm / 1000.0)
            if live is not None:
                live.update(tracks)

        vis = rgb[..., ::-1].copy()
        plot_flower_poses_on_image(vis, poses[keep], K)
        Image.fromarray(vis[..., ::-1]).save(out_dir / f"{name}.png")
        print(f"{name}: {int(keep.sum())} flowers"
              + (f", {int(np.asarray(tracks.alive).sum())} tracks"
                 if tracks is not None else ""))

    if live is not None:
        live.close()
    if tracks is not None:
        alive = np.asarray(tracks.alive)
        print(f"final tracks: {alive.sum()}, scores "
              f"{np.asarray(tracks.score)[alive].tolist()}")


if __name__ == "__main__":
    sys.exit(main())
