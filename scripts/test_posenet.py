"""Batch inference over a dataset dir: write detection/, mask/, vis_det/, vis_pose/.

Re-creation of the reference's scripts/test_posenet.py (hydra CLI there;
argparse here). For each frame: detect -> PoseNet rotations -> write the
N x 15 detection rows (bbox4 + center-uv2 + rotmat9, test_posenet.py:150-161)
and annotated visualizations; frames with nothing detected still write null
placeholders so downstream stages stay aligned (test_posenet.py:79-93).

Detector options: --detector mask (connected components from mask/),
--detector yolo --yolo-ckpt <orbax dir>, or --detector gt is not available
here (dataset-only tool).
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--posenet-ckpt", default=None,
                    help="orbax checkpoint dir (posenet_e<N>); random init if absent")
    ap.add_argument("--detector", choices=["mask", "yolo"], default="mask")
    ap.add_argument("--yolo-ckpt", default=None)
    ap.add_argument("--max-det", type=int, default=16)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--score-th", type=float, default=0.25,
                    help="yolo detector score threshold (0.05 is the "
                         "recall-optimal hard-domain operating point, "
                         "PERF.md round 5)")
    ap.add_argument("--refine-boxes", action="store_true",
                    help="mask-tight detector boxes (deployed default)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu)
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from flope_tpu.models import init_posenet
    from flope_tpu.pipeline import PipelineConfig, predict_frame
    from flope_tpu.pipeline.precomputed import MaskDirDetector
    from flope_tpu.utils.io import DatasetPaths, read_intrinsics_yaml, pth
    from flope_tpu.utils.plot import plot_bounding_boxes, plot_flower_poses_on_image
    from flope_tpu.utils.checkpoint import load_posenet_ckpt

    data = DatasetPaths(args.data_dir)
    for d in [data.det, data.mask, data.vis_det, data.vis_pose]:
        d.mkdir(exist_ok=True, parents=True)
    K, h, w = read_intrinsics_yaml(data.intrin)

    model, variables = init_posenet(jax.random.PRNGKey(0), image_size=args.crop)
    if args.posenet_ckpt:
        from flope_tpu.utils.checkpoint import check_ckpt_meta
        variables = load_posenet_ckpt(args.posenet_ckpt)
        check_ckpt_meta(args.posenet_ckpt, image_size=args.crop)
    cfg = PipelineConfig(max_det=args.max_det, crop_size=args.crop)

    if args.detector == "mask":
        detector = MaskDirDetector(data.mask, args.max_det)
    else:
        from flope_tpu.models.yolo import init_yolo
        from flope_tpu.pipeline.detector import YoloJaxDetector
        _, yolo_v = init_yolo(jax.random.PRNGKey(1))
        if args.yolo_ckpt:
            from flope_tpu.utils.checkpoint import load_ckpt
            yolo_v = load_ckpt(args.yolo_ckpt)
        detector = YoloJaxDetector(yolo_v, max_det=args.max_det,
                                   score_th=args.score_th,
                                   refine_boxes=args.refine_boxes)

    for name in data.files:
        rgb = np.asarray(Image.open(pth(data.rgb, name, "png")))[..., :3]
        if hasattr(detector, "set_frame"):
            detector.set_frame(name)
        boxes, valid, mask = detector.detect(rgb)
        vis = rgb[..., ::-1].copy()  # BGR for cv2 drawing like the reference

        if not valid.any():
            # Null-placeholder protocol (test_posenet.py:79-93).
            Image.fromarray(vis[..., ::-1]).save(pth(data.vis_det, name, "png"))
            Image.fromarray(np.zeros_like(mask)).save(pth(data.mask, name, "png"))
            np.savetxt(pth(data.det, name, "txt"), np.array([]), fmt="%.7f")
            Image.fromarray(vis[..., ::-1]).save(pth(data.vis_pose, name, "png"))
            continue

        # Depth isn't needed for the detection txt (rotation-only stage);
        # feed zeros and ignore depth-validity for the written rows.
        depth = np.zeros(rgb.shape[:2], np.float32)
        pred = predict_frame(variables, jnp.asarray(rgb), jnp.asarray(depth),
                             jnp.asarray(boxes), jnp.asarray(valid),
                             jnp.asarray(mask), jnp.asarray(K, jnp.float32), cfg)

        keep = np.asarray(valid)
        rows = []
        R = np.asarray(pred.rotmats)
        for i in np.where(keep)[0]:
            x0, y0, x1, y1 = boxes[i]
            rows.append(list(map(float, [x0, y0, x1, y1,
                                         (x0 + x1) / 2, (y0 + y1) / 2]))
                        + R[i].reshape(-1).tolist())
        np.savetxt(pth(data.det, name, "txt"), np.array(rows), fmt="%.7f")
        Image.fromarray(mask).save(pth(data.mask, name, "png"))

        plot_bounding_boxes(vis, boxes[keep])
        Image.fromarray(vis[..., ::-1]).save(pth(data.vis_det, name, "png"))
        poses = np.tile(np.eye(4), (int(keep.sum()), 1, 1))
        poses[:, :3, :3] = R[keep]
        poses[:, :3, 3] = [0, 0, 1]
        vis2 = rgb[..., ::-1].copy()
        plot_flower_poses_on_image(vis2, poses, K, plot_distance=False)
        Image.fromarray(vis2[..., ::-1]).save(pth(data.vis_pose, name, "png"))
        print(f"{name}: {int(keep.sum())} flowers")


if __name__ == "__main__":
    sys.exit(main())
