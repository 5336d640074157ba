"""YOLO inference over a folder (reference: scripts/predict_yolo.py)."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--yolo-ckpt", default=None)
    ap.add_argument("--det-size", type=int, default=640)
    ap.add_argument("--score-th", type=float, default=0.25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu)
    import jax
    from PIL import Image

    from flope_tpu.models.yolo import init_yolo
    from flope_tpu.pipeline.detector import YoloJaxDetector
    from flope_tpu.utils.plot import plot_bounding_boxes

    _, yolo_v = init_yolo(jax.random.PRNGKey(0), image_size=args.det_size)
    if args.yolo_ckpt:
        from flope_tpu.utils.checkpoint import load_ckpt
        yolo_v = load_ckpt(args.yolo_ckpt)
    det = YoloJaxDetector(yolo_v, det_size=args.det_size,
                          score_th=args.score_th)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for f in sorted(Path(args.in_dir).iterdir()):
        if f.suffix.lower() not in {".png", ".jpg", ".jpeg"}:
            continue
        rgb = np.asarray(Image.open(f))[..., :3]
        boxes, valid, mask = det.detect(rgb)
        vis = rgb[..., ::-1].copy()
        plot_bounding_boxes(vis, boxes[valid])
        Image.fromarray(vis[..., ::-1]).save(out / f.name)
        Image.fromarray(mask).save(out / f"{f.stem}_mask.png")
        print(f"{f.name}: {int(valid.sum())} detections")


if __name__ == "__main__":
    sys.exit(main())
