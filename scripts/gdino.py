"""Teacher detection stage: GroundingDINO(+SAM) detections -> detection/*.txt
+ mask/ (reference: scripts/gdino.py). Requires local HF checkpoints (no
network egress here); see flope_tpu.pipeline.detector.TeacherDetector."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--gdino-path", required=True,
                    help="local HF dir for IDEA-Research/grounding-dino-tiny")
    ap.add_argument("--sam-path", required=True,
                    help="local HF dir for facebook/sam-vit-huge")
    ap.add_argument("--prompt", default="white flower.")
    ap.add_argument("--max-det", type=int, default=16)
    args = ap.parse_args(argv)

    from PIL import Image

    from flope_tpu.pipeline.detector import TeacherDetector
    from flope_tpu.utils.io import DatasetPaths, pth

    data = DatasetPaths(args.data_dir)
    data.det.mkdir(exist_ok=True, parents=True)
    data.mask.mkdir(exist_ok=True, parents=True)
    det = TeacherDetector(args.gdino_path, args.sam_path,
                          max_det=args.max_det, prompt=args.prompt)
    for name in data.files:
        rgb = np.asarray(Image.open(pth(data.rgb, name, "png")))[..., :3]
        boxes, valid, mask = det.detect(rgb)
        rows = []
        for i in np.where(valid)[0]:
            x0, y0, x1, y1 = boxes[i]
            rows.append([x0, y0, x1, y1, (x0 + x1) / 2, (y0 + y1) / 2]
                        + [1, 0, 0, 0, 1, 0, 0, 0, 1])  # placeholder rotmat
        np.savetxt(pth(data.det, name, "txt"), np.array(rows), fmt="%.7f")
        Image.fromarray(mask).save(pth(data.mask, name, "png"))
        print(f"{name}: {int(valid.sum())} detections")


if __name__ == "__main__":
    sys.exit(main())
