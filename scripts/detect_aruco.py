"""Debug ArUco detection + grid pose estimation over a folder (reference:
scripts/detect_aruco.py)."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in-dir", required=True)
    ap.add_argument("--intrinsics", required=True, help="intrinsics.yaml")
    ap.add_argument("--out-dir", default=None, help="annotated output dir")
    args = ap.parse_args(argv)

    import cv2

    from flope_tpu.data.aruco_gt import MultiArucoPoseEstimator
    from flope_tpu.utils.io import read_intrinsics_yaml
    from flope_tpu.utils.plot import plot_axes

    K, _, _ = read_intrinsics_yaml(args.intrinsics)
    est = MultiArucoPoseEstimator(K)
    out = Path(args.out_dir) if args.out_dir else None
    if out:
        out.mkdir(parents=True, exist_ok=True)
    for f in sorted(Path(args.in_dir).iterdir()):
        if f.suffix.lower() not in {".png", ".jpg", ".jpeg"}:
            continue
        img = cv2.imread(str(f))
        T = est.estimate_pose(img)
        if T is None:
            print(f"{f.name}: no markers")
            continue
        print(f"{f.name}: t={T[:3, 3].round(4).tolist()}")
        if out:
            plot_axes(img, T[:3, :3], T[:3, 3], K, axis_len=0.1, thickness=3)
            cv2.imwrite(str(out / f.name), img)


if __name__ == "__main__":
    sys.exit(main())
