"""Undistort a folder of images (reference: scripts/undistort_images.py,
which hard-coded the Pixel 6a intrinsics; here they're flags with the same
defaults, see flope_tpu.data.cameras)."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--camera", default="pixel6a", choices=["pixel6a", "custom"])
    ap.add_argument("--fx", type=float), ap.add_argument("--fy", type=float)
    ap.add_argument("--cx", type=float), ap.add_argument("--cy", type=float)
    ap.add_argument("--dist", type=float, nargs=5,
                    default=[0.0, 0.0, 0.0, 0.0, 0.0])
    args = ap.parse_args(argv)

    import cv2

    from flope_tpu.data.cameras import pixel6a_intrinsics

    if args.camera == "pixel6a":
        K = pixel6a_intrinsics()["K"]
        dist = np.asarray(pixel6a_intrinsics()["distortion"])
    else:
        K = np.array([[args.fx, 0, args.cx], [0, args.fy, args.cy], [0, 0, 1]])
        dist = np.asarray(args.dist)

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for f in sorted(Path(args.in_dir).iterdir()):
        if f.suffix.lower() not in {".png", ".jpg", ".jpeg"}:
            continue
        img = cv2.imread(str(f))
        und = cv2.undistort(img, K, dist)
        cv2.imwrite(str(out / f.name), und)
    print(f"undistorted into {out}")


if __name__ == "__main__":
    sys.exit(main())
