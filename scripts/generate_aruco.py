"""Generate the printable 6x4 ArUco marker grid (reference:
scripts/generate_aruco.py)."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="aruco_grid.png")
    ap.add_argument("--cols", type=int, default=6)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--px-per-mm", type=float, default=4.0)
    args = ap.parse_args(argv)

    import cv2

    from flope_tpu.data.aruco_gt import ArucoGridConfig, generate_grid_image

    cfg = ArucoGridConfig(cols=args.cols, rows=args.rows)
    img = generate_grid_image(cfg, args.px_per_mm)
    cv2.imwrite(args.out, img)
    print(f"{args.rows}x{args.cols} grid -> {args.out} ({img.shape})")


if __name__ == "__main__":
    sys.exit(main())
