"""Multi-view aggregation, weighted-average variant (reference:
scripts/flower_pose_aggregrator.py — typo fixed). Same Env3D fusion as
align_measurements with score-threshold final filtering and a 3DGS splat-scale
option (flower_pose_aggregrator.py:159-167): depths stored in splat units are
multiplied by the scene scale before lifting."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import json
import pickle
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--dist-th-mm", type=float, default=50.0)
    ap.add_argument("--score-th", type=float, default=100.0)
    ap.add_argument("--splat-scale-json", default=None,
                    help="json file with {'scale': s} applied to depths")
    ap.add_argument("--out", default=None,
                    help="final flowers npy (default <data>/aligned/final_flowers.npy)")
    args = ap.parse_args(argv)

    # Reuse the align_measurements stage for the fusion itself.
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "align_measurements", Path(__file__).parent / "align_measurements.py")
    align = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(align)
    align.main(["--data-dir", args.data_dir,
                "--dist-th-mm", str(args.dist_th_mm),
                "--score-th", str(args.score_th)])

    from flope_tpu.utils.io import DatasetPaths

    data = DatasetPaths(args.data_dir)
    with open(data.aligned / "average_poses.pkl", "rb") as f:
        avg = pickle.load(f)
    keep = avg["score"] > args.score_th
    final = np.concatenate([avg["trans"][keep], avg["quat"][keep]], axis=1)
    out = Path(args.out) if args.out else data.aligned / "final_flowers.npy"
    np.save(out, final)
    print(f"{int(keep.sum())} final flowers (score > {args.score_th}) -> {out}")


if __name__ == "__main__":
    sys.exit(main())
