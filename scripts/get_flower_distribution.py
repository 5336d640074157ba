"""Per-flower measurement variance analysis (reference:
scripts/get_flower_distribution.py): from aligned measurements, the 7-D
(trans+quat) variance of each flower observed >= 10 times, averaged."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import pickle
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--min-observations", type=int, default=10)
    args = ap.parse_args(argv)

    from flope_tpu.utils.io import DatasetPaths

    data = DatasetPaths(args.data_dir)
    with open(data.aligned / "measurements.pkl", "rb") as f:
        meas = pickle.load(f)
    trans = np.transpose(meas["trans"], (1, 0, 2))  # (N, F, 3)
    quat = np.transpose(meas["quat"], (1, 0, 2))
    all_var = []
    for t, q in zip(trans, quat):
        seen = np.abs(t).sum(-1) != 0
        if seen.sum() < args.min_observations:
            continue
        all_var.append(np.hstack([t[seen].var(0), q[seen].var(0)]))
    if not all_var:
        print("no flower observed often enough")
        return 1
    avg = np.mean(all_var, axis=0)
    labels = ["x", "y", "z", "qx", "qy", "qz", "qw"]
    for lab, v in zip(labels, avg):
        print(f"var[{lab}] = {v:.6e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
