"""Raw vs KF-filtered 7-D state plots (reference: scripts/plot_filtered.py)."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import pickle
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--flower", type=int, default=0)
    ap.add_argument("--out", default="filtered_vs_raw.png")
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from flope_tpu.utils.io import DatasetPaths

    data = DatasetPaths(args.data_dir)
    with open(data.aligned / "measurements.pkl", "rb") as f:
        raw = pickle.load(f)
    with open(data.aligned / "measurements_quat_filter.pkl", "rb") as f:
        filt = pickle.load(f)

    j = args.flower
    labels = ["x", "y", "z", "qx", "qy", "qz", "qw"]
    raw7 = np.concatenate([raw["trans"][:, j], raw["quat"][:, j]], axis=1)
    fil7 = np.concatenate([filt["trans"][:, j], filt["quat"][:, j]], axis=1)
    seen = np.abs(raw7[:, :3]).sum(-1) != 0
    fig, axs = plt.subplots(1, 7, figsize=(21, 3))
    for i, ax in enumerate(axs):
        ax.plot(np.where(seen)[0], raw7[seen, i], ":", label="raw")
        ax.plot(np.where(seen)[0], fil7[seen, i], "-", label="filtered")
        ax.set_title(labels[i])
    axs[0].legend()
    plt.tight_layout()
    plt.savefig(args.out, dpi=100)
    print(f"flower {j}: {int(seen.sum())} observations -> {args.out}")


if __name__ == "__main__":
    sys.exit(main())
