"""Dataset layout + host I/O: the on-disk contract shared by all CLI stages.

Reproduces the reference's dataset directory protocol (DatasetPath,
sunflower/utils/io.py:11-60): rgb/ depth/ detection/ mask/ pose/ depth_val/
aligned/ intrinsics.yaml gt_poses.npy bad.txt, plus pose txt (flat R9+t3,
io.py:69-80) and intrinsics yaml (fx/fy/cx/cy/h/w, io.py:87-98) readers and
the matching writers the reference lacked.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import numpy as np
import yaml

__all__ = [
    "DatasetPaths",
    "load_pose",
    "save_pose",
    "read_intrinsics_yaml",
    "write_intrinsics_yaml",
    "pth",
    "read_splats_ply",
]


@dataclasses.dataclass
class DatasetPaths:
    """Canonical dataset directory layout (reference DatasetPath, io.py:11-60)."""

    path: str | Path

    def __post_init__(self):
        self.dataset = Path(self.path)
        self.rgb = self.dataset / "rgb"
        self.depth = self.dataset / "depth"
        self.det = self.dataset / "detection"
        self.mask = self.dataset / "mask"
        self.pose = self.dataset / "pose"
        self.splats = self.dataset / "splats.ply"
        self.intrin = self.dataset / "intrinsics.yaml"
        self.depth_val = self.dataset / "depth_val"
        self.vis_det = self.dataset / "vis_det"
        self.vis_pose = self.dataset / "vis_pose"
        self.vis_gt = self.dataset / "vis_gt"
        self.aligned = self.dataset / "aligned"
        self.gt_poses = self.dataset / "gt_poses.npy"

        files = sorted(os.listdir(self.rgb)) if self.rgb.is_dir() else []
        bad_path = self.dataset / "bad.txt"
        bad = set()
        if bad_path.exists():
            bad = {line.strip() for line in bad_path.read_text().splitlines()}
        # Strip extensions; skip blacklisted frames (io.py:52-60).
        self.files = [f.rsplit(".", 1)[0] for f in files
                      if f.rsplit(".", 1)[0] not in bad]


def pth(path: Path, name: str, ext: str) -> Path:
    return Path(path) / f"{name}.{ext}"


def load_pose(path) -> np.ndarray:
    """Flat R9+t3 txt -> 4x4 pose (io.py:69-80)."""
    flat = np.loadtxt(path)
    T = np.eye(4)
    T[:3, :3] = flat[:9].reshape(3, 3)
    T[:3, 3] = flat[9:12]
    return T


def save_pose(path, T: np.ndarray) -> None:
    flat = np.concatenate([np.asarray(T)[:3, :3].reshape(-1), np.asarray(T)[:3, 3]])
    np.savetxt(path, flat)


def read_intrinsics_yaml(path) -> tuple[np.ndarray, int, int]:
    """intrinsics.yaml -> (K, height, width) (io.py:87-98)."""
    with open(path) as f:
        d = yaml.safe_load(f)
    K = np.array([[d["fx"], 0, d["cx"]], [0, d["fy"], d["cy"]], [0, 0, 1.0]])
    return K, int(d["h"]), int(d["w"])


def write_intrinsics_yaml(path, K: np.ndarray, height: int, width: int) -> None:
    K = np.asarray(K)
    with open(path, "w") as f:
        yaml.safe_dump(
            {"fx": float(K[0, 0]), "fy": float(K[1, 1]),
             "cx": float(K[0, 2]), "cy": float(K[1, 2]),
             "h": int(height), "w": int(width)}, f)


def read_splats_ply(path) -> tuple[np.ndarray, np.ndarray]:
    """Gaussian-splat .ply -> (points (N,3), colors (N,3) normalized).

    Minimal binary/ascii PLY reader for the vertex fields the reference uses
    (x, y, z, f_dc_0..2 — io.py:107-125) without the plyfile dependency.
    """
    import struct

    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l for l in header if l.startswith("format")).split()[1]
        n = int(next(l for l in header if l.startswith("element vertex")).split()[-1])
        props = [l.split()[-1] for l in header if l.startswith("property")]
        idx = {name: i for i, name in enumerate(props)}
        want = ["x", "y", "z", "f_dc_0", "f_dc_1", "f_dc_2"]
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n).reshape(n, len(props))
        else:
            little = fmt == "binary_little_endian"
            dt = np.dtype([(p, "<f4" if little else ">f4") for p in props])
            data = np.frombuffer(f.read(n * dt.itemsize), dtype=dt)
            data = np.stack([data[p] for p in props], axis=1).astype(np.float64)
        cols = [idx[wname] for wname in want]
        pts = data[:, cols[:3]]
        colors = data[:, cols[3:]]
        rng_span = colors.max() - colors.min()
        colors = (colors - colors.min()) / (rng_span if rng_span > 0 else 1.0)
        return pts, colors
