"""Legacy (image, quaternion) dataset loader.

Reference: sunflower/dataset/flower_dataset.py — a OnePose-format directory
with color/ images and poses_ba/ quaternion txts; legacy/unused by the main
path but part of the inventory.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

__all__ = ["load_legacy_flower_dataset"]


def load_legacy_flower_dataset(path: str | Path, limit: int | None = None) -> dict:
    """Returns {'images': (N,H,W,3) float32 [0,1], 'quats': (N,4) xyzw}."""
    from PIL import Image

    root = Path(path)
    img_dir = root / "color"
    pose_dir = root / "poses_ba"
    files = sorted(os.listdir(img_dir))
    if limit:
        files = files[:limit]
    images, quats = [], []
    for fname in files:
        stem = fname.rsplit(".", 1)[0]
        images.append(np.asarray(Image.open(img_dir / fname), np.float32)[..., :3] / 255.0)
        quats.append(np.loadtxt(pose_dir / f"{stem}.txt")[:4])
    return {"images": np.stack(images), "quats": np.stack(quats)}
