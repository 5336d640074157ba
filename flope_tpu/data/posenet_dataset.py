"""PoseNet crop datasets: disk loader (reference layout) + synthetic factory.

Disk format = the reference's PoseNetFlowerDataset
(sunflower/dataset/posenet_flower_dataset.py:11-52): a directory with
  images/<name>.png       512x512 masked crops
  poses/<name>.txt        quat(xyzw)4 + t3, tab-separated
  intrinsics/<name>.txt   fx fy cx cy, tab-separated
Deterministic 80/20 split by sorted filename (posenet_flower_dataset.py:21-27).

`synthetic_crops` manufactures an equivalent in-memory dataset with exact GT
from the synthetic renderer — used by tests, the training smoke path and the
benchmark when no capture data exists.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from flope_tpu.data.synthetic import render_flower_crop
from flope_tpu.utils.io import pth

__all__ = ["load_crop_dataset", "synthetic_crops", "write_crop_dataset"]


def _quat_to_rotmat_np(q):
    from scipy.spatial.transform import Rotation as sciR
    return sciR.from_quat(q).as_matrix()


def load_crop_dataset(path: str | Path, test: bool = False,
                      limit: int | None = None) -> dict:
    """Load the reference crops layout into arrays.

    Returns {'images': (N,S,S,3) float32 in [0,1], 'rotations': (N,3,3),
    'translations': (N,3), 'intrinsics': (N,4)}.
    """
    from PIL import Image

    root = Path(path)
    files = sorted(os.listdir(root / "images"))
    split = int(0.8 * len(files))
    files = files[split:] if test else files[:split]
    if limit:
        files = files[:limit]
    images, rots, trans, intr = [], [], [], []
    for fname in files:
        name = fname.rsplit(".", 1)[0]
        img = np.asarray(Image.open(root / "images" / fname), np.float32) / 255.0
        qt = np.loadtxt(root / "poses" / f"{name}.txt", delimiter="\t")
        k = np.loadtxt(root / "intrinsics" / f"{name}.txt", delimiter="\t")
        images.append(img[..., :3])
        rots.append(_quat_to_rotmat_np(qt[:4]))
        trans.append(qt[4:7])
        intr.append(k)
    return {"images": np.stack(images), "rotations": np.stack(rots),
            "translations": np.stack(trans), "intrinsics": np.stack(intr)}


def synthetic_crops(n: int, size: int = 512, seed: int = 0,
                    yaw_nullified: bool = True,
                    box_jitter: float = 0.0,
                    domain=None) -> dict:
    """Exact-GT crop dataset from the synthetic flower shader.

    Crops are rendered with FULL random rotations (including yaw — that's what
    real frames show), while with yaw_nullified=True the LABELS are the
    yaw-nullified representatives: exactly the function the pipeline needs,
    since it yaw-nullifies predictions (pose_predictor.py:161) and the
    reference's training labels were yaw-nullified too
    (posenet_data_generator.py:418).
    """
    from scipy.spatial.transform import Rotation as sciR

    rng = np.random.default_rng(seed)
    R_full = sciR.random(n, random_state=np.random.RandomState(seed)).as_matrix()
    if yaw_nullified:
        e = sciR.from_matrix(R_full).as_euler("zyx", degrees=True)
        e[:, 0] = 0.0
        R = sciR.from_euler("zyx", e, degrees=True).as_matrix()
    else:
        R = R_full
    # fill=1.0 matches the pipeline's squarified boxes, which bound the flower
    # tightly (render_frame's box = disc extents) — train/test scale parity.
    # box_jitter > 0 randomizes center/scale per crop to emulate imperfect
    # detector boxes (the fix for real-detector crop misalignment).
    if box_jitter > 0:
        offs = rng.uniform(-box_jitter, box_jitter, size=(n, 2))
        fills = rng.uniform(1.0 - 2 * box_jitter, 1.0 + box_jitter, size=n)
    else:
        offs = np.zeros((n, 2))
        fills = np.ones(n)
    if domain is not None and not domain.is_flat():
        # Hard-domain crops (petals, foliage leak, lighting/noise/blur) —
        # per-crop rng so the dataset is reproducible and iid.
        images = np.stack([
            render_flower_crop(R_full[i], size, fill=float(fills[i]),
                               center_offset=(float(offs[i, 0]), float(offs[i, 1])),
                               domain=domain,
                               rng=np.random.default_rng((seed << 20) + i))
            for i in range(n)])
    else:
        # Native batched renderer when a toolchain exists (~20x on this 1-CPU
        # host; parity-tested vs the numpy path in tests/test_native.py).
        from flope_tpu.native import render_crops_native
        images = render_crops_native(R_full, offs, fills, size)
        if images is None:
            images = np.stack([
                render_flower_crop(R_full[i], size, fill=float(fills[i]),
                                   center_offset=(float(offs[i, 0]), float(offs[i, 1])))
                for i in range(n)])
    t = np.zeros((n, 3))
    t[:, 2] = rng.uniform(0.3, 1.5, size=n)
    # Fake crop intrinsics like the reference's fixed fx=fy=2433, c=size/2
    # (posenet_labeled_data.py:292-296).
    intr = np.tile(np.array([2433.0, 2433.0, size / 2.0, size / 2.0]), (n, 1))
    return {"images": images.astype(np.float32) / 255.0,
            "rotations": R.astype(np.float32),
            "translations": t.astype(np.float32),
            "intrinsics": intr.astype(np.float32)}


def write_crop_dataset(out_dir: str | Path, n: int, size: int = 512,
                       seed: int = 0) -> Path:
    """Materialize a synthetic crop dataset in the reference's disk layout."""
    from PIL import Image
    from scipy.spatial.transform import Rotation as sciR

    data = synthetic_crops(n, size, seed)
    out = Path(out_dir)
    for sub in ["images", "poses", "intrinsics"]:
        (out / sub).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        name = f"{i:06d}"
        Image.fromarray((data["images"][i] * 255).astype(np.uint8)).save(
            out / "images" / f"{name}.png")
        q = sciR.from_matrix(data["rotations"][i]).as_quat()
        np.savetxt(out / "poses" / f"{name}.txt",
                   np.concatenate([q, data["translations"][i]])[None],
                   delimiter="\t")
        np.savetxt(out / "intrinsics" / f"{name}.txt",
                   data["intrinsics"][i][None], delimiter="\t")
    return out
