"""Run the reference's ACTUAL fusion-stage scripts on a dataset directory.

A/B grounding for the offline fusion stages (VERDICT r2 item 5b): the
reference's `scripts/align_measurements.py` (Env3D score-weighted running
average, :30-113) and `scripts/kalman_filter.py` (per-flower 7-D KF,
:77-134) execute UNMODIFIED via runpy, with:

* `sunflower` + dependency shims on sys.path (compat.add_reference_paths;
  filterpy and tyro shims added for these scripts),
* `sunflower.utils.io.DatasetPath` monkeypatched so the scripts' hard-coded
  capture paths resolve to the dataset under test,
* camera pose txts converted to the t3+q4 layout this pipeline stage reads
  (align_measurements.py:216 — older-format poses, unlike test_posenet.py's
  R9+t3). Quaternion order is scipy xyzw: the script decodes with the plain
  ``qvec2rotmat`` = ``sciR.from_quat`` (conversion.py:37-38), NOT the
  ``_colmap`` wxyz variants.

The outputs (aligned/measurements.pkl, aligned/average_poses.pkl,
aligned/measurements_quat_filter.pkl) are then comparable 1:1 with the ones
our scripts/align_measurements.py + scripts/kalman_filter.py write.
"""

from __future__ import annotations

import contextlib
import pickle
import runpy
import shutil
import sys
from pathlib import Path

import numpy as np

from flope_tpu.compat import add_reference_paths
from flope_tpu.compat.reference_runner import DEFAULT_REFERENCE_ROOT

__all__ = ["prepare_reference_pose_format", "run_reference_align",
           "run_reference_kalman", "load_aligned_pickles"]


def prepare_reference_pose_format(dataset_dir: str | Path) -> None:
    """Convert pose/ txts from R9+t3 (12 numbers) to t3+q4 xyzw (7 numbers)
    in place; already-converted files pass through untouched."""
    from scipy.spatial.transform import Rotation as sciR

    pose_dir = Path(dataset_dir) / "pose"
    for f in sorted(pose_dir.glob("*.txt")):
        raw = np.loadtxt(f)
        if raw.size == 7:
            continue
        R = raw[:9].reshape(3, 3)
        t = raw[9:12]
        q = sciR.from_matrix(R).as_quat()  # xyzw (align_measurements.py:237)
        np.savetxt(f, np.concatenate([t, q]))


@contextlib.contextmanager
def _patched_dataset_path(dataset_dir: str | Path, reference_root: str):
    """Redirect every DatasetPath(...) in reference scripts to dataset_dir."""
    add_reference_paths(reference_root)
    import sunflower.utils.io as sio

    orig = sio.DatasetPath

    def redirected(_path, _orig=orig, _target=str(dataset_dir)):
        return _orig(_target)

    sio.DatasetPath = redirected
    try:
        yield
    finally:
        sio.DatasetPath = orig


def run_reference_align(dataset_dir: str | Path,
                        reference_root: str = DEFAULT_REFERENCE_ROOT) -> None:
    """Execute the reference scripts/align_measurements.py __main__ on
    dataset_dir (expects detection/ depth_val/ pose[t3q4]/ rgb/
    intrinsics.yaml bad.txt). Writes aligned/*.pkl into dataset_dir."""
    with _patched_dataset_path(dataset_dir, reference_root):
        argv = sys.argv
        sys.argv = ["align_measurements.py"]
        try:
            runpy.run_path(str(Path(reference_root) / "scripts" /
                               "align_measurements.py"), run_name="__main__")
        finally:
            sys.argv = argv


def run_reference_kalman(dataset_dir: str | Path,
                         reference_root: str = DEFAULT_REFERENCE_ROOT) -> None:
    """Execute the reference scripts/kalman_filter.py __main__ (tyro CLI,
    --path) on dataset_dir. Reads aligned/measurements.pkl, writes
    aligned/measurements_quat_filter.pkl."""
    with _patched_dataset_path(dataset_dir, reference_root):
        argv = sys.argv
        # DatasetPath is patched, but pass the real path anyway for clarity.
        sys.argv = ["kalman_filter.py", "--path", str(dataset_dir)]
        try:
            runpy.run_path(str(Path(reference_root) / "scripts" /
                               "kalman_filter.py"), run_name="__main__")
        finally:
            sys.argv = argv


def load_aligned_pickles(dataset_dir: str | Path) -> dict:
    out = {}
    aligned = Path(dataset_dir) / "aligned"
    for name in ["measurements", "average_poses", "measurements_quat_filter"]:
        p = aligned / f"{name}.pkl"
        if p.exists():
            with open(p, "rb") as f:
                out[name] = pickle.load(f)
    return out


def copy_dataset(src: str | Path, dst: str | Path) -> Path:
    """Copy a dataset dir (for running both sides without cross-talk)."""
    dst = Path(dst)
    if dst.exists():
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    return dst
