"""A/B the offline fusion stages against the reference's ACTUAL code.

The reference's scripts/align_measurements.py (Env3D running average) and
scripts/kalman_filter.py (per-flower 7-D KF) execute unmodified via
compat.fusion_ab on a synthetic dataset; our CLIs run on an identical copy.
The resulting pickles must agree: translations and scores near-exactly
(f32 vs f64), quaternions within a small angular tolerance (slerp
implementation drift).
"""

import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def run_ours(script, *args):
    r = subprocess.run([sys.executable, str(REPO / "scripts" / script), *args],
                       capture_output=True, text=True)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def quat_angle_deg(qa, qb):
    """Geodesic angle between quaternion arrays, sign-agnostic."""
    dots = np.abs(np.sum(qa * qb, axis=-1)
                  / np.maximum(np.linalg.norm(qa, axis=-1)
                               * np.linalg.norm(qb, axis=-1), 1e-12))
    return np.degrees(2 * np.arccos(np.clip(dots, -1.0, 1.0)))


@pytest.fixture(scope="module")
def ab_outputs(tmp_path_factory):
    from flope_tpu.compat.fusion_ab import (copy_dataset,
                                            load_aligned_pickles,
                                            prepare_reference_pose_format,
                                            run_reference_align,
                                            run_reference_kalman)
    from flope_tpu.data.synthetic import write_dataset

    root = tmp_path_factory.mktemp("fusion_ab")
    src = write_dataset(root / "src", n_frames=12, n_flowers=5, seed=3,
                        with_detections=True)
    # Perturb detections (rotation/uv/depth noise) so repeated observations
    # of a flower DIFFER: the slerp averaging and KF smoothing paths are
    # genuinely exercised instead of trivially returning their inputs.
    from scipy.spatial.transform import Rotation as sciR
    rng = np.random.default_rng(7)
    for f in sorted((src / "detection").glob("*.txt")):
        det = np.loadtxt(f)
        if det.size == 0:
            continue
        if det.ndim == 1:
            det = det[None]
        n = det.shape[0]
        det[:, 4:6] += rng.normal(0, 1.5, (n, 2))
        R = det[:, 6:15].reshape(n, 3, 3)
        dR = sciR.from_rotvec(rng.normal(0, np.radians(3), (n, 3))).as_matrix()
        det[:, 6:15] = np.einsum("nij,njk->nik", dR, R).reshape(n, 9)
        np.savetxt(f, det, fmt="%.7f")
    for f in sorted((src / "depth_val").glob("*.txt")):
        dv = np.loadtxt(f)
        if dv.size == 0:
            continue
        dv[0] += rng.normal(0, 0.003, dv[0].shape)
        np.savetxt(f, dv)
    prepare_reference_pose_format(src)
    ref_ds = copy_dataset(src, root / "ref")
    ours_ds = copy_dataset(src, root / "ours")

    run_reference_align(ref_ds)
    run_reference_kalman(ref_ds)

    run_ours("align_measurements.py", "--data-dir", str(ours_ds),
             "--pose-format", "t3q4", "--score-th", "2",
             "--log-compat", "reference")
    run_ours("kalman_filter.py", "--data-dir", str(ours_ds))

    return load_aligned_pickles(ref_ds), load_aligned_pickles(ours_ds)


class TestAlignAB:
    def test_average_poses_match(self, ab_outputs):
        ref, ours = ab_outputs
        r, o = ref["average_poses"], ours["average_poses"]
        assert r["trans"].shape == o["trans"].shape, \
            f"track counts differ: ref {r['trans'].shape} vs {o['trans'].shape}"
        np.testing.assert_array_equal(r["score"], o["score"])
        np.testing.assert_allclose(r["trans"], o["trans"], atol=1e-5)
        ang = quat_angle_deg(r["quat"], o["quat"])
        assert ang.max() < 0.05, f"max quat delta {ang.max():.4f} deg"

    def test_measurement_log_matches(self, ab_outputs):
        ref, ours = ab_outputs
        r, o = ref["measurements"], ours["measurements"]
        assert r["trans"].shape == o["trans"].shape
        np.testing.assert_allclose(r["trans"], o["trans"], atol=1e-5)
        # Padded rows are [0,0,0,1] on both sides; compare the real ones.
        real = np.abs(r["trans"]).sum(-1) > 0
        ang = quat_angle_deg(r["quat"][real], o["quat"][real])
        assert ang.max() < 0.05, f"max logged-quat delta {ang.max():.4f} deg"

    def test_scores_accumulate(self, ab_outputs):
        ref, _ = ab_outputs
        # Sanity: the 12-frame orbit revisits flowers -> scores > 1.
        assert ref["average_poses"]["score"].max() > 3


class TestKalmanAB:
    def test_filtered_quats_match(self, ab_outputs):
        ref, ours = ab_outputs
        r = ref["measurements_quat_filter"]
        o = ours["measurements_quat_filter"]
        assert r["quat"].shape == o["quat"].shape
        # Translations pass through raw on both sides (kalman_filter.py:132).
        np.testing.assert_allclose(r["trans"], o["trans"], atol=1e-5)
        real = np.abs(r["trans"]).sum(-1) > 0
        ang = quat_angle_deg(r["quat"][real], o["quat"][real])
        assert ang.max() < 0.1, f"max filtered-quat delta {ang.max():.4f} deg"

    def test_reference_kf_actually_filters(self, ab_outputs):
        ref, _ = ab_outputs
        m = ref["measurements"]
        f = ref["measurements_quat_filter"]
        real = np.abs(m["trans"]).sum(-1) > 0
        # The KF must CHANGE later quats (filtering), not copy them.
        assert not np.allclose(m["quat"][real], f["quat"][real])
