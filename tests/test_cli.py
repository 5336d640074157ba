"""End-to-end CLI chain on a synthetic dataset (the reference's offline
pipeline protocol: test_posenet -> extract_depth -> align_measurements ->
kalman_filter -> plot_measurements), asserting world-frame recovery.

The chain runs ONCE as a module fixture so every test is order-independent
(safe under ``pytest -n`` and per-test invocation): tests assert over the
fixture's artifacts instead of consuming a previous test's side effects.
"""

import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def run(script, *args):
    # Generous bound: under `pytest -n 8` every worker compiles its own XLA
    # programs while device training may be hogging the host — observed >560 s
    # for the capture-chain subprocess under full contention.
    r = subprocess.run([sys.executable, str(REPO / "scripts" / script), *args],
                       capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_scene")
    from flope_tpu.data.synthetic import write_dataset
    write_dataset(out, n_frames=5, n_flowers=3, height=240, width=320, seed=2)
    return out


@pytest.fixture(scope="module")
def pipeline_outputs(dataset):
    """Run the full offline chain once; yields the dataset dir with
    detection/, depth_val/, aligned/, vis_gt/ populated."""
    d = str(dataset)
    run("test_posenet.py", "--data-dir", d, "--detector", "mask",
        "--crop", "64", "--max-det", "8", "--cpu")
    run("extract_depth.py", "--data-dir", d)
    run("align_measurements.py", "--data-dir", d, "--score-th", "2")
    run("kalman_filter.py", "--data-dir", d)
    run("plot_measurements.py", "--data-dir", d)
    return dataset


class TestOfflinePipelineChain:
    def test_full_chain_recovers_world_positions(self, pipeline_outputs):
        dataset = pipeline_outputs
        assert (dataset / "detection" / "frame_00000.txt").exists()
        assert (dataset / "depth_val" / "frame_00000.txt").exists()
        with open(dataset / "aligned" / "average_poses.pkl", "rb") as f:
            avg = pickle.load(f)
        gt = np.load(dataset / "gt_poses.npy")
        # Every fused flower should sit within ~5 mm of a GT world position.
        dmin = np.linalg.norm(avg["trans"][:, None] - gt[None, :, :3, 3],
                              axis=-1).min(axis=1)
        assert (dmin < 0.005).all(), dmin
        assert (dataset / "aligned" / "measurements_quat_filter.pkl").exists()
        assert (dataset / "vis_gt" / "frame_00000.png").exists()

    def test_vis_and_distribution_tools(self, pipeline_outputs):
        run("vis_gt_poses.py", "--data-dir", str(pipeline_outputs))
        out = run("get_flower_distribution.py", "--data-dir",
                  str(pipeline_outputs), "--min-observations", "2")
        assert "var[x]" in out


class TestCaptureChain:
    def test_capture_chain_runner(self, tmp_path):
        """scripts/capture_chain.py drives generate -> chain -> score and
        writes chain_summary.json with one row per GT flower."""
        import json
        out = tmp_path / "cap"
        run("capture_chain.py", "--out", str(out), "--frames", "3",
            "--flowers", "3", "--height", "240", "--width", "320",
            "--domain", "flat", "--cpu", "--crop", "64", "--max-det", "8",
            "--score-th", "1")
        summary = json.loads((out / "chain_summary.json").read_text())
        assert summary["n_gt"] == 3
        assert len(summary["per_flower"]) == 3
        # Translation comes from GT masks + depth: recovered flowers must sit
        # within the 10 cm found-threshold of their track.
        for row in summary["per_flower"]:
            if row.get("found"):
                assert row["trans_err_cm"] < 10.0
