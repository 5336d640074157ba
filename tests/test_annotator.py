"""Annotator tests: edit semantics vs the reference's conventions + HTTP API."""

import json
import urllib.request

import numpy as np
import pytest

from scipy.spatial.transform import Rotation as sciR

from flope_tpu.annotator import AnnotatorState, serve


@pytest.fixture
def state(tmp_path):
    poses = np.tile(np.eye(4), (2, 1, 1))
    poses[1, :3, 3] = [0.1, 0.2, 0.3]
    f = tmp_path / "flower_poses.npy"
    np.save(f, poses)
    return AnnotatorState(f)


class TestEditSemantics:
    def test_rotate_is_local_right_multiply(self, state):
        """annotator.py:244-270: pose = pose @ R_delta."""
        before = state.poses[1].copy()
        state.apply({"kind": "rotate", "axis": "x", "sign": 1, "index": 1})
        want = before @ np.block([
            [sciR.from_euler("xyz", [10, 0, 0], degrees=True).as_matrix(),
             np.zeros((3, 1))],
            [np.zeros((1, 3)), np.ones((1, 1))]])
        np.testing.assert_allclose(state.poses[1], want, atol=1e-9)

    def test_translate_world_axis(self, state):
        state.apply({"kind": "translate", "axis": "z", "sign": -1, "index": 0})
        np.testing.assert_allclose(state.poses[0, 2, 3], -0.01)

    def test_step_sizes(self, state):
        state.apply({"kind": "step_trans", "sign": 1})
        assert state.delta_trans == pytest.approx(0.1)
        state.apply({"kind": "step_rot", "sign": -1})
        assert state.delta_rot == pytest.approx(1.0)

    def test_add_at_clicked_point(self, state):
        state.apply({"kind": "click", "point": [1.0, 2.0, 3.0]})
        state.apply({"kind": "add"})
        assert len(state.poses) == 3
        np.testing.assert_allclose(state.poses[2, :3, 3], [1, 2, 3])
        np.testing.assert_allclose(state.poses[2, :3, :3], np.eye(3))

    def test_delete_then_save_drops_masked(self, state, tmp_path):
        state.apply({"kind": "delete", "index": 0})
        out = state.apply({"kind": "save"})
        assert out["count"] == 1
        saved = np.load(state.poses_file)
        assert saved.shape == (1, 4, 4)
        np.testing.assert_allclose(saved[0, :3, 3], [0.1, 0.2, 0.3])


class TestHTTP:
    def test_roundtrip(self, state):
        httpd = serve(state, port=0, block=False)
        port = httpd.server_address[1]
        try:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
                assert b"Pose annotator" in r.read()
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/scene") as r:
                scene = json.loads(r.read())
                assert len(scene["poses"]) == 2
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/action",
                data=json.dumps({"kind": "translate", "axis": "x",
                                 "sign": 1, "index": 0}).encode(),
                method="POST")
            with urllib.request.urlopen(req) as r:
                out = json.loads(r.read())
                assert out["poses"][0][0][3] == pytest.approx(0.01)
        finally:
            httpd.shutdown()
