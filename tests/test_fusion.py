"""Global multi-camera track fusion (tracking/fusion.py) on the 8-device
virtual mesh: the fused (shard_map + all_gather) table must be bit-equal to
single-device sequential fusion over the stream-major measurement list —
the determinism contract of flower_model.py:146-215 generalized to a rig.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as sciR

from flope_tpu.parallel import make_mesh, shard_batch
from flope_tpu.tracking import (fuse_stream_predictions, fused_track_sequence,
                                fused_tracker_step, init_tracks,
                                track_sequence, tracker_step,
                                world_measurements)

S, D = 8, 4  # streams x detections


def rig_measurements(seed=0, frames=1):
    """(F, S, D, 7) world measurements of 5 shared flowers seen from S
    cameras with noise, plus some invalid slots."""
    rng = np.random.default_rng(seed)
    flowers = rng.uniform(-0.3, 0.3, size=(5, 3))
    qs = sciR.random(5, random_state=np.random.RandomState(seed)).as_quat()
    meas = np.zeros((frames, S, D, 7), np.float32)
    valid = np.zeros((frames, S, D), bool)
    for f in range(frames):
        for s in range(S):
            vis = rng.permutation(5)[: rng.integers(1, D + 1)]
            for k, fi in enumerate(vis[:D]):
                meas[f, s, k, :3] = flowers[fi] + rng.normal(0, 0.004, 3)
                meas[f, s, k, 3:] = qs[fi]
                valid[f, s, k] = True
    return jnp.asarray(meas), jnp.asarray(valid)


@pytest.fixture(scope="module")
def smesh():
    assert len(jax.devices()) >= S
    return make_mesh({"stream": S})


def sequential_reference(state, meas, valid):
    """Single-device ground truth: streams consumed one by one in order,
    exactly like the reference's frame loop over S consecutive frames."""
    for s in range(meas.shape[0]):
        state = tracker_step(state, meas[s], valid[s])
    return state


class TestFusedStep:
    def test_equals_single_device_sequential(self, smesh):
        meas, valid = rig_measurements(seed=1)
        state = init_tracks(32)
        want = sequential_reference(state, meas[0], valid[0])
        m, v = shard_batch(smesh, (meas[0], valid[0]))
        got = fused_tracker_step(state, m, v, smesh)
        for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_multi_step_chaining(self, smesh):
        meas, valid = rig_measurements(seed=2, frames=3)
        ref = init_tracks(32)
        fused = init_tracks(32)
        for f in range(3):
            ref = sequential_reference(ref, meas[f], valid[f])
            m, v = shard_batch(smesh, (meas[f], valid[f]))
            fused = fused_tracker_step(fused, m, v, smesh)
        np.testing.assert_array_equal(np.asarray(ref.x), np.asarray(fused.x))
        np.testing.assert_array_equal(np.asarray(ref.score),
                                      np.asarray(fused.score))
        assert int(fused.score.sum()) > 0

    def test_tracks_merge_across_streams(self, smesh):
        # The same flower seen by all 8 cameras must land in ONE track with
        # score 8, not 8 tracks.
        meas = np.zeros((S, D, 7), np.float32)
        valid = np.zeros((S, D), bool)
        meas[:, 0, :3] = [0.1, 0.2, 0.3]
        meas[:, 0, 6] = 1.0
        valid[:, 0] = True
        m, v = shard_batch(smesh, (jnp.asarray(meas), jnp.asarray(valid)))
        out = fused_tracker_step(init_tracks(16), m, v, smesh)
        assert int(out.alive.sum()) == 1
        assert float(out.score.max()) == S


class TestFusedSequence:
    def test_equals_sequential_over_time_and_streams(self, smesh):
        meas, valid = rig_measurements(seed=3, frames=5)
        want = track_sequence(meas.reshape(5 * S, D, 7),
                              valid.reshape(5 * S, D), max_tracks=32)
        # time axis replicated, stream axis sharded
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(smesh, P(None, "stream"))
        m = jax.device_put(meas, sh)
        v = jax.device_put(valid, sh)
        got = fused_track_sequence(m, v, smesh, max_tracks=32)
        for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPipelineFacing:
    def test_fuse_stream_predictions(self, smesh):
        # Camera-frame poses of one shared world flower from S different
        # cameras -> one world track at the right position.
        rng = np.random.default_rng(4)
        t_world = np.array([0.05, -0.1, 0.02])
        R_world = sciR.random(1, random_state=np.random.RandomState(4)
                              ).as_matrix()[0]
        poses_cam = np.tile(np.eye(4, dtype=np.float32), (S, D, 1, 1))
        valid = np.zeros((S, D), bool)
        cam_poses = np.zeros((S, 4, 4), np.float32)
        for s in range(S):
            ang = 2 * np.pi * s / S
            c2w = np.eye(4)
            c2w[:3, :3] = sciR.from_euler("z", ang).as_matrix()
            c2w[:3, 3] = rng.uniform(-0.5, 0.5, 3)
            cam_poses[s] = c2w
            w2c = np.linalg.inv(c2w)
            pose_w = np.eye(4)
            pose_w[:3, :3] = R_world
            pose_w[:3, 3] = t_world
            poses_cam[s, 0] = (w2c @ pose_w).astype(np.float32)
            valid[s, 0] = True
        pc, v, cp = shard_batch(smesh, (jnp.asarray(poses_cam),
                                        jnp.asarray(valid),
                                        jnp.asarray(cam_poses)))
        out = fuse_stream_predictions(init_tracks(16), pc, v, cp, smesh)
        assert int(out.alive.sum()) == 1
        got_t = np.asarray(out.x[out.alive.argmax(), :3])
        np.testing.assert_allclose(got_t, t_world, atol=1e-4)

    def test_world_measurements_matches_reference_construction(self):
        # Against the plain cam->world + quat path on one device.
        rng = np.random.default_rng(5)
        poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        poses[:, :3, :3] = sciR.random(
            3, random_state=np.random.RandomState(5)).as_matrix()
        poses[:, :3, 3] = rng.uniform(-1, 1, (3, 3))
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = sciR.from_euler("xyz", [10, 20, 30], degrees=True
                                      ).as_matrix()
        c2w[:3, 3] = [1.0, 2.0, 3.0]
        m = np.asarray(world_measurements(jnp.asarray(poses), jnp.asarray(c2w)))
        for i in range(3):
            world = c2w @ poses[i]
            np.testing.assert_allclose(m[i, :3], world[:3, 3], rtol=1e-5)
            q = sciR.from_matrix(world[:3, :3].astype(np.float64)).as_quat()
            # quaternion double cover
            assert (np.allclose(m[i, 3:], q, atol=1e-5)
                    or np.allclose(m[i, 3:], -q, atol=1e-5))
