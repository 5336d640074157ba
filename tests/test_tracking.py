"""Tracking tests vs numpy oracles transliterating the reference algorithms.

The KF oracle runs the FULL 7x7 matrix recursion (filterpy semantics with
F=H=I, P0=I, Q=qI, R=rI) to prove the scalar-gain closed form is exact.
The tracker/average oracles transliterate flower_model.py:146-215 and
align_measurements.py:30-135 including their quirks (first-seen association,
last-write-wins duplicate matches, all-spawn-on-no-match frames).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from scipy.spatial.transform import Rotation as sciR, Slerp

from flope_tpu.tracking import (
    kf_update,
    init_tracks,
    tracker_step,
    track_sequence,
    init_average_state,
    average_step,
    average_sequence,
    smooth_quaternions,
)

Q, R_NOISE = 0.001, 0.1


# ------------------------------ oracles -------------------------------------

class FullMatrixKF:
    """filterpy-equivalent full 7x7 KF with the reference's parameters."""

    def __init__(self, x0):
        self.x = np.asarray(x0, float).copy()
        self.P = np.eye(7)
        self.F = np.eye(7)
        self.H = np.eye(7)
        self.Q = np.eye(7) * Q
        self.R = np.eye(7) * R_NOISE

    def predict(self):
        self.P = self.F @ self.P @ self.F.T + self.Q

    def update(self, z):
        S = self.H @ self.P @ self.H.T + self.R
        K = self.P @ self.H.T @ np.linalg.inv(S)
        self.x = self.x + K @ (np.asarray(z) - self.H @ self.x)
        self.P = (np.eye(7) - K @ self.H) @ self.P


class RefTracker:
    """flower_model.py assign_meas_to_state transliteration."""

    def __init__(self, th=0.05):
        self.state = None  # first-seen values, grows by vstack
        self.scores = None
        self.kfs = []
        self.th = th

    def step(self, meas):
        if self.state is None:
            if len(meas) == 0:
                return
            self.state = meas.copy()
            self.scores = np.ones(len(meas))
            for m in meas:
                self.kfs.append(FullMatrixKF(m))
            return
        if len(meas) == 0:
            return
        d = np.linalg.norm(meas[:, None, :3] - self.state[None, :, :3], axis=-1)
        min_idx = np.argmin(d, axis=1)
        min_val = np.min(d, axis=1)
        good = min_val < self.th
        for i in range(len(meas)):
            if good[i]:
                j = min_idx[i]
                self.kfs[j].predict()
                self.kfs[j].update(meas[i])
                self.kfs[j].x[3:] /= np.linalg.norm(self.kfs[j].x[3:])
                self.scores[j] += 1
            else:
                self.state = np.vstack([self.state, meas[i][None]])
                self.scores = np.hstack([self.scores, [1.0]])
                self.kfs.append(FullMatrixKF(meas[i]))


class RefEnv3D:
    """align_measurements.py Env3D transliteration."""

    def __init__(self, th=0.05):
        self.trans = None
        self.quat = None
        self.score = None
        self.th = th

    def step(self, tvec, qvec):
        if self.trans is None:
            self.trans, self.quat = tvec.copy(), qvec.copy()
            self.score = np.ones(len(tvec))
            return
        d = np.linalg.norm(tvec[:, None] - self.trans[None], axis=-1)
        min_idx = np.argmin(d, axis=1)
        min_val = np.min(d, axis=1)
        good = min_val < self.th
        idx_good = min_idx[good]
        if idx_good.shape[0] == 0:
            self.trans = np.vstack([self.trans, tvec])
            self.quat = np.vstack([self.quat, qvec])
            self.score = np.concatenate([self.score, np.ones(len(tvec))])
            return
        tg, qg = tvec[good], qvec[good]
        s = self.score[idx_good]
        ws, wm = s / (s + 1), 1 / (s + 1)
        self.trans[idx_good] = self.trans[idx_good] * ws[:, None] + tg * wm[:, None]
        new_q = []
        for qs, qm, w1, w2 in zip(self.quat[idx_good], qg, ws, wm):
            sl = Slerp([0, 1], sciR.concatenate(
                [sciR.from_quat(qs), sciR.from_quat(qm)]))
            new_q.append(sl([w2 / (w1 + w2)]).as_quat()[0])
        self.quat[idx_good] = np.array(new_q)
        self.score[idx_good] += 1
        bad = ~good
        self.trans = np.vstack([self.trans, tvec[bad]])
        self.quat = np.vstack([self.quat, qvec[bad]])
        self.score = np.concatenate([self.score, np.ones(bad.sum())])


def random_meas(rng, n, centers=None):
    if centers is None:
        centers = rng.uniform(-0.5, 0.5, size=(n, 3))
    q = sciR.random(n, random_state=np.random.RandomState(
        int(rng.integers(1 << 30)))).as_quat()
    return np.hstack([centers, q])


# ------------------------------- tests --------------------------------------

class TestScalarKF:
    def test_matches_full_matrix_filterpy(self, rng):
        x0 = random_meas(rng, 1)[0]
        oracle = FullMatrixKF(x0)
        x, p = jnp.asarray(x0), jnp.asarray(1.0)
        for _ in range(20):
            z = x0 + rng.normal(0, 0.05, size=7)
            oracle.predict()
            oracle.update(z)
            oracle.x[3:] /= np.linalg.norm(oracle.x[3:])
            x, p = kf_update(x, p, jnp.asarray(z))
            np.testing.assert_allclose(np.asarray(x), oracle.x, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(float(p), oracle.P[0, 0], rtol=1e-6)
            assert np.allclose(oracle.P, oracle.P[0, 0] * np.eye(7), atol=1e-12)


class TestTracker:
    def _run_both(self, rng, frames, th=0.05, max_tracks=32):
        ref = RefTracker(th)
        state = init_tracks(max_tracks)
        for meas, valid in frames:
            ref.step(meas[valid])
            state = tracker_step(state, jnp.asarray(meas), jnp.asarray(valid), th)
        return ref, state

    def test_matches_reference_semantics(self, rng):
        centers = rng.uniform(-0.5, 0.5, size=(4, 3))
        frames = []
        for _ in range(6):
            jitter = rng.normal(0, 0.005, size=(4, 3))
            meas = np.zeros((8, 7))
            meas[:4] = random_meas(rng, 4, centers + jitter)
            valid = np.array([True] * 4 + [False] * 4)
            frames.append((meas, valid))
        ref, state = self._run_both(rng, frames)
        alive = np.asarray(state.alive)
        assert alive.sum() == len(ref.kfs)
        got_x = np.asarray(state.x)[alive]
        want_x = np.array([kf.x for kf in ref.kfs])
        # Slot order == creation order == reference list order.
        np.testing.assert_allclose(got_x, want_x, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(state.score)[alive],
                                   ref.scores, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(state.first_trans)[alive],
                                   ref.state[:, :3], rtol=1e-5, atol=1e-6)

    def test_new_tracks_spawn(self, rng):
        m1 = np.zeros((4, 7)); m1[0] = random_meas(rng, 1, np.array([[0., 0, 1]]))
        m2 = np.zeros((4, 7)); m2[0] = random_meas(rng, 1, np.array([[1., 1, 1]]))
        v = np.array([True, False, False, False])
        state = init_tracks(8)
        state = tracker_step(state, jnp.asarray(m1), jnp.asarray(v), 0.05)
        state = tracker_step(state, jnp.asarray(m2), jnp.asarray(v), 0.05)
        assert int(np.asarray(state.alive).sum()) == 2

    def test_two_meas_same_track_sequential(self, rng):
        """Both measurements near one track must update it twice, in order."""
        base = random_meas(rng, 1, np.array([[0.0, 0, 1]]))[0]
        m1 = np.zeros((4, 7)); m1[0] = base
        v1 = np.array([True, False, False, False])
        state = init_tracks(8)
        state = tracker_step(state, jnp.asarray(m1), jnp.asarray(v1), 0.05)
        z1 = base + np.r_[0.01, 0, 0, np.zeros(4)]
        z2 = base + np.r_[-0.01, 0, 0, np.zeros(4)]
        m2 = np.zeros((4, 7)); m2[0], m2[1] = z1, z2
        v2 = np.array([True, True, False, False])
        state = tracker_step(state, jnp.asarray(m2), jnp.asarray(v2), 0.05)
        ref = RefTracker(0.05)
        ref.step(base[None])
        ref.step(np.stack([z1, z2]))
        assert len(ref.kfs) == 1
        np.testing.assert_allclose(np.asarray(state.x)[0], ref.kfs[0].x,
                                   rtol=1e-5, atol=1e-6)
        assert float(state.score[0]) == ref.scores[0] == 3.0

    def test_scan_equals_stepwise(self, rng):
        f, d = 5, 6
        meas = rng.normal(0, 0.3, size=(f, d, 7))
        valid = rng.random((f, d)) > 0.3
        final = track_sequence(jnp.asarray(meas), jnp.asarray(valid), 0.05, 16)
        state = init_tracks(16)
        for i in range(f):
            state = tracker_step(state, jnp.asarray(meas[i]), jnp.asarray(valid[i]), 0.05)
        np.testing.assert_allclose(np.asarray(final.x), np.asarray(state.x), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(final.alive), np.asarray(state.alive))

    def test_capacity_overflow_counted(self, rng):
        meas = rng.normal(0, 5.0, size=(1, 8, 7))  # all far apart
        valid = np.ones((1, 8), bool)
        final = track_sequence(jnp.asarray(meas), jnp.asarray(valid), 0.05, 4)
        assert int(final.dropped) == 4
        assert int(np.asarray(final.alive).sum()) == 4


class TestRunningAverage:
    def test_matches_env3d_oracle(self, rng):
        centers = rng.uniform(-0.4, 0.4, size=(3, 3))
        ref = RefEnv3D(0.05)
        state = init_average_state(16)
        for _ in range(5):
            jitter = rng.normal(0, 0.004, size=(3, 3))
            m = random_meas(rng, 3, centers + jitter)
            tv = np.zeros((6, 3)); qv = np.zeros((6, 4)); qv[:, 3] = 1
            tv[:3], qv[:3] = m[:, :3], m[:, 3:]
            valid = np.array([True] * 3 + [False] * 3)
            ref.step(m[:, :3], m[:, 3:])
            state = average_step(state, jnp.asarray(tv), jnp.asarray(qv),
                                 jnp.asarray(valid), 0.05)
        alive = np.asarray(state.alive)
        assert alive.sum() == len(ref.score)
        np.testing.assert_allclose(np.asarray(state.trans)[alive], ref.trans,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(state.score)[alive], ref.score)
        got_q = np.asarray(state.quat)[alive]
        d = np.minimum(np.abs(got_q - ref.quat).max(-1),
                       np.abs(got_q + ref.quat).max(-1))
        np.testing.assert_array_less(d, 1e-4)

    def test_no_match_frame_spawns_all(self, rng):
        """align_measurements.py:76-80: zero matches -> everything spawns."""
        m1 = random_meas(rng, 2, np.array([[0., 0, 1], [1., 0, 1]]))
        m2 = random_meas(rng, 2, np.array([[5., 0, 1], [6., 0, 1]]))
        state = init_average_state(16)
        for m in [m1, m2]:
            state = average_step(state, jnp.asarray(m[:, :3]), jnp.asarray(m[:, 3:]),
                                 jnp.ones(2, bool), 0.05)
        assert int(np.asarray(state.alive).sum()) == 4

    def test_duplicate_match_last_wins(self, rng):
        """Two meas matching one state: numpy fancy assignment keeps the last."""
        base_t = np.array([[0.0, 0, 1]])
        m0 = random_meas(rng, 1, base_t)
        z1 = random_meas(rng, 1, base_t + [[0.01, 0, 0]])
        z2 = random_meas(rng, 1, base_t + [[-0.01, 0, 0]])
        ref = RefEnv3D(0.05)
        ref.step(m0[:, :3], m0[:, 3:])
        both = np.vstack([z1, z2])
        ref.step(both[:, :3], both[:, 3:])
        state = init_average_state(8)
        state = average_step(state, jnp.asarray(m0[:, :3]), jnp.asarray(m0[:, 3:]),
                             jnp.ones(1, bool), 0.05)
        state = average_step(state, jnp.asarray(both[:, :3]), jnp.asarray(both[:, 3:]),
                             jnp.ones(2, bool), 0.05)
        alive = np.asarray(state.alive)
        assert alive.sum() == len(ref.score) == 1
        np.testing.assert_allclose(np.asarray(state.trans)[alive], ref.trans,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.score)[alive], ref.score)

    def test_sequence_scan(self, rng):
        f, d = 4, 5
        tv = rng.normal(0, 0.3, size=(f, d, 3))
        qv = sciR.random(f * d, random_state=1).as_quat().reshape(f, d, 4)
        valid = np.ones((f, d), bool)
        final = average_sequence(jnp.asarray(tv), jnp.asarray(qv),
                                 jnp.asarray(valid), 0.05, 32)
        assert np.isfinite(np.asarray(final.trans)).all()


class TestOfflineSmoothing:
    def _oracle(self, trans, quat):
        """kalman_filter.py:100-140 transliteration."""
        f, n, _ = trans.shape
        kfs = [None] * n
        ftrans = np.zeros_like(trans)
        fquat = np.zeros_like(quat)
        for i in range(f):
            for j in range(n):
                t, q = trans[i, j], quat[i, j]
                z = np.hstack([t, q])
                if np.sum(np.abs(t)) == 0:
                    continue
                if kfs[j] is None:
                    kfs[j] = FullMatrixKF(z)
                else:
                    kfs[j].predict()
                    kfs[j].update(z)
                kfs[j].x[3:] /= np.linalg.norm(kfs[j].x[3:])
                ftrans[i, j] = t
                fquat[i, j] = kfs[j].x[3:]
        return ftrans, fquat

    def test_matches_reference(self, rng):
        f, n = 8, 3
        trans = rng.normal(0.5, 0.2, size=(f, n, 3))
        quat = sciR.random(f * n, random_state=2).as_quat().reshape(f, n, 4)
        # Simulate missing detections (zero translation rows).
        miss = rng.random((f, n)) < 0.3
        trans[miss] = 0.0
        quat[miss] = [0, 0, 0, 1]
        got_t, got_q = (np.asarray(x) for x in smooth_quaternions(
            jnp.asarray(trans), jnp.asarray(quat)))
        want_t, want_q = self._oracle(trans, quat)
        np.testing.assert_allclose(got_t, want_t, atol=1e-6)
        np.testing.assert_allclose(got_q, want_q, rtol=1e-4, atol=1e-5)


class TestLiveStatePlot:
    def test_headless_writes_png(self, rng, tmp_path):
        """The live view (reference flower_model.py:47-143) must refresh its
        output image every frame in headless mode and survive empty tables."""
        from flope_tpu.tracking import LiveStatePlot, init_tracks, tracker_step

        out = tmp_path / "live.png"
        live = LiveStatePlot(out_png=out, interactive=False)
        state = init_tracks(8)
        live.update(state)  # no tracks yet
        m = np.array([[0.1, 0.2, 0.3, 0, 0, 0, 1.0],
                      [0.5, 0.5, 0.5, 0, 0, 0, 1.0]])
        v = np.array([True, True])
        for _ in range(3):
            state = tracker_step(state, jnp.asarray(m), jnp.asarray(v), 0.05)
            live.update(state)
        live.close()
        assert out.exists() and out.stat().st_size > 0
        assert len(live.history) == 4
