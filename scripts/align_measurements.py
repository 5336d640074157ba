"""Multi-view measurement alignment (reference: scripts/align_measurements.py).

Reads detection/ + depth_val/ + pose/ per frame, lifts detections to world
frame, fuses them with the score-weighted running-average tracker (Env3D
semantics) running as a jitted step, and writes aligned/measurements.pkl +
aligned/average_poses.pkl in the reference's pickle format.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import pickle
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--dist-th-mm", type=float, default=50.0)
    ap.add_argument("--score-th", type=float, default=100.0)
    ap.add_argument("--max-tracks", type=int, default=256)
    ap.add_argument("--max-det", type=int, default=32)
    ap.add_argument("--pose-format", choices=["r9t3", "t3q4"], default="r9t3",
                    help="camera pose txt layout (reference has both; "
                    "align_measurements.py:216 reads t3+quat)")
    ap.add_argument("--log-compat", choices=["fixed", "reference"],
                    default="fixed",
                    help="measurements.pkl logging semantics. 'reference' is "
                    "bit-faithful including the reference's aliasing bug: "
                    "the first frame's log entry IS the state array "
                    "(align_measurements.py:55-59 appends without copy) and "
                    "later in-place updates (:92-99) mutate it, until any "
                    "spawn reallocates the state via vstack; 'fixed' freezes "
                    "every frame's entry at write time")
    ap.add_argument("--tpu", action="store_true", help="run on the TPU backend (default: CPU — these are host-bound offline stages)")
    args = ap.parse_args(argv)

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from flope_tpu.geometry import (pose_cam_to_world, pose_matrix,
                                    points3d_from_ray_depth, quat_to_rotmat,
                                    rotmat_to_quat)
    from flope_tpu.tracking import average_step, init_average_state
    from flope_tpu.utils.io import (DatasetPaths, load_pose,
                                    read_intrinsics_yaml, pth)

    data = DatasetPaths(args.data_dir)
    data.aligned.mkdir(exist_ok=True, parents=True)
    (data.dataset / "points_3d").mkdir(exist_ok=True, parents=True)
    K, _, _ = read_intrinsics_yaml(data.intrin)
    Kj = jnp.asarray(K, jnp.float32)

    to_quat = rotmat_to_quat  # xyzw, like the reference's plain rotmat2qvec
    dist_th = args.dist_th_mm / 1000.0
    state = init_average_state(args.max_tracks)

    # Host-side f64 shadow of the running-average state, used for the
    # reference-format measurement log (and, in --log-compat reference, for
    # the pickles themselves so parity with the reference's f64 numpy is
    # exact). Log entries are TRACK-ALIGNED rows — zeros except the
    # measurement that updated track j this frame — with reproduced quirks:
    # (a) a frame where nothing matches logs its raw measurement list
    #     (align_measurements.py:74-77),
    # (b) measurements spawned during a matched frame are not logged at all
    #     (new_trans is sized pre-spawn, :95-99),
    # (c) in 'reference' mode, the first frame's entry aliases the state and
    #     keeps mutating with it until the first spawn reallocation.
    def slerp_host(q1, q2, t):
        from scipy.spatial.transform import Rotation as sciR, Slerp
        out = np.empty_like(q1)
        for i in range(q1.shape[0]):
            sl = Slerp([0, 1], sciR.from_quat(np.stack([q1[i], q2[i]])))
            out[i] = sl([t[i]]).as_quat()[0]
        return out

    sh_trans = sh_quat = sh_score = None
    all_trans, all_quat = [], []

    for name in data.files:
        det_p = pth(data.det, name, "txt")
        dv_p = pth(data.depth_val, name, "txt")
        det = np.loadtxt(det_p) if det_p.exists() else np.array([])
        dinfo = np.loadtxt(dv_p) if dv_p.exists() else np.array([])
        if det.size == 0 or dinfo.size == 0:
            np.savetxt(pth(data.dataset / "points_3d", name, "txt"), np.array([]))
            continue
        if det.ndim == 1:
            det = det[None]
        if dinfo.ndim == 1:
            dinfo = dinfo[:, None] if dinfo.shape[0] == 2 else dinfo[None].T
        depth_val, reliable = dinfo[0], dinfo[1] > 0.5

        if args.pose_format == "r9t3":
            cam = load_pose(pth(data.pose, name, "txt"))
        else:
            raw = np.loadtxt(pth(data.pose, name, "txt"))
            cam = np.asarray(pose_matrix(quat_to_rotmat(jnp.asarray(raw[3:])),
                                         jnp.asarray(raw[:3])))

        uv = det[:, 4:6]
        rot = det[:, 6:15].reshape(-1, 3, 3)
        uv, rot, depth_val = uv[reliable], rot[reliable], depth_val[reliable]
        if uv.shape[0] == 0:
            np.savetxt(pth(data.dataset / "points_3d", name, "txt"), np.array([]))
            continue

        xyz = points3d_from_ray_depth(jnp.asarray(uv), jnp.asarray(depth_val), Kj)
        pose_cam = pose_matrix(jnp.asarray(rot), xyz)
        pose_w = np.asarray(pose_cam_to_world(pose_cam, jnp.asarray(cam)))
        tvec = pose_w[:, :3, 3]
        qvec = np.asarray(to_quat(jnp.asarray(pose_w[:, :3, :3])))
        np.savetxt(pth(data.dataset / "points_3d", name, "txt"), tvec)

        # Shadow update + reference-format log entry (slot indices == the
        # reference's growing-list indices, since spawns fill free slots in
        # order and tracks never die).
        tvec64, qvec64 = tvec.astype(np.float64), qvec.astype(np.float64)
        if sh_trans is None:
            sh_trans, sh_quat = tvec64.copy(), qvec64.copy()
            sh_score = np.ones(tvec64.shape[0])
            if args.log_compat == "reference":
                # quirk (c): the log entry IS the state array.
                all_trans.append(sh_trans)
                all_quat.append(sh_quat)
            else:
                all_trans.append(sh_trans.copy())
                all_quat.append(sh_quat.copy())
        else:
            dmat = np.linalg.norm(tvec64[:, None] - sh_trans[None, :], axis=-1)
            min_idx = dmat.argmin(axis=1)
            good = dmat.min(axis=1) < dist_th
            if not good.any():
                all_trans.append(tvec64.copy())     # quirk (a)
                all_quat.append(qvec64.copy())
                sh_trans = np.vstack([sh_trans, tvec64])   # reallocation:
                sh_quat = np.vstack([sh_quat, qvec64])     # alias freezes
                sh_score = np.concatenate([sh_score, np.ones(len(tvec64))])
            else:
                idx = min_idx[good]
                n0 = sh_trans.shape[0]
                nt = np.zeros((n0, 3))
                nq = np.zeros((n0, 4)); nq[:, -1] = 1.0
                nt[idx] = tvec64[good]              # last-wins fancy assign
                nq[idx] = qvec64[good]
                all_trans.append(nt)
                all_quat.append(nq)
                # Score-weighted in-place update (mutates the aliased first
                # entry while alias_live, like the reference's :92-99).
                w1 = sh_score[idx] / (sh_score[idx] + 1.0)
                w2 = 1.0 / (sh_score[idx] + 1.0)
                sh_trans[idx] = sh_trans[idx] * w1[:, None] \
                    + tvec64[good] * w2[:, None]
                sh_quat[idx] = slerp_host(sh_quat[idx], qvec64[good], w2)
                sh_score[idx] += 1.0
                # UNCONDITIONAL vstack like the reference (:100-104): even a
                # zero-row spawn reallocates the state, so the frame-0 alias
                # freezes after exactly one subsequent matched frame.
                spawn = ~good
                sh_trans = np.vstack([sh_trans, tvec64[spawn]])
                sh_quat = np.vstack([sh_quat, qvec64[spawn]])
                sh_score = np.concatenate([sh_score,
                                           np.ones(int(spawn.sum()))])
        # (No explicit alias bookkeeping needed: in 'reference' mode the
        # first log entry IS sh_trans/sh_quat; in-place fancy assignment
        # mutates it, and any vstack rebinds sh_* to new arrays, freezing
        # the logged object — precisely the reference's aliasing behavior.)

        n = tvec.shape[0]
        tv = np.zeros((args.max_det, 3))
        qv = np.zeros((args.max_det, 4)); qv[:, 3] = 1
        vd = np.zeros(args.max_det, bool)
        tv[:n], qv[:n], vd[:n] = tvec[:args.max_det], qvec[:args.max_det], True
        state = average_step(state, jnp.asarray(tv), jnp.asarray(qv),
                             jnp.asarray(vd), dist_th)

    alive = np.asarray(state.alive)
    trans = np.asarray(state.trans)[alive]
    quat = np.asarray(state.quat)[alive]
    score = np.asarray(state.score)[alive]
    if sh_trans is not None:
        # Cross-check the jitted f32 tracker against the f64 shadow; in
        # reference mode the shadow IS the published result (exact parity
        # with the reference's f64 numpy).
        if trans.shape == sh_trans.shape and not np.allclose(
                trans, sh_trans, atol=1e-4):
            print("warning: jitted tracker and f64 shadow diverged "
                  f"(max {np.abs(trans - sh_trans).max():.2e})", file=sys.stderr)
        if args.log_compat == "reference":
            trans, quat, score = sh_trans, sh_quat, sh_score

    # Rectangular (F, N_last, .) arrays padded to the LAST frame's track
    # count (align_measurements.py:135-157; growth is monotone so last=max).
    max_n = all_trans[-1].shape[0] if all_trans else 0
    F = len(all_trans)
    mt = np.zeros((F, max_n, 3))
    mq = np.zeros((F, max_n, 4)); mq[..., 3] = 1
    for i, (t, q) in enumerate(zip(all_trans, all_quat)):
        k = min(t.shape[0], max_n)
        mt[i, :k] = t[:k]
        mq[i, :k] = q[:k]
    with open(data.aligned / "measurements.pkl", "wb") as f:
        pickle.dump({"trans": mt, "quat": mq}, f)
    with open(data.aligned / "average_poses.pkl", "wb") as f:
        pickle.dump({"trans": trans, "quat": quat, "score": score}, f)
    kept = score > args.score_th
    print(f"unique flowers: {trans.shape[0]}; above score_th: {int(kept.sum())}; "
          f"dropped(meas): {int(state.dropped)}")


if __name__ == "__main__":
    sys.exit(main())
