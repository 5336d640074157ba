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

    state = init_average_state(args.max_tracks)
    all_trans, all_quat = [], []

    for name in data.files:
        det_p = pth(data.det, name, "txt")
        dv_p = pth(data.depth_val, name, "txt")
        det = np.loadtxt(det_p) if det_p.exists() else np.array([])
        dinfo = np.loadtxt(dv_p) if dv_p.exists() else np.array([])
        if det.size == 0 or dinfo.size == 0:
            np.savetxt(pth(data.dataset / "points_3d", name, "txt"), np.array([]))
            all_trans.append(np.zeros((0, 3)))
            all_quat.append(np.zeros((0, 4)))
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
            all_trans.append(np.zeros((0, 3)))
            all_quat.append(np.zeros((0, 4)))
            continue

        xyz = points3d_from_ray_depth(jnp.asarray(uv), jnp.asarray(depth_val), Kj)
        pose_cam = pose_matrix(jnp.asarray(rot), xyz)
        pose_w = np.asarray(pose_cam_to_world(pose_cam, jnp.asarray(cam)))
        tvec = pose_w[:, :3, 3]
        qvec = np.asarray(rotmat_to_quat(jnp.asarray(pose_w[:, :3, :3])))
        np.savetxt(pth(data.dataset / "points_3d", name, "txt"), tvec)

        n = tvec.shape[0]
        tv = np.zeros((args.max_det, 3))
        qv = np.zeros((args.max_det, 4)); qv[:, 3] = 1
        vd = np.zeros(args.max_det, bool)
        tv[:n], qv[:n], vd[:n] = tvec[:args.max_det], qvec[:args.max_det], True
        state = average_step(state, jnp.asarray(tv), jnp.asarray(qv),
                             jnp.asarray(vd), args.dist_th_mm / 1000.0)
        all_trans.append(tvec)
        all_quat.append(qvec)

    alive = np.asarray(state.alive)
    trans = np.asarray(state.trans)[alive]
    quat = np.asarray(state.quat)[alive]
    score = np.asarray(state.score)[alive]

    # Rectangular per-frame measurement arrays (align_measurements.py:135-157).
    max_n = max((t.shape[0] for t in all_trans), default=0)
    F = len(all_trans)
    mt = np.zeros((F, max_n, 3))
    mq = np.zeros((F, max_n, 4)); mq[..., 3] = 1
    for i, (t, q) in enumerate(zip(all_trans, all_quat)):
        mt[i, :t.shape[0]] = t
        mq[i, :q.shape[0]] = q
    with open(data.aligned / "measurements.pkl", "wb") as f:
        pickle.dump({"trans": mt, "quat": mq}, f)
    with open(data.aligned / "average_poses.pkl", "wb") as f:
        pickle.dump({"trans": trans, "quat": quat, "score": score}, f)
    kept = score > args.score_th
    print(f"unique flowers: {trans.shape[0]}; above score_th: {int(kept.sum())}; "
          f"dropped(meas): {int(state.dropped)}")


if __name__ == "__main__":
    sys.exit(main())
