"""End-to-end offline 'capture' protocol on a synthetic scene.

Reproduces the reference's complete offline pipeline over a captured
dataset directory — the chain a user runs on real greenhouse recordings:

    write_dataset (rgb/ depth/ pose/ intrinsics gt_poses)   [the capture]
    -> test_posenet.py   (detect + per-frame rotations -> detection/)
    -> extract_depth.py  (masked depth -> depth_val/)
    -> align_measurements.py (Env3D fusion -> aligned/*.pkl)
    -> kalman_filter.py  (offline quat smoothing)
    -> plot_measurements.py (projected world poses -> vis_gt/)

then scores the fused world-frame table against gt_poses.npy: per-GT-flower
nearest-track translation error and yaw-nullified geodesic rotation error.
One documented run at 1080p/hard-domain = VERDICT r2 item 8.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import json
import pickle
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def run(script, *args):
    t0 = time.time()
    r = subprocess.run([sys.executable, str(REPO / "scripts" / script),
                        *map(str, args)], capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"{script} failed (rc={r.returncode})")
    print(f"  {script} ok ({time.time() - t0:.1f}s)")
    return r.stdout


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="capture dataset dir")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--flowers", type=int, default=8)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--domain", default="hard", choices=["flat", "hard"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--posenet-ckpt", default=None)
    ap.add_argument("--yolo-ckpt", default=None)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--max-det", type=int, default=16)
    ap.add_argument("--dist-th-mm", type=float, default=50.0)
    ap.add_argument("--score-th", type=float, default=10.0)
    ap.add_argument("--det-score-th", type=float, default=0.25,
                    help="detector score threshold for the test_posenet "
                         "stage (0.05 = hard-domain recall-optimal point)")
    ap.add_argument("--refine-boxes", action="store_true",
                    help="mask-tight detector boxes in the detection stage")
    ap.add_argument("--depth-fallback", action="store_true",
                    help="un-eroded depth fallback in the extract_depth "
                         "stage (PERF.md round 5)")
    ap.add_argument("--skip-generate", action="store_true",
                    help="reuse an existing capture dir")
    ap.add_argument("--generate-only", action="store_true",
                    help="write the capture dataset and exit (pre-stage the "
                         "capture while the accelerator is busy)")
    ap.add_argument("--cpu", action="store_true",
                    help="run the inference stage on CPU too")
    args = ap.parse_args(argv)

    out = Path(args.out)
    if not args.skip_generate:
        from flope_tpu.data.synthetic import DomainConfig, write_dataset
        print(f"generating {args.frames}-frame {args.width}x{args.height} "
              f"{args.domain} capture ...")
        t0 = time.time()
        write_dataset(out, n_frames=args.frames, n_flowers=args.flowers,
                      seed=args.seed, height=args.height, width=args.width,
                      max_det=args.max_det,
                      domain=DomainConfig.named(args.domain))
        print(f"  capture written ({time.time() - t0:.1f}s)")
    if args.generate_only:
        return

    det_args = []
    if args.yolo_ckpt:
        det_args = ["--detector", "yolo", "--yolo-ckpt", args.yolo_ckpt]
    else:
        det_args = ["--detector", "mask"]  # GT masks -> isolates fusion
    pn_args = (["--posenet-ckpt", args.posenet_ckpt]
               if args.posenet_ckpt else [])
    run("test_posenet.py", "--data-dir", out, "--crop", args.crop,
        "--max-det", args.max_det, "--score-th", args.det_score_th,
        *(["--refine-boxes"] if args.refine_boxes else []),
        *det_args, *pn_args,
        *(["--cpu"] if args.cpu else []))
    run("extract_depth.py", "--data-dir", out,
        *(["--depth-fallback"] if args.depth_fallback else []))
    run("align_measurements.py", "--data-dir", out,
        "--dist-th-mm", args.dist_th_mm, "--score-th", args.score_th)
    run("kalman_filter.py", "--data-dir", out)
    run("plot_measurements.py", "--data-dir", out)

    # ---- Score fused world tracks vs ground truth ----------------------
    with open(out / "aligned" / "average_poses.pkl", "rb") as f:
        avg = pickle.load(f)
    gt = np.load(out / "gt_poses.npy")
    keep = avg["score"] > args.score_th
    tr, qu, sc = avg["trans"][keep], avg["quat"][keep], avg["score"][keep]

    from scipy.spatial.transform import Rotation as sciR
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flope_tpu.geometry import nullify_yaw

    d = np.linalg.norm(gt[:, None, :3, 3] - tr[None], axis=-1)  # (G, T)
    nearest = d.argmin(axis=1) if len(tr) else None
    rows = []
    for g in range(gt.shape[0]):
        if nearest is None:
            rows.append({"gt": g, "found": False})
            continue
        t = nearest[g]
        terr_cm = 100.0 * d[g, t]
        Rgt = np.asarray(nullify_yaw(jnp.asarray(gt[g, :3, :3][None])))[0]
        Rtr = np.asarray(nullify_yaw(jnp.asarray(
            sciR.from_quat(qu[t]).as_matrix()[None])))[0]
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(Rgt.T @ Rtr) - 1) / 2, -1, 1)))
        rows.append({"gt": g, "found": bool(d[g, t] < 0.10),
                     "trans_err_cm": round(float(terr_cm), 3),
                     "rot_err_deg": round(float(ang), 3),
                     "track_score": float(sc[t])})
    found = [r for r in rows if r.get("found")]
    summary = {
        "frames": args.frames, "resolution": f"{args.width}x{args.height}",
        "domain": args.domain, "n_gt": gt.shape[0],
        "n_tracks_kept": int(keep.sum()),
        "gt_recovered": len(found),
        "trans_err_cm_mean": round(float(np.mean(
            [r["trans_err_cm"] for r in found])), 3) if found else None,
        "rot_err_deg_mean": round(float(np.mean(
            [r["rot_err_deg"] for r in found])), 3) if found else None,
        "per_flower": rows,
    }
    print(json.dumps(summary, indent=2))
    (out / "chain_summary.json").write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    sys.exit(main())
