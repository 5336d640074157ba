"""Offline KF quaternion smoothing (reference: scripts/kalman_filter.py).

Reads aligned/measurements.pkl, runs one 7-D identity-dynamics Kalman filter
per flower over frames as a single lax.scan, keeps RAW translations and
FILTERED quaternions (the reference's deliberate choice,
kalman_filter.py:132-134), writes aligned/measurements_quat_filter.pkl.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import pickle
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--tpu", action="store_true", help="run on the TPU backend (default: CPU — these are host-bound offline stages)")
    args = ap.parse_args(argv)

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from flope_tpu.tracking import smooth_quaternions
    from flope_tpu.utils.io import DatasetPaths

    data = DatasetPaths(args.data_dir)
    with open(data.aligned / "measurements.pkl", "rb") as f:
        meas = pickle.load(f)
    trans, quat = meas["trans"], meas["quat"]
    print(f"{trans.shape[1]} unique flowers over {trans.shape[0]} frames")
    ftrans, fquat = (np.asarray(x) for x in smooth_quaternions(
        jnp.asarray(trans), jnp.asarray(quat)))
    out = data.aligned / "measurements_quat_filter.pkl"
    with open(out, "wb") as f:
        pickle.dump({"trans": ftrans, "quat": fquat}, f)
    print(f"filtered measurements written to {out}")


if __name__ == "__main__":
    sys.exit(main())
