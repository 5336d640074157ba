"""Rotation-interpolation study (reference: scripts/rotation_interp.py):
compare slerp vs linear-9D + Procrustes projection between two random
rotations — the experiment that justified the 9-D rotation representation."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=11)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from flope_tpu.geometry import (rotation_geodesic_deg, rotmat_to_quat,
                                    quat_to_rotmat, slerp, special_procrustes)

    rng = np.random.default_rng(args.seed)
    from scipy.spatial.transform import Rotation as sciR
    r1, r2 = sciR.random(2, random_state=args.seed).as_matrix()
    q1 = rotmat_to_quat(jnp.asarray(r1))
    q2 = rotmat_to_quat(jnp.asarray(r2))
    ts = np.linspace(0, 1, args.steps)

    print(f"{'t':>5} {'slerp_deg':>10} {'procrustes_deg':>15} {'delta':>8}")
    for t in ts:
        R_slerp = quat_to_rotmat(slerp(q1, q2, float(t)))
        lin = (1 - t) * r1.reshape(-1) + t * r2.reshape(-1)
        R_proc = special_procrustes(jnp.asarray(lin).reshape(1, 3, 3))[0]
        a_slerp = float(rotation_geodesic_deg(jnp.asarray(r1), R_slerp))
        a_proc = float(rotation_geodesic_deg(jnp.asarray(r1), R_proc))
        print(f"{t:5.2f} {a_slerp:10.3f} {a_proc:15.3f} {a_proc - a_slerp:8.3f}")


if __name__ == "__main__":
    sys.exit(main())
