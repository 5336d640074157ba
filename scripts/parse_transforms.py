"""Nerfstudio transforms.json -> per-frame pose txt (reference:
scripts/parse_transforms.py): OpenGL camera-to-world -> OpenCV, flat R9+t3."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import json
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--transforms", required=True, help="transforms.json")
    ap.add_argument("--out-dir", required=True)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from flope_tpu.geometry import opengl_to_opencv_c2w
    from flope_tpu.utils.io import save_pose

    with open(args.transforms) as f:
        data = json.load(f)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for frame in data["frames"]:
        T = np.array(frame["transform_matrix"], float)
        T_cv = np.asarray(opengl_to_opencv_c2w(jnp.asarray(T)))
        name = Path(frame["file_path"]).stem
        save_pose(out / f"{name}.txt", T_cv)
    print(f"wrote {len(data['frames'])} poses to {out}")


if __name__ == "__main__":
    sys.exit(main())
