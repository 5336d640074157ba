"""Pipeline stage: per-detection masked depth -> depth_val/*.txt.

Reference: scripts/extract_depth.py:50-57 — for each frame, read detections
and mask, pool depth per box, write a (2, N) array [values_m; reliable_flags].
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--depth-scale", type=float, default=1e-3,
                    help="sensor units -> meters (1e-3 for mm pngs)")
    ap.add_argument("--near", type=float, default=0.1)
    ap.add_argument("--far", type=float, default=3.0)
    ap.add_argument("--depth-fallback", action="store_true",
                    help="un-eroded masked-mean fallback for boxes whose "
                         "eroded mask misses min_pixels (PipelineConfig."
                         "depth_fallback semantics; PERF.md round 5)")
    ap.add_argument("--tpu", action="store_true", help="run on the TPU backend (default: CPU — these are host-bound offline stages)")
    args = ap.parse_args(argv)

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from flope_tpu.ops import masked_depth_value
    from flope_tpu.utils.io import DatasetPaths, pth

    data = DatasetPaths(args.data_dir)
    data.depth_val.mkdir(exist_ok=True, parents=True)

    for name in data.files:
        det_path = pth(data.det, name, "txt")
        det = np.loadtxt(det_path) if det_path.exists() else np.array([])
        if det.size == 0:
            np.savetxt(pth(data.depth_val, name, "txt"), np.array([]))
            continue
        if det.ndim == 1:
            det = det[None]
        boxes = det[:, :4].astype(np.int32)
        npy = pth(data.depth, name, "npy")
        if npy.exists():
            depth_m = np.load(npy).astype(np.float32)
        else:
            depth_m = np.asarray(Image.open(pth(data.depth, name, "png")),
                                 np.float32) * args.depth_scale
        mask = np.asarray(Image.open(pth(data.mask, name, "png")))
        if mask.ndim == 3:
            mask = mask[..., 0]
        vals, rel = masked_depth_value(
            jnp.asarray(boxes), jnp.asarray(depth_m), jnp.asarray(mask),
            near_plane=args.near, far_plane=args.far,
            fallback=args.depth_fallback)
        out = np.stack([np.asarray(vals), np.asarray(rel).astype(np.float64)])
        np.savetxt(pth(data.depth_val, name, "txt"), out)
        print(f"{name}: {out.shape[1]} depths, {int(out[1].sum())} reliable")


if __name__ == "__main__":
    sys.exit(main())
