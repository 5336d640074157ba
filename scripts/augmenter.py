"""Offline image augmentation folder tool (reference: scripts/agumenter.py —
typo preserved there, fixed here): random homography rotation + photometric
jitter applied to every image in a folder."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--copies", type=int, default=3)
    ap.add_argument("--tilt", type=float, default=10.0)
    ap.add_argument("--inplane", type=float, default=180.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from flope_tpu.geometry.homography import rotation_homography, warp_perspective

    rng = np.random.default_rng(args.seed)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = [f for f in sorted(Path(args.in_dir).iterdir())
             if f.suffix.lower() in {".png", ".jpg", ".jpeg"}]
    for f in files:
        img = np.asarray(Image.open(f), np.float32)[..., :3]
        h, w = img.shape[:2]
        K = jnp.asarray([[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1.0]],
                        jnp.float32)
        for c in range(args.copies):
            ang = jnp.asarray([rng.uniform(-args.tilt, args.tilt),
                               rng.uniform(-args.tilt, args.tilt),
                               rng.uniform(-args.inplane, args.inplane)],
                              jnp.float32)
            H, _ = rotation_homography(K, ang)
            warped = np.asarray(warp_perspective(jnp.asarray(img), H))
            gain = rng.uniform(0.7, 1.3)
            bias = rng.uniform(-20, 20)
            aug = np.clip(warped * gain + bias, 0, 255).astype(np.uint8)
            Image.fromarray(aug).save(out / f"{f.stem}_aug{c}{f.suffix}")
    print(f"wrote {len(files) * args.copies} augmented images to {out}")


if __name__ == "__main__":
    sys.exit(main())
