"""YOLO-seg distillation dataset prep (reference: scripts/prepare_yolo_data.py
+ prepare_yolo_seg_dataset.py + yolo_data_sanity.py, in one tool).

Sources: --teacher (GDINO+SAM adapter, needs local HF weights), --mask-dir
(precomputed masks, e.g. synthetic), or --synthetic N (generates frames from
the synthetic scene factory). Writes images/{split}, masks/{split},
labels/{split} (YOLO-seg polygons) + dataset yaml, then sanity-checks.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic frames")
    ap.add_argument("--scenes", type=int, default=1,
                    help="spread the N synthetic frames over this many "
                         "independently sampled scenes (flower count varies "
                         "per scene) — single-scene data overfits the layout")
    ap.add_argument("--data-dir", default=None,
                    help="reference-layout dataset with rgb/ + mask/")
    ap.add_argument("--val-frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--domain", default="flat", choices=["flat", "hard"],
                    help="synthetic rendering-domain preset (hard = foliage "
                         "clutter, occluders, lighting/noise/blur)")
    args = ap.parse_args(argv)

    from PIL import Image

    from flope_tpu.data.synthetic import (DomainConfig, SyntheticScene,
                                          orbit_camera, render_frame)
    from flope_tpu.data.yolo_labels import (dataset_sanity_check,
                                            write_yolo_dataset_yaml,
                                            write_yolo_seg_labels)
    from flope_tpu.pipeline.precomputed import boxes_from_mask

    out = Path(args.out)
    for split in ["train", "val"]:
        for sub in ["images", "masks", "labels"]:
            (out / sub / split).mkdir(parents=True, exist_ok=True)

    samples = []  # (name, rgb, mask, boxes)
    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        n_scenes = max(args.scenes, 1)
        base, extra = divmod(args.synthetic, n_scenes)
        i = 0
        for s in range(n_scenes):
            # First `extra` scenes take one more frame so exactly
            # --synthetic samples are produced.
            per_scene = max(base + (1 if s < extra else 0), 1)
            scene = SyntheticScene.random(
                rng, n_flowers=int(rng.integers(3, 10)),
                height=args.height, width=args.width,
                domain=DomainConfig.named(args.domain))
            for j in range(per_scene):
                if i >= args.synthetic:
                    break
                ang = 2 * np.pi * j / per_scene + rng.uniform(0, 0.3)
                fr = render_frame(scene, orbit_camera(scene, ang), max_det=16)
                boxes = fr.boxes[fr.valid]
                samples.append((f"syn_{i:05d}", fr.rgb, fr.mask, boxes))
                i += 1
    else:
        assert args.data_dir, "need --synthetic N or --data-dir"
        from flope_tpu.utils.io import DatasetPaths, pth
        data = DatasetPaths(args.data_dir)
        for name in data.files:
            rgb = np.asarray(Image.open(pth(data.rgb, name, "png")))[..., :3]
            mask = np.asarray(Image.open(pth(data.mask, name, "png")))
            if mask.ndim == 3:
                mask = mask[..., 0]
            boxes, valid = boxes_from_mask(mask)
            samples.append((name, rgb, mask, boxes[valid]))

    n_val = max(int(len(samples) * args.val_frac), 1)
    # Shuffle before splitting so val isn't a single scene's frames.
    order = np.random.default_rng(args.seed + 1).permutation(len(samples))
    samples = [samples[k] for k in order]
    for i, (name, rgb, mask, boxes) in enumerate(samples):
        split = "val" if i < n_val else "train"
        Image.fromarray(rgb).save(out / "images" / split / f"{name}.png")
        Image.fromarray(mask).save(out / "masks" / split / f"{name}.png")
        n = write_yolo_seg_labels(out / "labels" / split / f"{name}.txt",
                                  mask, boxes)
        if n == 0:
            print(f"warning: {name} produced 0 polygons")

    write_yolo_dataset_yaml(out / "flower_seg_yolo.yaml", out)
    bad = dataset_sanity_check(out / "images" / "..", delete=False)
    print(f"wrote {len(samples)} samples ({n_val} val) to {out}; "
          f"sanity issues: {len(bad)}")


if __name__ == "__main__":
    sys.exit(main())
