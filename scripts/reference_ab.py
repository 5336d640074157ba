"""Reference-grounded fidelity A/B report (BASELINE.json parity contract).

Runs the SAME synthetic frames + SAME PoseNet weights through (a) the
reference's actual torch/cv2 pipeline at /root/reference
(pose_predictor.py:69-186, via flope_tpu.compat's dependency shims) and
(b) the fused JAX pipeline, then reports per-flower rotation/translation
deltas. Writes PARITY_AB.md at the repo root.

The reference crops at a hard-coded 512^2 (pose_predictor.py:145); the JAX
side is run at 512 (pure implementation drift) AND 256 (the TPU deployment
default), so the 256 substitution is graded against reference-grounded
evidence rather than self-referential numbers.

Usage:
    python scripts/reference_ab.py --weights ckpt_dir_or.pth --out PARITY_AB.md
    python scripts/reference_ab.py --random-init   # structural drift only
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", help="orbax ckpt dir or torch .pth "
                    "(512-crop-trained; used by the torch reference side and "
                    "the JAX side at crop 512)")
    ap.add_argument("--weights-256", default=None,
                    help="optional 256-crop-trained weights for the JAX side "
                    "at crop 256 (deployment-config row); defaults to "
                    "--weights")
    ap.add_argument("--random-init", action="store_true",
                    help="use a seeded random-init PoseNet (no checkpoint)")
    ap.add_argument("--student-ckpt", default=None,
                    help="distilled width-scaled student checkpoint; adds a "
                    "crop-512 student row (scripts/distill_posenet.py)")
    ap.add_argument("--student-width", type=float, default=0.5)
    ap.add_argument("--frames", type=int, default=8,
                    help="frames PER SCENE")
    ap.add_argument("--scenes", type=int, default=1,
                    help="independent scene seeds (seed..seed+N-1); results "
                    "aggregate match-count-weighted across scenes")
    ap.add_argument("--flowers", type=int, default=5)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--crop-sizes", default="512,256")
    ap.add_argument("--reference-root", default="/root/reference")
    ap.add_argument("--out", default=None, help="markdown report path")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # torch side is CPU; keep both local

    from flope_tpu.eval.reference_ab import (aggregate_ab, make_ab_frames,
                                             run_reference_ab)
    from flope_tpu.models import init_posenet
    from flope_tpu.utils.checkpoint import check_ckpt_meta, load_posenet_ckpt

    if args.weights:
        variables = load_posenet_ckpt(args.weights)
        check_ckpt_meta(args.weights, image_size=512)
        weights_desc = args.weights
    elif args.random_init:
        _, variables = init_posenet(jax.random.PRNGKey(args.seed), image_size=64)
        weights_desc = f"random-init (seed {args.seed})"
    else:
        ap.error("pass --weights or --random-init")

    variables_256 = (load_posenet_ckpt(args.weights_256)
                     if args.weights_256 else None)
    if args.weights_256:
        check_ckpt_meta(args.weights_256, image_size=256)
    student_vars = (load_posenet_ckpt(args.student_ckpt)
                    if args.student_ckpt else None)
    if args.student_ckpt:
        check_ckpt_meta(args.student_ckpt, image_size=512,
                        width_mult=args.student_width)

    # (label, crop, jax-side variables, width)
    configs = []
    for cs in [int(c) for c in args.crop_sizes.split(",")]:
        jax_vars = (variables_256 if cs == 256 and variables_256 is not None
                    else variables)
        configs.append((str(cs), cs, jax_vars, 1.0))
    if student_vars is not None:
        configs.append((f"512 student w{args.student_width}", 512,
                        student_vars, args.student_width))

    per_config = {label: [] for label, *_ in configs}
    for si in range(args.scenes):
        scene, frames = make_ab_frames(
            seed=args.seed + si, n_frames=args.frames,
            n_flowers=args.flowers, height=args.height, width=args.width)
        for label, cs, jax_vars, mw in configs:
            r = run_reference_ab(jax_vars, scene, frames, crop_size=cs,
                                 reference_root=args.reference_root,
                                 ref_variables=variables, model_width=mw,
                                 label=label)
            per_config[label].append(r)
            print(json.dumps({**r.__dict__, "scene_seed": args.seed + si}))

    results = [aggregate_ab(rs, label) for label, rs in per_config.items()]
    for r in results:
        print("AGG:", json.dumps(r.__dict__))

    if args.out:
        lines = [
            "# PARITY_AB — fused JAX pipeline vs the reference's real code",
            "",
            "Same inputs (synthetic frames), same PoseNet weights "
            f"({weights_desc}), through:",
            "- **reference**: `/root/reference` `pose_predictor.py:69-186` "
            "run unmodified (torch CPU + cv2 + scipy; GroundingDINO/SAM "
            "replaced by stubs injecting the known boxes/mask; PoseNet in "
            "eval mode — note the reference itself never calls `.eval()` at "
            "inference, `pose_predictor.py:51-52`, leaving dropout active; "
            "we disable it for a deterministic comparison).",
            "- **flope_tpu**: `pipeline.predict_frames` teacher config, one "
            "fused XLA graph.",
            "",
            f"Scenes: {args.scenes} (seeds {args.seed}..",
            f"{args.seed + args.scenes - 1}), {args.flowers} flowers x "
            f"{args.frames} frames each at "
            f"{args.width}x{args.height}. The reference "
            "crops at 512^2 (hard-coded); `crop` below is the JAX side's "
            "crop resolution — 512 isolates implementation drift, 256 adds "
            "the TPU default's resolution substitution"
            + (" (256 row uses resolution-matched weights "
               f"{args.weights_256}, so its GT columns compare deployment "
               "configs rather than feeding one model off-distribution "
               "inputs)" if args.weights_256 else "") + ".",
            "",
            "| config | matched | rot delta mean (deg) | rot delta max | "
            "trans delta mean (cm) | trans delta max | ref rot err vs GT | "
            "jax rot err vs GT |",
            "|---|---|---|---|---|---|---|---|",
        ]
        lines += [r.row() for r in results]
        lines += [
            "",
            "Contract: <2 deg mean rotation-error delta (BASELINE.json). ",
            f"Generated by `scripts/reference_ab.py`.",
        ]
        Path(args.out).write_text("\n".join(lines) + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
