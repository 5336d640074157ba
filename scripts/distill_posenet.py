"""Distill the 512^2 PoseNet teacher into a cheaper student backbone.

The reference's signature move is distillation (slow GroundingDINO+SAM
teacher -> fast YOLO student, scripts/prepare_yolo_data.py); this applies
the same move to the pose branch: the full-width ResNet-18 teacher at the
512^2 parity resolution is the measured throughput ceiling (its forward
alone is ~5.0k crops/s — PERF.md), so a width-scaled student (default 0.5:
~1/4 the conv FLOPs) is trained ON THE TEACHER'S OUTPUTS to clear 5k
through the full graph while staying within the <2 deg A/B budget
(verify with scripts/reference_ab.py --student-ckpt ...).

Targets are the teacher's yaw-nullified SO(3) projections — exactly what
the pipeline emits (pose_predictor.py:156-161) — so the student optimizes
agreement with the deployed teacher, not just the synthetic GT.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--teacher-ckpt", default=None,
                    help="512-trained full-width PoseNet (orbax dir or .pth); "
                         "required unless --render-only")
    ap.add_argument("--width", type=float, default=0.5,
                    help="student backbone width multiplier")
    ap.add_argument("--crops", type=int, default=3072)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine"])
    ap.add_argument("--box-jitter", type=float, default=0.06)
    ap.add_argument("--domain", default="flat", choices=["flat", "hard"])
    ap.add_argument("--render-cache", default=None,
                    help="npz path caching the RAW rendered crops (teacher "
                         "labels are always computed fresh from "
                         "--teacher-ckpt; rendering is host-CPU-bound)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt-dir", default="weights/posenet512_student")
    ap.add_argument("--log", default="posenet_distill.jsonl")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--render-only", action="store_true",
                    help="render + write --render-cache, then exit (no "
                         "teacher labeling; pre-stage while the chip is busy)")
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu or args.render_only)
    import jax
    import jax.numpy as jnp

    from flope_tpu.data.posenet_dataset import synthetic_crops
    from flope_tpu.data.synthetic import DomainConfig
    from flope_tpu.models import PoseNet
    from flope_tpu.train import TrainConfig, train_posenet
    from flope_tpu.utils.checkpoint import load_posenet_ckpt

    domain = DomainConfig.named(args.domain)
    if args.render_only:
        import os
        assert args.render_cache, "--render-only needs --render-cache"
        if os.path.exists(args.render_cache):
            print(f"{args.render_cache} already exists")
            return 0
        rendered = {}
        for tag, split_seed, n in (("tr", args.seed, args.crops),
                                   ("ev", args.seed + 1,
                                    max(args.crops // 5, 4))):
            rendered[tag] = synthetic_crops(
                n, args.image_size, split_seed,
                box_jitter=args.box_jitter, domain=domain)
        np.savez(args.render_cache,
                 **{f"{t}_{k}": v for t, d in rendered.items()
                    for k, v in d.items()})
        print(f"cached rendered crops to {args.render_cache}")
        return 0
    assert args.teacher_ckpt, "--teacher-ckpt required (unless --render-only)"
    teacher_vars = load_posenet_ckpt(args.teacher_ckpt)
    teacher = PoseNet(dtype=jnp.bfloat16)

    @jax.jit
    def teacher_rotmats(images):
        r9 = teacher.apply(teacher_vars, images, train=False)
        return PoseNet.to_rotmats(r9, yaw_nullify=True)

    import os
    rendered = {}
    if args.render_cache and os.path.exists(args.render_cache):
        z = np.load(args.render_cache)
        for tag in ("tr", "ev"):
            rendered[tag] = {k[3:]: z[k] for k in z if k.startswith(tag + "_")}
        print(f"loaded rendered crops from {args.render_cache}")

    def render(split_seed, n, tag):
        if tag in rendered and rendered[tag]["images"].shape[0] == n:
            return dict(rendered[tag])
        data = synthetic_crops(n, args.image_size, split_seed,
                               box_jitter=args.box_jitter, domain=domain)
        rendered[tag] = dict(data)
        return data

    def relabel(split_seed, n):
        data = render(split_seed, n, "tr" if split_seed == args.seed else "ev")
        outs = []
        bs = 64
        for i in range(0, n, bs):
            outs.append(np.asarray(
                teacher_rotmats(jnp.asarray(data["images"][i:i + bs]))))
        data["rotations"] = np.concatenate(outs).astype(np.float32)
        return data

    print(f"rendering + teacher-labeling {args.crops} crops "
          f"at {args.image_size}^2 ...")
    train = relabel(args.seed, args.crops)
    evald = relabel(args.seed + 1, max(args.crops // 5, 4))
    if args.render_cache and not os.path.exists(args.render_cache):
        np.savez(args.render_cache,
                 **{f"tr_{k}": v for k, v in rendered["tr"].items()},
                 **{f"ev_{k}": v for k, v in rendered["ev"].items()})
        print(f"cached rendered crops to {args.render_cache}")

    cfg = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                      lr=args.lr, seed=args.seed, optimizer="adamw",
                      lr_schedule=args.lr_schedule,
                      image_size=args.image_size, width_mult=args.width,
                      ckpt_dir=args.ckpt_dir, log_path=args.log)
    train_posenet(cfg, train, evald)


if __name__ == "__main__":
    sys.exit(main())
