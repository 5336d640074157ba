"""Train PoseNet (reference: scripts/train_posenet.py).

Defaults mirror the reference exactly (500 epochs, batch 64, Adadelta lr 1e-3,
seed 0, 80/20 sorted split, per-epoch checkpoints + log line). Data comes from
a reference-layout crops dir (--data-dir) or the synthetic factory
(--synthetic N).
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train on N synthetic crops instead of a dataset dir")
    ap.add_argument("--box-jitter", type=float, default=0.0,
                    help="synthetic crops: random center/scale jitter fraction "
                         "(emulates imperfect detector boxes)")
    ap.add_argument("--crop-occlusion", type=float, default=0.0,
                    help="probability a rendered GT crop gets partial leaf "
                         "occlusion (DomainConfig.crop_occlusion) — "
                         "occluded-appearance training with exact labels")
    ap.add_argument("--domain", default="flat", choices=["flat", "hard"],
                    help="synthetic crop rendering domain (hard = petal "
                         "flowers, foliage mask leak, lighting/noise/blur)")
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--optimizer", default="adadelta",
                    choices=["adadelta", "adamw"])
    ap.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine"],
                    help="constant = reference parity; cosine = 5%% warmup "
                         "then cosine decay (recommended for hard-domain)")
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--width", type=float, default=1.0,
                    help="backbone channel width multiplier (0.5 = the "
                         "512^2 distilled-student size)")
    ap.add_argument("--synthetic-cache", default=None,
                    help="npz path: render the --synthetic crops once and "
                         "reuse (rendering is host-CPU-bound; caching lets "
                         "device training start instantly)")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="EMA decay for Polyak weight averaging (0 = off, "
                         "reference parity; 0.999 recommended) — eval/best "
                         "snapshots use the EMA shadow")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt-dir", default="weights")
    ap.add_argument("--ckpt-every", type=int, default=0,
                    help="snapshot every N epochs (1 = reference parity, "
                         "0 = final + best only; snapshots are slow through "
                         "remote-attached TPUs)")
    ap.add_argument("--warm-start", default=None,
                    help="orbax ckpt dir or torch .pth to initialize from")
    ap.add_argument("--log", default="posenet_train.jsonl")
    ap.add_argument("--dp", type=int, default=1, help="data-parallel devices")
    ap.add_argument("--tp", type=int, default=1, help="model-parallel devices")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--render-only", action="store_true",
                    help="render + write --synthetic-cache, then exit "
                         "(pre-stage datasets while the accelerator is busy)")
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu or args.render_only)

    from flope_tpu.data.posenet_dataset import load_crop_dataset, synthetic_crops
    from flope_tpu.parallel import make_mesh
    from flope_tpu.train import TrainConfig, train_posenet

    from flope_tpu.data.synthetic import DomainConfig
    domain = DomainConfig.named(args.domain)
    if args.crop_occlusion > 0:
        import dataclasses
        domain = dataclasses.replace(domain,
                                     crop_occlusion=args.crop_occlusion)
    if args.synthetic and not args.data_dir:
        import numpy as np

        def render():
            tr = synthetic_crops(args.synthetic, args.image_size, args.seed,
                                 box_jitter=args.box_jitter, domain=domain)
            ev = synthetic_crops(max(args.synthetic // 5, 4), args.image_size,
                                 args.seed + 1, box_jitter=args.box_jitter,
                                 domain=domain)
            return tr, ev

        if args.synthetic_cache:
            import os
            if os.path.exists(args.synthetic_cache):
                z = np.load(args.synthetic_cache)
                train = {k[3:]: z[k] for k in z if k.startswith("tr_")}
                evald = {k[3:]: z[k] for k in z if k.startswith("ev_")}
                got = train["images"].shape
                want = (args.synthetic, args.image_size, args.image_size, 3)
                if got != want:
                    raise ValueError(
                        f"--synthetic-cache {args.synthetic_cache} holds "
                        f"{got}, but --synthetic/--image-size ask for "
                        f"{want}; delete the cache or fix the flags")
                print(f"loaded {got[0]}+{evald['images'].shape[0]} crops "
                      f"from {args.synthetic_cache}")
            else:
                train, evald = render()
                np.savez(args.synthetic_cache,
                         **{f"tr_{k}": v for k, v in train.items()},
                         **{f"ev_{k}": v for k, v in evald.items()})
                print(f"rendered + cached to {args.synthetic_cache}")
            if args.render_only:
                return 0
        else:
            train, evald = render()
    else:
        assert args.data_dir, "need --data-dir or --synthetic N"
        train = load_crop_dataset(args.data_dir, test=False)
        evald = load_crop_dataset(args.data_dir, test=True)
        if args.synthetic:
            # Mix in synthetic crops (e.g. 1:1 with a small matched set).
            import numpy as np
            syn = synthetic_crops(args.synthetic, args.image_size, args.seed,
                                  box_jitter=args.box_jitter, domain=domain)
            train = {k: np.concatenate([train[k], syn[k]])
                     for k in ("images", "rotations", "translations",
                               "intrinsics")}

    mesh = None
    if args.dp * args.tp > 1:
        mesh = make_mesh({"data": args.dp, "model": args.tp})

    cfg = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                      lr=args.lr, seed=args.seed, optimizer=args.optimizer,
                      lr_schedule=args.lr_schedule,
                      image_size=args.image_size, width_mult=args.width,
                      ckpt_dir=args.ckpt_dir,
                      ckpt_every=args.ckpt_every, log_path=args.log,
                      ema_decay=args.ema)
    init_variables = None
    if args.warm_start:
        from flope_tpu.utils.checkpoint import load_posenet_ckpt
        init_variables = load_posenet_ckpt(args.warm_start)
    train_posenet(cfg, train, evald, mesh=mesh, init_variables=init_variables)


if __name__ == "__main__":
    sys.exit(main())
