"""Train the YOLO11-seg flower detector (reference: scripts/train_yolo_seg.py,
which delegated to ultralytics; here: flope_tpu.train.yolo_train natively)."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True,
                    help="YOLO-seg dataset root (from prepare_yolo_data.py)")
    ap.add_argument("--image-size", type=int, default=640)
    ap.add_argument("--scale", default="n", choices=["n", "s", "m", "l"])
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine"],
                    help="cosine = 5%% warmup then decay to 1%% of peak; "
                         "constant 1e-3 AdamW was observed to blow up to "
                         "NaN at epoch 148/150 after converging")
    ap.add_argument("--ckpt-dir", default="weights_yolo")
    ap.add_argument("--ckpt-every", type=int, default=0,
                    help="snapshot every N epochs (0 = final + best-loss "
                         "only; per-epoch snapshots are slow through "
                         "remote-attached TPUs)")
    ap.add_argument("--warm-start", default=None,
                    help="orbax ckpt (or training --ckpt-dir) to initialize "
                         "from; image-size independent (anchor-free head)")
    ap.add_argument("--log", default="yolo_train.jsonl")
    ap.add_argument("--no-seg", action="store_true",
                    help="train the detector only (mask-loss weight 0) — the "
                         "bbox-only flavor of the reference's "
                         "scripts/train_yolo.py:3-5")
    ap.add_argument("--augment", action="store_true",
                    help="in-graph flip + photometric augmentation "
                         "(flope_tpu.train.yolo_train.augment_batch)")
    ap.add_argument("--max-skips", type=int, default=100,
                    help="abort (restoring the best finite snapshot) after "
                         "this many CONSECUTIVE optimizer-skipped steps")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=args.cpu)
    import jax
    import jax.numpy as jnp
    import optax

    from flope_tpu.data.yolo_labels import load_yolo_seg_dataset
    from flope_tpu.models.yolo import init_yolo
    from flope_tpu.train.yolo_train import YoloTrainConfig, make_yolo_train_step
    from flope_tpu.utils.checkpoint import (load_ckpt, save_ckpt,
                                            write_ckpt_meta)
    from flope_tpu.utils.logging import JsonlLogger

    data = load_yolo_seg_dataset(args.data, "train", args.image_size)
    print(f"train samples: {data['images'].shape[0]}")
    cfg = YoloTrainConfig(image_size=args.image_size, scale=args.scale,
                          lr=args.lr,
                          w_seg=0.0 if args.no_seg else 1.0)
    model, variables = init_yolo(jax.random.PRNGKey(0), args.image_size,
                                 args.scale)
    if args.warm_start:
        tree = load_ckpt(args.warm_start)
        variables = {"params": tree["params"],
                     "batch_stats": tree["batch_stats"]}
        print(f"warm-started from {args.warm_start}")
    if args.lr_schedule == "cosine":
        n_tr = data["images"].shape[0]
        steps_per_epoch = max(n_tr // min(args.batch_size, n_tr), 1)
        total = args.epochs * steps_per_epoch
        lr = optax.warmup_cosine_decay_schedule(
            init_value=args.lr * 0.01, peak_value=args.lr,
            warmup_steps=max(total // 20, 1), decay_steps=total,
            end_value=args.lr * 0.01)
    else:
        lr = args.lr
    from flope_tpu.train.yolo_train import make_yolo_optimizer
    tx = make_yolo_optimizer(lr, cfg)
    step = make_yolo_train_step(model, tx, cfg, augment=args.augment)
    aug_rng = jax.random.PRNGKey(args.epochs * 7919 + 1)
    params, stats = variables["params"], variables["batch_stats"]
    opt = tx.init(params)
    logger = JsonlLogger(args.log, echo=True)

    # Device-resident dataset (uint8 images), batches gathered on device —
    # per-step host uploads through remote-attached TPUs dominate otherwise.
    dev = {
        "images": jax.device_put((data["images"] * 255).astype(np.uint8)),
        "boxes": jax.device_put(jnp.asarray(data["boxes"], jnp.float32)),
        "valid": jax.device_put(jnp.asarray(data["valid"])),
        "masks": jax.device_put((data["masks"] > 0.5).astype(np.uint8)),
    }
    # Dataset arrays are ARGUMENTS, not closure constants: closed-over device
    # arrays serialize into the HLO as literals, and the remote-compile relay
    # rejects multi-hundred-MB requests (HTTP 413).
    gather = jax.jit(lambda d, idx: (
        jnp.take(d["images"], idx, 0).astype(jnp.float32) / 255.0,
        jnp.take(d["boxes"], idx, 0),
        jnp.take(d["valid"], idx, 0),
        jnp.take(d["masks"], idx, 0).astype(jnp.float32)))

    write_ckpt_meta(args.ckpt_dir, image_size=args.image_size,
                    scale=args.scale)
    rng = np.random.default_rng(0)
    n = data["images"].shape[0]
    bs = min(args.batch_size, n)
    best = {"loss": float("inf"), "vars": None}
    for epoch in range(args.epochs):
        t0 = time.time()
        idx = rng.permutation(n)
        metrics = []
        for s in range(0, n - bs + 1, bs):
            imgs, boxes, valid, masks = gather(dev, jnp.asarray(idx[s:s + bs]))
            if args.augment:
                aug_rng, k = jax.random.split(aug_rng)
                params, stats, opt, m = step(params, stats, opt, imgs, boxes,
                                             valid, masks, k)
            else:
                params, stats, opt, m = step(params, stats, opt, imgs, boxes,
                                             valid, masks)
            metrics.append(m)
        # Non-finite steps are SKIPPED by the optimizer (make_yolo_optimizer:
        # apply_if_finite + batch-stats gating), so params stay finite;
        # aggregate over the finite steps.  `skipped` is the step's own
        # skip predicate (covers finite-loss/NaN-grad steps that a
        # total-based count would miss); `nf_count` is the optimizer's
        # consecutive-skip counter, which carries ACROSS epochs.
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN slices
            mean = {k: float(np.nanmean([float(m[k]) for m in metrics]))
                    for k in metrics[0] if k != "nf_count"}
        skipped = int(sum(float(m["skipped"]) for m in metrics))
        max_nf = max(int(m["nf_count"]) for m in metrics)
        logger.log({"epoch": epoch, **mean, "skipped_steps": skipped,
                    "consec_skips": max_nf,
                    "sec": round(time.time() - t0, 2)})
        if max_nf >= args.max_skips:
            print(f"{max_nf} consecutive skipped steps at epoch {epoch}; "
                  f"aborting (best finite total {best['loss']:.4f})")
            break
        if args.ckpt_every > 0 and epoch % args.ckpt_every == 0:
            save_ckpt(f"{args.ckpt_dir}/yolo_e{epoch}",
                      {"params": params, "batch_stats": stats})
        # Best-snapshot eligibility: only epochs with NO skipped steps — a
        # mostly-skipped epoch's mean over the few surviving batches is not
        # comparable, and the end-of-epoch params aren't what produced it.
        if skipped == 0 and mean["total"] < best["loss"]:
            # Device-resident copy (the step does not donate, but copying
            # keeps the snapshot independent of later updates).
            best = {"loss": mean["total"],
                    "vars": jax.tree.map(jnp.copy, {"params": params,
                                                    "batch_stats": stats})}
    save_ckpt(f"{args.ckpt_dir}/yolo_e{args.epochs - 1}",
              {"params": params, "batch_stats": stats})
    if best["vars"] is not None:
        save_ckpt(f"{args.ckpt_dir}/yolo_best", best["vars"])


if __name__ == "__main__":
    sys.exit(main())
