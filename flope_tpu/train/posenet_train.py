"""PoseNet training: pjit data-parallel, reference-faithful loss + metrics.

Reference training recipe (scripts/train_posenet.py:17-26,172-208): 500
epochs, batch 64, Adadelta lr=1e-3 (the StepLR is created but never stepped —
LR is effectively constant, so no schedule here either), seed 0, loss =
"chordal distance" MSE between GT and Procrustes-projected predicted rotation
matrices (train_posenet.py:40-41), metric = mean quaternion geodesic angle
(diff_quats), checkpoint every epoch, log line per epoch.

TPU-native deltas (recorded, not silent):
* data parallelism over a ('data','model') mesh with optional tensor-parallel
  sharding of the wide head (the reference is single-GPU);
* AdamW available as the recommended optimizer (`optimizer='adamw'`), Adadelta
  kept as the parity default;
* orbax checkpoints carry params + batch_stats + optimizer state + step
  (the reference saved bare model weights only, SURVEY.md §5.4).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.struct
from jax.sharding import NamedSharding, PartitionSpec as P

from flope_tpu.geometry import rotmat_to_quat, quat_angle_deg
from flope_tpu.models.posenet import PoseNet

__all__ = ["TrainConfig", "TrainState", "chordal_loss", "angle_error_deg",
           "make_optimizer", "create_train_state", "make_train_step",
           "make_eval_step", "train_posenet", "param_shardings"]


@dataclasses.dataclass
class TrainConfig:
    """Defaults mirror scripts/train_posenet.py:17-26."""

    epochs: int = 500
    batch_size: int = 64
    lr: float = 1e-3
    seed: int = 0
    optimizer: str = "adadelta"  # parity default; 'adamw' recommended on TPU
    weight_decay: float = 0.0
    # LR schedule: "constant" mirrors the reference (its StepLR is created but
    # never stepped, train_posenet.py:205); "cosine" = 5% linear warmup then
    # cosine decay to 1% of peak — needed for hard-domain convergence, where
    # a constant 3e-4 AdamW stalls in the 20-40 deg range.
    lr_schedule: str = "constant"
    total_steps: int = 0  # cosine horizon; 0 = filled in by train_posenet
    # Polyak/EMA averaging of params (0 = off, reference parity; 0.999 is a
    # good default when on). The evaluated/released weights become the EMA
    # shadow — smooths late-training noise, which is where the flat stack's
    # NaN-adjacent best-snapshot regression came from (PERF.md round 3).
    ema_decay: float = 0.0
    image_size: int = 512
    dropout: float = 0.5
    model_dtype: Any = jnp.float32
    width_mult: float = 1.0  # backbone channel scale (0.5 = 512^2 student)
    ckpt_dir: str | None = "weights"
    # Snapshot cadence: N>0 saves posenet_e{n} every N epochs (the reference
    # saves EVERY epoch, train_posenet.py:186 — use 1 for parity). 0 saves
    # only the final epoch + the best-eval checkpoint. Each snapshot fetches
    # ~135 MB (params + opt state) from the device — through a remote-attached
    # TPU that dominates epoch time, so the default is 0 with the best state
    # tracked as a cheap on-device copy and written once at the end.
    ckpt_every: int = 0
    log_path: str | None = "posenet_train.jsonl"
    mesh_axes: tuple[str, ...] = ("data", "model")


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    # EMA shadow of params (None when ema_decay == 0).
    ema_params: Any = None


def chordal_loss(R_pred: jax.Array, R_gt: jax.Array) -> jax.Array:
    """MSE over rotation-matrix elements ("chordal distance",
    train_posenet.py:40-41 — torch F.mse_loss mean over all elements)."""
    return jnp.mean((R_pred - R_gt) ** 2)


def angle_error_deg(R_pred: jax.Array, R_gt: jax.Array) -> jax.Array:
    """Mean quaternion geodesic angle (train_posenet.py:134-137)."""
    return jnp.mean(quat_angle_deg(rotmat_to_quat(R_pred), rotmat_to_quat(R_gt)))


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    if config.lr_schedule == "constant":
        lr = config.lr
    elif config.lr_schedule == "cosine":
        if config.total_steps <= 0:
            raise ValueError("cosine schedule needs total_steps > 0 "
                             "(train_posenet fills it from epochs x batches)")
        warmup = max(config.total_steps // 20, 1)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=config.lr * 0.01, peak_value=config.lr,
            warmup_steps=warmup, decay_steps=config.total_steps,
            end_value=config.lr * 0.01)
    else:
        raise ValueError(f"unknown lr_schedule {config.lr_schedule!r}")
    if config.optimizer == "adadelta":
        return optax.adadelta(learning_rate=lr)
    if config.optimizer == "adamw":
        return optax.adamw(learning_rate=lr,
                           weight_decay=config.weight_decay)
    raise ValueError(f"unknown optimizer {config.optimizer!r}")


def param_shardings(mesh, variables):
    """Tensor-parallel rules for the wide head; everything else replicated.

    fc kernel (512, 2048) splits its output features over 'model'; fc_rot
    kernel (2048, 9) splits its input features — the activation between them
    stays sharded and XLA inserts one psum for the 9-d output.
    """
    has_model = "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1

    def rule(path, x):
        keys = [getattr(k, "key", str(k)) for k in path]
        joined = "/".join(str(k) for k in keys)
        if has_model and x.ndim >= 1:
            if joined.endswith("fc/kernel"):
                return NamedSharding(mesh, P(None, "model"))
            if joined.endswith("fc/bias"):
                return NamedSharding(mesh, P("model"))
            if joined.endswith("fc_rot/kernel"):
                return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, variables)


def create_train_state(config: TrainConfig, rng: jax.Array) -> tuple[PoseNet, TrainState]:
    model = PoseNet(dtype=config.model_dtype, dropout=config.dropout,
                    width_mult=config.width_mult)
    # jit the init: eager init dispatches every conv/bn op one by one — each a
    # round trip through a remote-attached TPU (minutes of startup); jitted it
    # is one program and lands in the persistent compile cache.
    init = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, config.image_size, config.image_size, 3)),
        train=False))
    variables = init(rng)
    tx = make_optimizer(config)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        ema_params=(jax.tree.map(jnp.copy, variables["params"])
                    if config.ema_decay > 0 else None),
    )
    return model, state


def make_train_step(model: PoseNet, tx: optax.GradientTransformation, mesh=None,
                    donate: bool = True, ema_decay: float = 0.0):
    """Returns a jitted (state, images, rot_gt, rng) -> (state, metrics) step.

    With a mesh, the batch is sharded over 'data' and gradients reduce via
    GSPMD-inserted psums over ICI. The input state is donated by default
    (params/opt buffers are rewritten in place — halves peak HBM for the
    update); donate=False keeps the input state alive, used by the
    donation-correctness test (SURVEY.md §5.2).
    """

    def step(state: TrainState, images, rot_gt, dropout_rng):
        if mesh is not None:
            images = jax.lax.with_sharding_constraint(
                images, NamedSharding(mesh, P("data")))
            rot_gt = jax.lax.with_sharding_constraint(
                rot_gt, NamedSharding(mesh, P("data")))

        def loss_fn(params):
            r9, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, rngs={"dropout": dropout_rng},
                mutable=["batch_stats"])
            R = PoseNet.to_rotmats(r9)
            loss = chordal_loss(R, rot_gt)
            return loss, (R, updates["batch_stats"])

        (loss, (R, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay > 0:
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                state.ema_params, new_params)
        metrics = {"loss": loss, "angle_deg": angle_error_deg(R, rot_gt)}
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt, step=state.step + 1,
                          ema_params=new_ema), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: PoseNet, mesh=None, use_ema: bool = False):
    def step(state: TrainState, images, rot_gt):
        if mesh is not None:
            images = jax.lax.with_sharding_constraint(
                images, NamedSharding(mesh, P("data")))
        params = state.ema_params if use_ema else state.params
        r9 = model.apply({"params": params,
                          "batch_stats": state.batch_stats},
                         images, train=False)
        R = PoseNet.to_rotmats(r9)
        return {"loss": chordal_loss(R, rot_gt),
                "angle_deg": angle_error_deg(R, rot_gt)}

    return jax.jit(step)


def _batches(rng: np.random.Generator, n: int, batch_size: int, shuffle: bool):
    idx = rng.permutation(n) if shuffle else np.arange(n)
    for s in range(0, n - batch_size + 1, batch_size):
        yield idx[s:s + batch_size]


def train_posenet(config: TrainConfig, train_data, eval_data=None, mesh=None,
                  epochs: int | None = None, log_fn=print,
                  init_variables: dict | None = None):
    """Full training loop.

    train_data/eval_data: dicts with 'images' (N,S,S,3) float [0,1] and
    'rotations' (N,3,3) — see flope_tpu.data.posenet_dataset loaders.
    init_variables: optional warm-start {'params', 'batch_stats'} (e.g. from
    load_posenet_ckpt — the reference's WEIGHTS warm start,
    train_posenet.py:24-25,200-202).
    Returns (model, final TrainState, history list).
    """
    epochs = config.epochs if epochs is None else epochs
    if config.lr_schedule != "constant" and config.total_steps == 0:
        n_tr = train_data["images"].shape[0]
        steps_per_epoch = max(n_tr // min(config.batch_size, n_tr), 1)
        config = dataclasses.replace(config,
                                     total_steps=epochs * steps_per_epoch)
    rng = jax.random.PRNGKey(config.seed)
    np_rng = np.random.default_rng(config.seed)
    model, state = create_train_state(config, rng)
    tx = make_optimizer(config)
    if init_variables is not None:
        state = state.replace(params=init_variables["params"],
                              batch_stats=init_variables["batch_stats"],
                              opt_state=tx.init(init_variables["params"]),
                              ema_params=(jax.tree.map(
                                  jnp.copy, init_variables["params"])
                                  if config.ema_decay > 0 else None))
    train_step = make_train_step(model, tx, mesh,
                                 ema_decay=config.ema_decay)
    # With EMA on, the shadow params are what gets evaluated, snapshotted
    # and released.
    eval_step = make_eval_step(model, mesh, use_ema=config.ema_decay > 0)

    # Keep the datasets resident on device (as uint8 — host -> device
    # transfers through remote-attached TPUs are slow and 4x matters) and
    # gather + dequantize batches on device.
    def to_dev(d):
        return {"images": jax.device_put(
                    np.ascontiguousarray((np.asarray(d["images"]) * 255.0)
                                         .astype(np.uint8))),
                "rotations": jax.device_put(jnp.asarray(d["rotations"],
                                                        jnp.float32))}

    dev_train = to_dev(train_data)
    dev_eval = to_dev(eval_data) if eval_data is not None else None
    gather = jax.jit(lambda d, idx: (
        jnp.take(d["images"], idx, axis=0).astype(jnp.float32) / 255.0,
        jnp.take(d["rotations"], idx, axis=0)))

    ckptr = None
    if config.ckpt_dir is not None:
        import orbax.checkpoint as ocp

        from flope_tpu.utils.checkpoint import write_ckpt_meta
        ckptr = ocp.StandardCheckpointer()
        Path(config.ckpt_dir).mkdir(parents=True, exist_ok=True)
        write_ckpt_meta(config.ckpt_dir, image_size=config.image_size,
                        width_mult=config.width_mult,
                        optimizer=config.optimizer)

    history = []
    best_vars = None
    best_step = None
    n = train_data["images"].shape[0]
    for epoch in range(epochs):
        t0 = time.time()
        tr_loss, tr_ang = [], []
        epoch_metrics = []
        for bidx in _batches(np_rng, n, min(config.batch_size, n), shuffle=True):
            rng, drng = jax.random.split(rng)
            images, rots = gather(dev_train, jnp.asarray(bidx))
            state, m = train_step(state, images, rots, drng)
            epoch_metrics.append(m)  # fetch once per epoch, not per step
        for m in epoch_metrics:
            tr_loss.append(float(m["loss"]))
            tr_ang.append(float(m["angle_deg"]))
        rec = {"epoch": epoch,
               "train_loss": float(np.mean(tr_loss)),
               "train_angle": float(np.mean(tr_ang)),
               "sec": time.time() - t0}
        if dev_eval is not None:
            ev_loss, ev_ang = [], []
            ne = eval_data["images"].shape[0]
            for bidx in _batches(np_rng, ne, min(config.batch_size, ne), shuffle=False):
                images, rots = gather(dev_eval, jnp.asarray(bidx))
                m = eval_step(state, images, rots)
                ev_loss.append(float(m["loss"]))
                ev_ang.append(float(m["angle_deg"]))
            rec["eval_loss"] = float(np.mean(ev_loss))
            rec["eval_angle"] = float(np.mean(ev_ang))
        history.append(rec)
        # Reference log line: "epoch train_loss train_angle eval_loss eval_angle"
        # (train_posenet.py:182-185), persisted as JSONL here.
        if config.log_path:
            with open(config.log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        log_fn(f"epoch {epoch}: " + " ".join(
            f"{k}={v:.4f}" for k, v in rec.items() if k != "epoch"))
        if ckptr is not None:
            if config.ckpt_every > 0 and epoch % config.ckpt_every == 0:
                path = Path(config.ckpt_dir).absolute() / f"posenet_e{epoch}"
                ckptr.save(path, {"params": state.params,
                                  "batch_stats": state.batch_stats,
                                  "opt_state": state.opt_state,
                                  "step": state.step}, force=True)
            # Track the best-eval checkpoint (the reference only kept
            # per-epoch snapshots and picked by hand, e.g. posenet_e183) as a
            # device-resident copy — no host fetch until training ends.
            key = "eval_angle" if "eval_angle" in rec else "train_angle"
            if rec[key] == min(h.get(key, float("inf")) for h in history):
                # jnp.copy: the live state's buffers are donated into the
                # next step; snapshots must own their memory. With EMA, the
                # shadow params are the evaluated weights — snapshot those.
                snap = (state.ema_params if config.ema_decay > 0
                        else state.params)
                best_vars = jax.tree.map(jnp.copy,
                                         {"params": snap,
                                          "batch_stats": state.batch_stats})
                best_step = jnp.copy(state.step)
    if ckptr is not None:
        final = Path(config.ckpt_dir).absolute() / f"posenet_e{epochs - 1}"
        ckptr.save(final, {"params": state.params,
                           "batch_stats": state.batch_stats,
                           "opt_state": state.opt_state,
                           "step": state.step}, force=True)
        if best_vars is not None:
            best = Path(config.ckpt_dir).absolute() / "posenet_best"
            ckptr.save(best, {"params": best_vars["params"],
                              "batch_stats": best_vars["batch_stats"],
                              "opt_state": state.opt_state,
                              "step": best_step}, force=True)
        ckptr.wait_until_finished()
    return model, state, history
