"""Checkpoint helpers: orbax save/load + torch .pth import.

The reference checkpoints bare state_dicts per epoch (train_posenet.py:186);
here checkpoints carry params + batch_stats + optimizer state + step
(SURVEY.md §5.4's prescribed upgrade) via orbax, with a loader that also
accepts the reference's torch .pth files (converted on the fly).
"""

from __future__ import annotations

from pathlib import Path

__all__ = ["save_ckpt", "load_ckpt", "load_posenet_ckpt",
           "save_npz_ckpt", "write_ckpt_meta", "read_ckpt_meta",
           "check_ckpt_meta"]


def write_ckpt_meta(ckpt_dir, **meta) -> None:
    """Record training-config facts (image_size, width_mult, ...) as a
    meta.json sidecar in the run dir. Checkpoints are fully convolutional, so
    nothing in the weights reveals the training resolution — evaluating a
    256-trained model on 512 crops silently runs off-distribution (~5x the
    rotation error). The sidecar lets loaders warn."""
    import json

    p = Path(ckpt_dir)
    p.mkdir(parents=True, exist_ok=True)
    (p / "meta.json").write_text(json.dumps(meta))


def read_ckpt_meta(path) -> dict | None:
    """meta.json for a checkpoint path (leaf snapshot or run dir), or None
    (e.g. checkpoints from before the sidecar existed, torch .pth files)."""
    import json

    p = Path(path)
    for cand in (Path(str(p) + ".meta.json"), p / "meta.json",
                 p.parent / "meta.json"):
        if cand.exists():
            return json.loads(cand.read_text())
    return None


def check_ckpt_meta(path, warn=None, **expected) -> None:
    """Warn (print by default) when the checkpoint's recorded training config
    disagrees with the evaluation config, e.g. crop size or width_mult."""
    meta = read_ckpt_meta(path)
    if not meta:
        return
    warn = warn or print
    for k, v in expected.items():
        if k in meta and meta[k] != v:
            warn(f"WARNING: checkpoint {path} was trained with {k}="
                 f"{meta[k]} but is being used with {k}={v} — "
                 "off-distribution inputs degrade accuracy silently")


def save_ckpt(path, tree) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).absolute(), tree, force=True)
    ckptr.wait_until_finished()


def _resolve_ckpt_dir(p: Path) -> Path:
    """Accept either a leaf orbax checkpoint or a training --ckpt-dir.

    Training runs write `<ckpt-dir>/<name>_best` and `<name>_e<N>` snapshots;
    pointing a loader at the run dir resolves to `*_best` (preferred) or the
    highest-numbered epoch snapshot.
    """
    if not p.is_dir() or (p / "_CHECKPOINT_METADATA").exists():
        return p
    subs = [d for d in p.iterdir() if d.is_dir()
            and (d / "_CHECKPOINT_METADATA").exists()]
    if not subs:
        return p
    best = [d for d in subs if d.name.endswith("_best")]
    if best:
        return best[0]

    def epoch_key(d: Path):
        tail = d.name.rsplit("_e", 1)
        return int(tail[1]) if len(tail) == 2 and tail[1].isdigit() else -1

    return max(subs, key=epoch_key)


def save_npz_ckpt(path, tree, float_dtype="bfloat16", **meta) -> None:
    """Pack an inference pytree into ONE small npz file.

    Orbax run dirs are the training format; this is the *release* format —
    a single git-committable artifact (the hosting environment is wiped
    between rounds, so deployed weights must live in the repo). Float leaves
    are cast to bfloat16 (the pipelines compute in bf16 anyway — PERF.md)
    and stored as uint16 bit patterns with a `bf16:` key prefix, since npz
    cannot serialize ml_dtypes natively; everything else is stored raw.
    Keys are '/'-joined tree paths. `load_ckpt` accepts the result anywhere
    an orbax dir is accepted.
    """
    import jax
    import ml_dtypes
    import numpy as np

    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                       for k in kp)
        arr = np.asarray(leaf)
        if float_dtype and np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(ml_dtypes.bfloat16).view(np.uint16)
            key = "bf16:" + key
        flat[key] = arr
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)
    if meta:
        import json
        Path(str(path) + ".meta.json").write_text(json.dumps(meta))


def _load_npz_ckpt(path) -> dict:
    import ml_dtypes
    import numpy as np

    tree: dict = {}
    with np.load(path) as z:
        for key in z.files:
            arr = z[key]
            if key.startswith("bf16:"):
                key = key[5:]
                # float32 restore: downstream code (optimizers, oracles)
                # expects full-precision leaves; values are exact bf16.
                arr = arr.view(ml_dtypes.bfloat16).astype(np.float32)
            node = tree
            *parents, leaf = key.split("/")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = arr
    return tree


def load_ckpt(path):
    """Restore a checkpoint as host numpy arrays.

    Accepts an orbax leaf/run dir or a `save_npz_ckpt` release file.
    Restoring with the recorded shardings would fail across backends (a
    checkpoint written on the TPU names devices that don't exist on the CPU
    platform and vice versa), so force numpy restore_types throughout.
    """
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    if str(path).endswith(".npz"):
        return _load_npz_ckpt(path)
    path = _resolve_ckpt_dir(Path(path))
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(Path(path).absolute())
    if meta is None or meta.item_metadata is None:
        raise FileNotFoundError(
            f"{path} is not an orbax checkpoint (no metadata); expected a "
            "leaf checkpoint dir or a training --ckpt-dir containing "
            "*_best/*_e<N> snapshots")
    meta_tree = meta.item_metadata.tree
    restored = ckptr.restore(
        Path(path).absolute(),
        restore_args=jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree,
        ),
    )
    return restored


def load_posenet_ckpt(path) -> dict:
    """Load PoseNet inference variables from either an orbax dir or a torch
    .pth state_dict (the reference's format, pose_predictor.py:52)."""
    p = Path(path)
    if p.suffix == ".pth":
        import torch

        from flope_tpu.models.torch_convert import posenet_variables_from_torch
        sd = torch.load(p, map_location="cpu", weights_only=True)
        return posenet_variables_from_torch(sd)
    tree = load_ckpt(p)
    return {"params": tree["params"], "batch_stats": tree["batch_stats"]}
