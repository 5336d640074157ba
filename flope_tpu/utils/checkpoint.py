"""Checkpoint helpers: orbax save/load + torch .pth import.

The reference checkpoints bare state_dicts per epoch (train_posenet.py:186);
here checkpoints carry params + batch_stats + optimizer state + step
(SURVEY.md §5.4's prescribed upgrade) via orbax, with a loader that also
accepts the reference's torch .pth files (converted on the fly).
"""

from __future__ import annotations

from pathlib import Path

__all__ = ["save_ckpt", "load_ckpt", "load_posenet_ckpt"]


def save_ckpt(path, tree) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).absolute(), tree, force=True)
    ckptr.wait_until_finished()


def load_ckpt(path):
    """Restore a checkpoint as host numpy arrays.

    Restoring with the recorded shardings would fail across backends (a
    checkpoint written on the TPU names devices that don't exist on the CPU
    platform and vice versa), so force numpy restore_types throughout.
    """
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    meta_tree = ckptr.metadata(Path(path).absolute()).item_metadata.tree
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
