"""Convert a PyTorch PoseResNet state_dict to flope_tpu PoseNet variables.

The reference ships checkpoints in torchvision naming ('base.conv1.weight',
'base.layer1.0.conv1.weight', 'base.fc.0.weight', 'fc_rot.weight' — see
sunflower/models/posenet.py and torch.load at pose_predictor.py:52). This
converter lets those weights seed the TPU model for fidelity testing, exactly
as SURVEY.md §5.4 prescribes.

Accepts either a live torch state_dict (tensors) or a {key: np.ndarray} dict,
so torch is only an optional dependency.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["posenet_variables_from_torch", "posenet_state_dict_to_torch"]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(t) -> jnp.ndarray:
    # torch (O, I, kH, kW) -> flax (kH, kW, I, O)
    return jnp.asarray(_np(t).transpose(2, 3, 1, 0))


def _linear(t) -> jnp.ndarray:
    # torch (out, in) -> flax (in, out)
    return jnp.asarray(_np(t).T)


def posenet_variables_from_torch(state_dict: dict) -> dict:
    """Build {'params': ..., 'batch_stats': ...} for flope_tpu.models.PoseNet."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    def bn(prefix):
        p = {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
             "bias": jnp.asarray(sd[f"{prefix}.bias"])}
        s = {"mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
             "var": jnp.asarray(sd[f"{prefix}.running_var"])}
        return p, s

    params: dict = {"backbone": {}}
    stats: dict = {"backbone": {}}
    bb_p, bb_s = params["backbone"], stats["backbone"]

    bb_p["conv1"] = {"kernel": _conv(sd["base.conv1.weight"])}
    bb_p["bn1"], bb_s["bn1"] = bn("base.bn1")

    for si in range(1, 5):
        for bi in range(2):
            t = f"base.layer{si}.{bi}"
            name = f"layer{si}_{bi}"
            blk_p: dict = {
                "conv1": {"kernel": _conv(sd[f"{t}.conv1.weight"])},
                "conv2": {"kernel": _conv(sd[f"{t}.conv2.weight"])},
            }
            blk_s: dict = {}
            blk_p["bn1"], blk_s["bn1"] = bn(f"{t}.bn1")
            blk_p["bn2"], blk_s["bn2"] = bn(f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                blk_p["downsample_bn"], blk_s["downsample_bn"] = bn(f"{t}.downsample.1")
            bb_p[name] = blk_p
            bb_s[name] = blk_s

    params["fc"] = {"kernel": _linear(sd["base.fc.0.weight"]),
                    "bias": jnp.asarray(sd["base.fc.0.bias"])}
    params["fc_rot"] = {"kernel": _linear(sd["fc_rot.weight"]),
                        "bias": jnp.asarray(sd["fc_rot.bias"])}
    return {"params": params, "batch_stats": stats}


def posenet_state_dict_to_torch(variables: dict) -> dict:
    """Inverse mapping: flope_tpu PoseNet variables -> torch-style state_dict
    of numpy arrays (for exporting TPU-trained weights back to the reference)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out: dict[str, np.ndarray] = {}

    def put_bn(prefix, p, s):
        out[f"{prefix}.weight"] = np.asarray(p["scale"])
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
        out[f"{prefix}.running_mean"] = np.asarray(s["mean"])
        out[f"{prefix}.running_var"] = np.asarray(s["var"])

    bb_p, bb_s = params["backbone"], stats["backbone"]
    out["base.conv1.weight"] = np.asarray(bb_p["conv1"]["kernel"]).transpose(3, 2, 0, 1)
    put_bn("base.bn1", bb_p["bn1"], bb_s["bn1"])
    for si in range(1, 5):
        for bi in range(2):
            t = f"base.layer{si}.{bi}"
            name = f"layer{si}_{bi}"
            out[f"{t}.conv1.weight"] = np.asarray(bb_p[name]["conv1"]["kernel"]).transpose(3, 2, 0, 1)
            out[f"{t}.conv2.weight"] = np.asarray(bb_p[name]["conv2"]["kernel"]).transpose(3, 2, 0, 1)
            put_bn(f"{t}.bn1", bb_p[name]["bn1"], bb_s[name]["bn1"])
            put_bn(f"{t}.bn2", bb_p[name]["bn2"], bb_s[name]["bn2"])
            if "downsample_conv" in bb_p[name]:
                out[f"{t}.downsample.0.weight"] = np.asarray(
                    bb_p[name]["downsample_conv"]["kernel"]).transpose(3, 2, 0, 1)
                put_bn(f"{t}.downsample.1", bb_p[name]["downsample_bn"],
                       bb_s[name]["downsample_bn"])
    out["base.fc.0.weight"] = np.asarray(params["fc"]["kernel"]).T
    out["base.fc.0.bias"] = np.asarray(params["fc"]["bias"])
    out["fc_rot.weight"] = np.asarray(params["fc_rot"]["kernel"]).T
    out["fc_rot.bias"] = np.asarray(params["fc_rot"]["bias"])
    return out
