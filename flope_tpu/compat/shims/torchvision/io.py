"""torchvision.io shim (module-scope import in posenet_flower_dataset.py)."""

import numpy as np
import torch


def read_image(path):
    """PIL-backed stand-in for torchvision.io.read_image: (C, H, W) uint8."""
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGB"))
    return torch.from_numpy(arr.transpose(2, 0, 1).copy())
