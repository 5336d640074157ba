"""Native (C++) host-side components.

The TPU compute path is JAX/XLA; the host side of the framework — data
generation, IO — runs on this machine's single CPU core, so its hot loops
are implemented natively with numpy fallbacks:

- crop_render.cpp: batched synthetic flower-crop renderer (the PoseNet
  training-set factory, ~20x faster than the numpy loop on this host).

Libraries are compiled on demand (flope_tpu/native/build.py) and loaded via
ctypes; every native function has a pure-numpy fallback and a parity test.
"""

from __future__ import annotations

import ctypes
import functools

import numpy as np

__all__ = ["render_crops_native", "native_available"]


@functools.cache
def _lib():
    from flope_tpu.native.build import build_library

    path = build_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    lib.render_crops.restype = None
    lib.render_crops.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    return lib


def native_available() -> bool:
    return _lib() is not None


def render_crops_native(rotations: np.ndarray, offsets: np.ndarray,
                        fills: np.ndarray, size: int) -> np.ndarray | None:
    """Batched render_flower_crop (synthetic.py) in native code.

    rotations: (N,3,3); offsets: (N,2) fractional center offsets; fills: (N,).
    Returns (N, size, size, 3) uint8, or None when no toolchain is available
    (callers use the numpy renderer then).
    """
    lib = _lib()
    if lib is None:
        return None
    rotations = np.ascontiguousarray(rotations, np.float64).reshape(-1, 9)
    n = rotations.shape[0]
    offsets = np.ascontiguousarray(offsets, np.float64).reshape(n, 2)
    fills = np.ascontiguousarray(fills, np.float64).reshape(n)
    out = np.empty((n, size, size, 3), np.uint8)
    lib.render_crops(rotations, offsets, fills, n, size, out)
    return out
