"""Known camera intrinsics (reference: sunflower/utils/data.py)."""

from __future__ import annotations

import numpy as np

__all__ = ["pixel6a_intrinsics", "realsense_435_cam_matrix",
           "object_positions_on_aruco_grid"]


def pixel6a_intrinsics() -> dict:
    """Pixel 6a calibration (utils/data.py:3-13)."""
    d = {"w": 1920, "h": 1080, "fx": 1751.276576, "fy": 1756.389162,
         "cx": 957.984186, "cy": 529.393387,
         "distortion": [0.0, 0.0, 0.0, 0.0, 0.0]}
    d["K"] = np.array([[d["fx"], 0, d["cx"]], [0, d["fy"], d["cy"]], [0, 0, 1.0]])
    return d


def realsense_435_cam_matrix() -> np.ndarray:
    """RealSense D435 calibration (utils/data.py:24-30)."""
    return np.array([
        [1361.94519042968750, 0.0, 963.5921630859375],
        [0.0, 1361.13037109375, 533.95965576171875],
        [0.0, 0.0, 1.0],
    ])


def object_positions_on_aruco_grid() -> list[tuple[float, float, float]]:
    """Flower mount positions (mm) on the ArUco grid (utils/data.py:33-38)."""
    return [(56.0, -56.0, 17.0), (120.0, -184.0, 17.0), (-8.0, -184.0, 17.0),
            (-8.0, 72.0, 17.0), (120.0, 72.0, 17.0)]
