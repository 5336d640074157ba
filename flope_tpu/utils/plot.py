"""Host-side visualization: pose-axes overlays, boxes, depth colormaps.

Re-creation of the reference's plotting utilities (sunflower/utils/plot.py):
`plot_flower_poses_on_image` (plot.py:427-487) projects each pose's XYZ axes
through K and draws them; `plot_bounding_boxes` (plot.py:10-18) draws detector
boxes. cv2 is a host-side (visualization-only) dependency, matching the
reference; nothing here runs on TPU.
"""

from __future__ import annotations

import numpy as np

__all__ = ["plot_axes", "plot_flower_poses_on_image", "plot_bounding_boxes",
           "apply_depth_colormap", "rainbow_colors", "make_grid"]


def _cv2():
    import cv2
    return cv2


def rainbow_colors(n: int) -> list[tuple[int, int, int]]:
    """n visually distinct BGR colors (plot.py generate_rainbow_colors)."""
    import colorsys
    out = []
    for i in range(max(n, 1)):
        r, g, b = colorsys.hsv_to_rgb(i / max(n, 1), 1.0, 1.0)
        out.append((int(b * 255), int(g * 255), int(r * 255)))
    return out


def plot_axes(image: np.ndarray, R: np.ndarray, t: np.ndarray, K: np.ndarray,
              axis_len: float = 0.05, thickness: int = 2) -> np.ndarray:
    """Draw the pose's XYZ axes (X red, Y green, Z blue in BGR) projected
    through K. Mutates + returns image."""
    cv2 = _cv2()
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]) * axis_len
    cam = (R @ pts.T).T + np.asarray(t).reshape(1, 3)
    if (cam[:, 2] <= 1e-6).any():
        return image
    uv = (K @ cam.T).T
    uv = (uv[:, :2] / uv[:, 2:3]).astype(np.int32)
    for k, color in [(1, (0, 0, 255)), (2, (0, 255, 0)), (3, (255, 0, 0))]:
        cv2.line(image, tuple(uv[0]), tuple(uv[k]), color, thickness)
    return image


def plot_flower_poses_on_image(image: np.ndarray, poses: np.ndarray,
                               K: np.ndarray, plot_count: bool = True,
                               plot_distance: bool = True) -> np.ndarray:
    """Overlay every pose's axes + optional index/distance labels
    (plot.py:427-487 behavior). poses: (N,4,4) camera frame."""
    cv2 = _cv2()
    for i, T in enumerate(np.asarray(poses)):
        R, t = T[:3, :3], T[:3, 3]
        plot_axes(image, R, t, K)
        if t[2] > 1e-6 and (plot_count or plot_distance):
            uv = K @ t
            u, v = int(uv[0] / uv[2]), int(uv[1] / uv[2])
            label = []
            if plot_count:
                label.append(str(i))
            if plot_distance:
                label.append(f"{np.linalg.norm(t):.2f}m")
            cv2.putText(image, " ".join(label), (u + 5, v - 5),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
    return image


def plot_bounding_boxes(image: np.ndarray, boxes: np.ndarray,
                        color=(0, 255, 0), thickness: int = 2) -> np.ndarray:
    cv2 = _cv2()
    for (x0, y0, x1, y1) in np.asarray(boxes, int):
        cv2.rectangle(image, (x0, y0), (x1, y1), color, thickness)
    return image


def apply_depth_colormap(depth: np.ndarray, near: float | None = None,
                         far: float | None = None) -> np.ndarray:
    """Depth (meters) -> BGR colormap image (plot.py:419-424)."""
    cv2 = _cv2()
    d = np.asarray(depth, np.float32)
    lo = np.nanmin(d) if near is None else near
    hi = np.nanmax(d) if far is None else far
    norm = np.clip((d - lo) / max(hi - lo, 1e-9), 0, 1)
    return cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_TURBO)


def make_grid(images: list[np.ndarray], nrow: int = 8, padding: int = 2,
              pad_value: int = 255) -> np.ndarray:
    """Tile same-size images into a grid (generate_metrics_utils.py:38-71)."""
    h, w, c = images[0].shape
    ncol = (len(images) + nrow - 1) // nrow
    grid = np.full((ncol * h + (ncol - 1) * padding,
                    nrow * w + (nrow - 1) * padding, c), pad_value, np.uint8)
    for i, img in enumerate(images):
        r, cidx = divmod(i, nrow)
        y, x = r * (h + padding), cidx * (w + padding)
        grid[y:y + h, x:x + w] = img
    return grid
