"""Detectors backed by precomputed artifacts on disk.

MaskDirDetector: derives boxes from a segmentation-mask image via connected
components — lets every downstream CLI stage run on datasets that already
carry masks (e.g. written by the teacher or the synthetic generator), the way
the reference's offline stages consume `mask/` + `detection/` dirs.

DetectionDirDetector: replays detection/*.txt files (the N x 15 rows written
by test_posenet.py:150-161).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["MaskDirDetector", "boxes_from_mask"]


def boxes_from_mask(mask: np.ndarray, max_det: int = 16,
                    min_area: int = 25) -> tuple[np.ndarray, np.ndarray]:
    """Connected components of a {0,255} mask -> (boxes (D,4) int32, valid)."""
    import cv2

    n, labels, stats, _ = cv2.connectedComponentsWithStats(
        (np.asarray(mask) > 128).astype(np.uint8), connectivity=8)
    boxes = np.zeros((max_det, 4), np.int32)
    valid = np.zeros((max_det,), bool)
    # stats row 0 is background; sort components by area, largest first.
    comps = sorted(range(1, n), key=lambda i: -stats[i, cv2.CC_STAT_AREA])
    slot = 0
    for i in comps:
        if slot >= max_det:
            break
        x, y, w, h, area = stats[i]
        if area < min_area:
            continue
        boxes[slot] = [x, y, x + w, y + h]
        valid[slot] = True
        slot += 1
    return boxes, valid


class MaskDirDetector:
    """Pipeline detector fed by a dataset's mask/ directory."""

    def __init__(self, mask_dir: str | Path, max_det: int = 16,
                 min_area: int = 25):
        self.mask_dir = Path(mask_dir)
        self.max_det = max_det
        self.min_area = min_area
        self._current: str | None = None

    def set_frame(self, name: str):
        self._current = name

    def detect(self, rgb: np.ndarray):
        from PIL import Image

        assert self._current is not None, "call set_frame(name) first"
        mask = np.asarray(Image.open(self.mask_dir / f"{self._current}.png"))
        if mask.ndim == 3:
            mask = mask[..., 0]
        boxes, valid = boxes_from_mask(mask, self.max_det, self.min_area)
        return boxes, valid, mask.astype(np.uint8)
