"""ArUco-grid ground-truth pose estimation (host-side GT labeling tooling).

Re-creation of the reference's MultiArucoPoseEstimation
(sunflower/utils/multi_aruco_pose_est.py): a 6x4 grid of 4x4-dictionary ArUco
markers surrounds the object; each detected marker is PnP-solved individually,
offset to the object origin by its known position on the printed grid, and the
per-marker (rvec, tvec) estimates are MEDIAN-fused (multi_aruco_pose_est.py:
187-190). Also the printable-grid generator (scripts/generate_aruco.py) and
the grid offsets table (multi_aruco_pose_est.py:6-26).

This stays host-side CPU on cv2.aruco exactly like the reference — it's
offline data-labeling tooling with no TPU rationale (SURVEY.md §2.1).
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["ArucoGridConfig", "grid_offsets", "generate_grid_image",
           "MultiArucoPoseEstimator", "object_positions_on_grid"]


@dataclasses.dataclass(frozen=True)
class ArucoGridConfig:
    """Reference grid: 6 cols x 4 rows of 4x4_50 markers
    (generate_aruco.py:5-11, multi_aruco_pose_est.py:6-26)."""

    cols: int = 6
    rows: int = 4
    marker_size_mm: float = 40.0
    gap_mm: float = 24.0
    dictionary: str = "DICT_4X4_50"


def _aruco():
    import cv2
    return cv2, cv2.aruco


def grid_offsets(cfg: ArucoGridConfig = ArucoGridConfig()) -> dict[int, np.ndarray]:
    """Marker id -> translation (mm) from the marker center to the grid
    origin (top-left marker center), laid out row-major like the reference's
    get_aruco_offsets (multi_aruco_pose_est.py:6-26)."""
    step = cfg.marker_size_mm + cfg.gap_mm
    out = {}
    for r in range(cfg.rows):
        for c in range(cfg.cols):
            mid = r * cfg.cols + c
            out[mid] = np.array([-c * step, r * step, 0.0])
    return out


def object_positions_on_grid() -> list[tuple[float, float, float]]:
    """The five flower mount positions on the calibration grid (mm), from
    utils/data.py get_obj_positions_on_aruco_grid."""
    return [(56.0, -56.0, 17.0), (120.0, -184.0, 17.0), (-8.0, -184.0, 17.0),
            (-8.0, 72.0, 17.0), (120.0, 72.0, 17.0)]


def generate_grid_image(cfg: ArucoGridConfig = ArucoGridConfig(),
                        px_per_mm: float = 4.0) -> np.ndarray:
    """Printable marker-grid image (scripts/generate_aruco.py equivalent)."""
    cv2, aruco = _aruco()
    d = aruco.getPredefinedDictionary(getattr(aruco, cfg.dictionary))
    m_px = int(cfg.marker_size_mm * px_per_mm)
    g_px = int(cfg.gap_mm * px_per_mm)
    W = cfg.cols * m_px + (cfg.cols + 1) * g_px
    H = cfg.rows * m_px + (cfg.rows + 1) * g_px
    img = np.full((H, W), 255, np.uint8)
    for r in range(cfg.rows):
        for c in range(cfg.cols):
            mid = r * cfg.cols + c
            marker = aruco.generateImageMarker(d, mid, m_px)
            y = g_px + r * (m_px + g_px)
            x = g_px + c * (m_px + g_px)
            img[y:y + m_px, x:x + m_px] = marker
    return img


class MultiArucoPoseEstimator:
    """Detect grid markers, PnP each, offset to origin, median-fuse.

    estimate_pose(gray_or_bgr) -> (4,4) object pose in camera frame (meters),
    or None if no markers found — the reference's estimate_pose contract.
    """

    def __init__(self, K: np.ndarray, dist: np.ndarray | None = None,
                 cfg: ArucoGridConfig = ArucoGridConfig()):
        cv2, aruco = _aruco()
        self.K = np.asarray(K, np.float64)
        self.dist = np.zeros(5) if dist is None else np.asarray(dist, np.float64)
        self.cfg = cfg
        self.offsets = grid_offsets(cfg)
        d = aruco.getPredefinedDictionary(getattr(aruco, cfg.dictionary))
        self.detector = aruco.ArucoDetector(d, aruco.DetectorParameters())

    def estimate_pose(self, image: np.ndarray) -> np.ndarray | None:
        cv2, aruco = _aruco()
        gray = image if image.ndim == 2 else cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
        corners, ids, _ = self.detector.detectMarkers(gray)
        if ids is None or len(ids) == 0:
            return None
        s = self.cfg.marker_size_mm / 1000.0  # meters
        obj_pts = np.array([[-s / 2, s / 2, 0], [s / 2, s / 2, 0],
                            [s / 2, -s / 2, 0], [-s / 2, -s / 2, 0]], np.float64)
        rvecs, tvecs = [], []
        for corner, mid in zip(corners, ids.reshape(-1)):
            if int(mid) not in self.offsets:
                continue
            ok, rvec, tvec = cv2.solvePnP(
                obj_pts, corner.reshape(4, 2).astype(np.float64), self.K,
                self.dist, flags=cv2.SOLVEPNP_IPPE_SQUARE)
            if not ok:
                continue
            # Offset this marker's frame to the grid origin
            # (multi_aruco_pose_est.py:159-167): t_origin = t + R * offset.
            R, _ = cv2.Rodrigues(rvec)
            off = self.offsets[int(mid)] / 1000.0
            t_origin = tvec.reshape(3) + R @ off
            rvecs.append(rvec.reshape(3))
            tvecs.append(t_origin)
        if not rvecs:
            return None
        # Median fusion across markers (multi_aruco_pose_est.py:187-190).
        rvec_med = np.median(np.stack(rvecs), axis=0)
        tvec_med = np.median(np.stack(tvecs), axis=0)
        cv2_, _ = _aruco()
        R, _ = cv2_.Rodrigues(rvec_med)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = tvec_med
        return T
