"""ArUco GT estimation: render a synthetic grid view, recover its pose."""

import cv2
import numpy as np
import pytest

from flope_tpu.data.aruco_gt import (
    ArucoGridConfig,
    MultiArucoPoseEstimator,
    generate_grid_image,
    grid_offsets,
    object_positions_on_grid,
)


class TestGrid:
    def test_offsets_layout(self):
        cfg = ArucoGridConfig()
        off = grid_offsets(cfg)
        assert len(off) == 24
        np.testing.assert_allclose(off[0], [0, 0, 0])
        np.testing.assert_allclose(off[1], [-64, 0, 0])   # next column
        np.testing.assert_allclose(off[6], [0, 64, 0])    # next row

    def test_object_positions(self):
        assert len(object_positions_on_grid()) == 5

    def test_grid_image_has_all_markers(self):
        img = generate_grid_image()
        d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
        det = cv2.aruco.ArucoDetector(d, cv2.aruco.DetectorParameters())
        corners, ids, _ = det.detectMarkers(img)
        assert ids is not None and len(ids) == 24


class TestPoseEstimation:
    def test_recovers_known_pose(self):
        """Render the printed grid under a known homography-free fronto view
        at a known distance; the estimator must recover it to mm/級 accuracy."""
        cfg = ArucoGridConfig()
        sheet = generate_grid_image(cfg, px_per_mm=4.0)
        # Synthetic camera looking straight at the sheet from 0.5 m:
        # 1 mm on the sheet = 4 px in the sheet image; place the sheet so the
        # grid origin (marker 0 center) is at a known camera-frame position.
        fx = fy = 800.0
        h, w = 600, 800
        K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1.0]])
        z = 0.5
        # Scale: sheet px -> image px = (fx * mm_per_sheetpx / 1000) / z
        mm_per_spx = 1 / 4.0
        scale = fx * (mm_per_spx / 1000.0) / z
        sh, sw = sheet.shape
        out_w, out_h = int(sw * scale), int(sh * scale)
        small = cv2.resize(sheet, (out_w, out_h), interpolation=cv2.INTER_AREA)
        img = np.full((h, w), 255, np.uint8)
        x0, y0 = 100, 80
        img[y0:y0 + out_h, x0:x0 + out_w] = small
        # Grid origin = center of marker 0 = sheet coords (gap + m/2).
        g, m = cfg.gap_mm, cfg.marker_size_mm
        origin_spx = np.array([(g + m / 2) * 4.0, (g + m / 2) * 4.0])
        origin_img = origin_spx * scale + [x0, y0]
        want_t = np.array([(origin_img[0] - w / 2) * z / fx,
                           (origin_img[1] - h / 2) * z / fy, z])

        est = MultiArucoPoseEstimator(K, cfg=cfg)
        T = est.estimate_pose(img)
        assert T is not None
        # x, y to ~1 mm; z tolerance dominated by the integer resize of the
        # synthetic sheet (effective scale truncation), not the estimator.
        np.testing.assert_allclose(T[:2, 3], want_t[:2], atol=3e-3)
        np.testing.assert_allclose(T[2, 3], want_t[2], atol=1.2e-2)
        # Fronto-parallel: rotation ~ identity up to the grid's axes convention.
        assert abs(abs(T[2, 2]) - 1.0) < 0.05

    def test_none_when_no_markers(self):
        est = MultiArucoPoseEstimator(np.eye(3) * 500 + np.array(
            [[0, 0, 320], [0, 0, 240], [0, 0, 0]]))
        assert est.estimate_pose(np.full((480, 640), 255, np.uint8)) is None
