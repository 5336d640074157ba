"""YOLO label prep tests (contours, polygons, sanity check, dataset loader)."""

import numpy as np
import pytest

from flope_tpu.data.yolo_labels import (
    mask_and_boxes_to_contours,
    contours_to_polygons,
    write_yolo_seg_labels,
    dataset_sanity_check,
    load_yolo_seg_dataset,
)


def two_blob_mask(h=120, w=160):
    import cv2
    mask = np.zeros((h, w), np.uint8)
    cv2.circle(mask, (40, 40), 20, 255, -1)
    cv2.circle(mask, (110, 80), 25, 255, -1)
    boxes = np.array([[15, 15, 65, 65], [80, 50, 140, 110]])
    return mask, boxes


class TestContours:
    def test_one_contour_per_box(self):
        mask, boxes = two_blob_mask()
        contours = mask_and_boxes_to_contours(mask, boxes)
        assert len(contours) == 2

    def test_polygons_normalized(self):
        mask, boxes = two_blob_mask()
        polys = contours_to_polygons(mask_and_boxes_to_contours(mask, boxes),
                                     120, 160)
        for p in polys:
            arr = np.array(p)
            assert (arr >= 0).all() and (arr <= 1).all()
            assert len(p) % 2 == 0 and len(p) >= 6

    def test_box_without_contour_skipped(self):
        mask, boxes = two_blob_mask()
        boxes = np.vstack([boxes, [[0, 100, 20, 119]]])  # empty corner
        contours = mask_and_boxes_to_contours(mask, boxes)
        assert len(contours) == 2


class TestLabelRoundtrip:
    def test_write_load(self, tmp_path):
        from PIL import Image
        mask, boxes = two_blob_mask()
        rgb = np.zeros((120, 160, 3), np.uint8)
        for split in ["train", "val"]:
            for sub in ["images", "masks", "labels"]:
                (tmp_path / sub / split).mkdir(parents=True)
        Image.fromarray(rgb).save(tmp_path / "images" / "train" / "s0.png")
        Image.fromarray(mask).save(tmp_path / "masks" / "train" / "s0.png")
        n = write_yolo_seg_labels(tmp_path / "labels" / "train" / "s0.txt",
                                  mask, boxes)
        assert n == 2
        data = load_yolo_seg_dataset(tmp_path, "train", image_size=64, max_gt=4)
        assert data["images"].shape == (1, 64, 64, 3)
        assert data["valid"][0].sum() == 2
        assert data["masks"].shape == (1, 4, 16, 16)
        assert data["masks"][0, 0].sum() > 0
        b = data["boxes"][0, 0]
        assert b[2] > b[0] and b[3] > b[1]

    def test_sanity_check(self, tmp_path):
        for sub in ["images/train", "masks/train", "labels/train"]:
            (tmp_path / sub).mkdir(parents=True)
        (tmp_path / "images/train/a.png").touch()
        (tmp_path / "masks/train/a.png").touch()
        (tmp_path / "labels/train/a.txt").touch()
        (tmp_path / "images/train/b.png").touch()  # incomplete
        subdirs = ("images/train", "masks/train", "labels/train")
        bad = dataset_sanity_check(tmp_path, subdirs=subdirs)
        assert bad == ["b"]
        dataset_sanity_check(tmp_path, subdirs=subdirs, delete=True)
        assert not (tmp_path / "images/train/b.png").exists()
        assert (tmp_path / "images/train/a.png").exists()
