"""YOLO-seg label preparation: masks -> normalized polygons, dataset writing.

Re-creation of the reference's distillation data tooling:
* detection_and_mask_to_contours / contours_to_polygons
  (image_manipulation.py:99-169): per-box largest contour, normalized polygon.
* prepare_yolo_seg_dataset.py:35-47: write YOLO-seg label txt lines
  "0 x1 y1 x2 y2 ..." (class 0, normalized polygon).
* yolo_data_sanity.py:14-28: delete samples missing any of the artifacts.
* flower YOLO dataset YAMLs (config/flower_yolo.yaml, flower_seg_yolo.yaml).

Host-side (cv2 contours), exactly like the reference — this is offline
label prep feeding flope_tpu.train.yolo_train.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

__all__ = ["mask_and_boxes_to_contours", "contours_to_polygons",
           "write_yolo_seg_labels", "dataset_sanity_check",
           "write_yolo_dataset_yaml", "load_yolo_seg_dataset"]


def mask_and_boxes_to_contours(mask: np.ndarray, boxes: np.ndarray) -> list:
    """For each box, the largest unclaimed contour whose center lies inside
    (image_manipulation.py:99-159). May return fewer contours than boxes."""
    import cv2

    contours_raw, _ = cv2.findContours((np.asarray(mask) > 128).astype(np.uint8),
                                       cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    infos = []
    for c in contours_raw:
        m = cv2.moments(c)
        if m["m00"] == 0:
            continue
        infos.append((c, (m["m10"] / m["m00"], m["m01"] / m["m00"]),
                      cv2.contourArea(c)))
    used: set[int] = set()
    out = []
    for (x0, y0, x1, y1) in np.asarray(boxes):
        best, best_area = None, None
        for i, (c, (cx, cy), area) in enumerate(infos):
            if i in used:
                continue
            if x0 < cx < x1 and y0 < cy < y1:
                if best is None or area > best_area:
                    if best is not None:
                        used.discard(best)
                    best, best_area = i, area
                    used.add(i)
        if best is not None:
            out.append(infos[best][0])
    return out


def contours_to_polygons(contours: list, height: int, width: int) -> list[list[float]]:
    """Flatten + normalize contour points (image_manipulation.py:162-169)."""
    polys = []
    for c in contours:
        flat = c.reshape(-1, 2).astype(np.float64)
        flat[:, 0] /= width
        flat[:, 1] /= height
        polys.append(flat.reshape(-1).tolist())
    return polys


def write_yolo_seg_labels(label_path: str | Path, mask: np.ndarray,
                          boxes: np.ndarray, cls: int = 0) -> int:
    """Write one YOLO-seg label file; returns the number of instances."""
    h, w = mask.shape[:2]
    contours = mask_and_boxes_to_contours(mask, boxes)
    polys = contours_to_polygons(contours, h, w)
    with open(label_path, "w") as f:
        for p in polys:
            f.write(f"{cls} " + " ".join(f"{v:.6f}" for v in p) + "\n")
    return len(polys)


def dataset_sanity_check(root: str | Path,
                         subdirs=("images", "masks", "labels"),
                         delete: bool = False) -> list[str]:
    """Find (optionally delete) samples missing any artifact
    (yolo_data_sanity.py:14-28 semantics)."""
    root = Path(root)
    stems = {}
    for sub in subdirs:
        d = root / sub
        stems[sub] = ({f.rsplit(".", 1)[0] for f in os.listdir(d)}
                      if d.is_dir() else set())
    complete = set.intersection(*stems.values()) if stems else set()
    bad = sorted(set.union(*stems.values()) - complete)
    if delete:
        for sub in subdirs:
            d = root / sub
            if not d.is_dir():
                continue
            for f in os.listdir(d):
                if f.rsplit(".", 1)[0] in bad:
                    (d / f).unlink()
    return bad


def write_yolo_dataset_yaml(path: str | Path, root: str | Path,
                            names=("flower",)) -> None:
    """The dataset config the reference keeps in config/flower_seg_yolo.yaml."""
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump({"path": str(root), "train": "images/train",
                        "val": "images/val", "nc": len(names),
                        "names": list(names)}, f)


def load_yolo_seg_dataset(root: str | Path, split: str, image_size: int,
                          max_gt: int = 16, proto_stride: int = 4) -> dict:
    """Load a YOLO-seg layout dir into fixed-shape training arrays for
    flope_tpu.train.yolo_train: images resized (stretch) to image_size, boxes
    scaled, instance masks rasterized from polygons at proto resolution."""
    import cv2
    from PIL import Image

    root = Path(root)
    img_dir = root / "images" / split
    lab_dir = root / "labels" / split
    names = sorted(os.listdir(img_dir))
    ps = image_size // proto_stride
    images, gt_boxes, gt_valid, gt_masks = [], [], [], []
    for fname in names:
        stem = fname.rsplit(".", 1)[0]
        img = np.asarray(Image.open(img_dir / fname))[..., :3]
        h, w = img.shape[:2]
        img_r = cv2.resize(img, (image_size, image_size))
        boxes = np.zeros((max_gt, 4), np.float32)
        valid = np.zeros((max_gt,), bool)
        masks = np.zeros((max_gt, ps, ps), np.float32)
        lab = lab_dir / f"{stem}.txt"
        if lab.exists():
            for i, line in enumerate(lab.read_text().splitlines()[:max_gt]):
                vals = line.split()
                poly = np.array(vals[1:], np.float32).reshape(-1, 2)
                pts_px = (poly * [image_size, image_size]).astype(np.int32)
                boxes[i] = [pts_px[:, 0].min(), pts_px[:, 1].min(),
                            pts_px[:, 0].max(), pts_px[:, 1].max()]
                valid[i] = True
                m = np.zeros((ps, ps), np.uint8)
                cv2.fillPoly(m, [(poly * [ps, ps]).astype(np.int32)], 1)
                masks[i] = m
        images.append(img_r.astype(np.float32) / 255.0)
        gt_boxes.append(boxes)
        gt_valid.append(valid)
        gt_masks.append(masks)
    return {"images": np.stack(images), "boxes": np.stack(gt_boxes),
            "valid": np.stack(gt_valid), "masks": np.stack(gt_masks)}
