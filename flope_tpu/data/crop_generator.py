"""PoseNet training-crop generator from scene datasets.

Re-creation of the reference's crop-dataset factories
(dataset/posenet_data_generator.py — ArUco-GT route — and
dataset/posenet_labeled_data.py — gt_poses.npy route): for each frame of a
reference-layout dataset, transform world GT flower poses into the camera,
match them to detected mask components (<20 px center distance, the
visibility rule of flower_attn_dataset.py:184-195), optionally apply a
pose-consistent homography rotation augmentation
(posenet_data_generator.py:234-245), cut masked square crops, yaw-nullify the
GT rotation (posenet_data_generator.py:418) and write the PoseNet training
layout (images/ poses/ intrinsics/) with crop intrinsics.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["generate_crop_dataset"]


def generate_crop_dataset(data_dir: str | Path, out_dir: str | Path,
                          crop_size: int = 512, augment_copies: int = 0,
                          tilt_deg: float = 10.0, inplane_deg: float = 180.0,
                          match_px: float = 20.0, seed: int = 0,
                          min_box: int = 12) -> int:
    """Returns the number of crops written."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from scipy.spatial.transform import Rotation as sciR

    from flope_tpu.geometry import (crop_intrinsics, invert_pose, nullify_yaw,
                                    project_3d_to_2d, squarify_boxes,
                                    boxes_in_frame)
    from flope_tpu.geometry.homography import rotate_image_and_poses
    from flope_tpu.pipeline.precomputed import boxes_from_mask
    from flope_tpu.utils.io import DatasetPaths, load_pose, read_intrinsics_yaml, pth

    rng = np.random.default_rng(seed)
    data = DatasetPaths(data_dir)
    out = Path(out_dir)
    for sub in ["images", "poses", "intrinsics"]:
        (out / sub).mkdir(parents=True, exist_ok=True)
    K, h, w = read_intrinsics_yaml(data.intrin)
    Kj = jnp.asarray(K, jnp.float32)
    gt_world = np.load(data.gt_poses)

    count = 0
    for name in data.files:
        rgb = np.asarray(Image.open(pth(data.rgb, name, "png")), np.float32)[..., :3]
        mask = np.asarray(Image.open(pth(data.mask, name, "png")))
        if mask.ndim == 3:
            mask = mask[..., 0]
        cam = load_pose(pth(data.pose, name, "txt"))
        w2c = np.asarray(invert_pose(jnp.asarray(cam)))
        gt_cam = w2c @ gt_world  # (N,4,4)

        variants = [(rgb, mask.astype(np.float32),
                     gt_cam[:, :3, :3], gt_cam[:, :3, 3])]
        for _ in range(augment_copies):
            ang = jnp.asarray([rng.uniform(-tilt_deg, tilt_deg),
                               rng.uniform(-tilt_deg, tilt_deg),
                               rng.uniform(-inplane_deg, inplane_deg)],
                              jnp.float32)
            img_w, mask_w, Rs, ts, _ = rotate_image_and_poses(
                jnp.asarray(rgb), Kj, ang,
                Rs=jnp.asarray(gt_cam[:, :3, :3], jnp.float32),
                ts=jnp.asarray(gt_cam[:, :3, 3], jnp.float32),
                mask=jnp.asarray(mask.astype(np.float32)))
            variants.append((np.asarray(img_w), np.asarray(mask_w),
                             np.asarray(Rs), np.asarray(ts)))

        for vi, (img, msk, Rs, ts) in enumerate(variants):
            msk_u8 = np.clip(msk, 0, 255).astype(np.uint8)
            boxes, valid = boxes_from_mask(msk_u8, max_det=32)
            boxes = boxes[valid]
            if len(boxes) == 0:
                continue
            centers = np.stack([(boxes[:, 0] + boxes[:, 2]) / 2.0,
                                (boxes[:, 1] + boxes[:, 3]) / 2.0], axis=1)
            front = ts[:, 2] > 0.05
            uv = np.asarray(project_3d_to_2d(jnp.asarray(ts), Kj,
                                             jnp.eye(3), jnp.zeros(3)))
            sq = np.asarray(squarify_boxes(jnp.asarray(boxes)))
            inframe = np.asarray(boxes_in_frame(jnp.asarray(sq), h, w))
            for gi in np.where(front)[0]:
                d = np.linalg.norm(centers - uv[gi], axis=1)
                bi = int(np.argmin(d))
                if d[bi] > match_px or not inframe[bi]:
                    continue
                x0, y0, x1, y1 = sq[bi]
                if x1 - x0 < min_box:
                    continue
                import cv2
                crop = cv2.resize(img[y0:y1, x0:x1], (crop_size, crop_size),
                                  interpolation=cv2.INTER_LANCZOS4)
                mcrop = cv2.resize(msk_u8[y0:y1, x0:x1], (crop_size, crop_size),
                                   interpolation=cv2.INTER_LANCZOS4)
                nobg = crop * (mcrop[..., None] / 255.0)
                R_nn = np.asarray(nullify_yaw(jnp.asarray(Rs[gi])))
                q = sciR.from_matrix(R_nn).as_quat()
                Kc = np.asarray(crop_intrinsics(
                    Kj, jnp.asarray([float(x0), float(y0)]),
                    crop_size / max(x1 - x0, 1)))
                stem = f"{name}_v{vi}_{gi:02d}"
                Image.fromarray(np.clip(nobg, 0, 255).astype(np.uint8)).save(
                    out / "images" / f"{stem}.png")
                np.savetxt(out / "poses" / f"{stem}.txt",
                           np.concatenate([q, ts[gi]])[None], delimiter="\t")
                np.savetxt(out / "intrinsics" / f"{stem}.txt",
                           np.array([[Kc[0, 0], Kc[1, 1], Kc[0, 2], Kc[1, 2]]]),
                           delimiter="\t")
                count += 1
    return count


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Generate PoseNet crops from a scene dataset")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--crop", type=int, default=512)
    p.add_argument("--augment", type=int, default=0)
    args = p.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    n = generate_crop_dataset(args.data_dir, args.out, args.crop, args.augment)
    print(f"wrote {n} crops to {args.out}")
