"""Scene-level training/eval samples with homography augmentation.

Re-creation of the reference FlowerAttnDataset (dataset/flower_attn_dataset.py):
each sample is a full frame pushed through a random virtual camera rotation
(Rx, Ry in ±10 deg, Rz in ±180 deg, flower_attn_dataset.py:121-124), an
in-quad random crop window (:130-131), GT poses rotated into the virtual
camera (:127), visibility filtering by projecting detections and matching
GT centers < 20 px (:184-195), yaw-nullification (:246) and padding to a
fixed number of pose slots (15 in the reference, :277-285; configurable here).

Sources: a synthetic scene (exact GT) or a reference-layout dataset dir
(`make_scene_sample_from_disk`: rgb/mask/detection/depth-npy x splat-scale/
pose/gt_poses.npy — the reference's real-capture path,
flower_attn_dataset.py:33-37,61-69,184-195).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

from flope_tpu.data.sampling import sample_rectangle
from flope_tpu.data.synthetic import SyntheticScene, orbit_camera, render_frame
from flope_tpu.utils.io import DatasetPaths, load_pose, pth, read_intrinsics_yaml

__all__ = ["SceneSampleConfig", "SceneSample", "make_scene_sample",
           "make_scene_sample_from_disk", "load_splat_scale"]


@dataclasses.dataclass
class SceneSampleConfig:
    """flower_attn_dataset.py defaults."""

    max_poses: int = 15          # fixed pose-slot padding (:277-285)
    tilt_deg: float = 10.0       # Rx, Ry range (:121-122)
    inplane_deg: float = 180.0   # Rz range (:123)
    crop_size: int = 256         # crop window side
    visibility_px: float = 20.0  # GT-to-detection match radius (:184-195)


@dataclasses.dataclass
class SceneSample:
    image: np.ndarray        # (S, S, 3) uint8 cropped from the warped frame
    mask: np.ndarray         # (S, S) uint8
    depth: np.ndarray        # (S, S) float meters
    poses: np.ndarray        # (max_poses, 4, 4) camera-frame, yaw-nullified
    valid: np.ndarray        # (max_poses,)
    K_crop: np.ndarray       # (3, 3) crop intrinsics
    n: int


def make_scene_sample(scene: SyntheticScene, cam_angle: float,
                      rng: np.random.Generator,
                      cfg: SceneSampleConfig = SceneSampleConfig()
                      ) -> SceneSample | None:
    """Render a frame and apply the FlowerAttnDataset augmentation chain."""
    import jax.numpy as jnp

    from flope_tpu.geometry import nullify_yaw, project_3d_to_2d, crop_intrinsics
    from flope_tpu.geometry.homography import rotate_image_and_poses

    frame = render_frame(scene, orbit_camera(scene, cam_angle), max_det=16)
    gv = frame.valid
    if not gv.any():
        return None
    Rs = frame.gt_poses_cam[gv, :3, :3]
    ts = frame.gt_poses_cam[gv, :3, 3]

    # Random virtual camera rotation (:121-124).
    ang = np.array([rng.uniform(-cfg.tilt_deg, cfg.tilt_deg),
                    rng.uniform(-cfg.tilt_deg, cfg.tilt_deg),
                    rng.uniform(-cfg.inplane_deg, cfg.inplane_deg)])
    K = jnp.asarray(scene.K, jnp.float32)
    stacked = np.concatenate([frame.rgb.astype(np.float32),
                              frame.mask[..., None].astype(np.float32),
                              frame.depth_mm[..., None].astype(np.float32) / 1000.0],
                             axis=-1)
    warped, _, Rs_new, ts_new, corners = rotate_image_and_poses(
        jnp.asarray(stacked), K, jnp.asarray(ang, jnp.float32),
        Rs=jnp.asarray(Rs, jnp.float32), ts=jnp.asarray(ts, jnp.float32))
    warped = np.asarray(warped)
    Rs_new = np.asarray(Rs_new)
    ts_new = np.asarray(ts_new)
    corners = np.asarray(corners)

    # Random crop window fully inside the warped quad (:130-131).
    rect = sample_rectangle(corners, cfg.crop_size, cfg.crop_size, rng)
    if rect is None:
        return None
    x0, y0 = int(round(rect[0])), int(round(rect[1]))
    x0 = np.clip(x0, 0, scene.width - cfg.crop_size)
    y0 = np.clip(y0, 0, scene.height - cfg.crop_size)
    crop = warped[y0:y0 + cfg.crop_size, x0:x0 + cfg.crop_size]
    image = np.clip(crop[..., :3], 0, 255).astype(np.uint8)
    mask = np.clip(crop[..., 3], 0, 255).astype(np.uint8)
    depth = crop[..., 4]

    # Visibility filter: projected GT centers inside the crop (:184-195).
    uv = np.asarray(project_3d_to_2d(jnp.asarray(ts_new), K,
                                     jnp.eye(3), jnp.zeros(3)))
    vis = ((uv[:, 0] >= x0) & (uv[:, 0] < x0 + cfg.crop_size)
           & (uv[:, 1] >= y0) & (uv[:, 1] < y0 + cfg.crop_size)
           & (ts_new[:, 2] > 0.05))

    # Yaw-nullify GT rotations (:246).
    Rs_out = np.asarray(nullify_yaw(jnp.asarray(Rs_new[vis])))
    ts_out = ts_new[vis]
    n = min(len(Rs_out), cfg.max_poses)

    poses = np.tile(np.eye(4), (cfg.max_poses, 1, 1))
    valid = np.zeros(cfg.max_poses, bool)
    poses[:n, :3, :3] = Rs_out[:n]
    poses[:n, :3, 3] = ts_out[:n]
    valid[:n] = True

    K_crop = np.asarray(crop_intrinsics(jnp.asarray(scene.K, jnp.float32),
                                        jnp.asarray([float(x0), float(y0)]),
                                        1.0))
    return SceneSample(image=image, mask=mask, depth=depth, poses=poses,
                       valid=valid, K_crop=K_crop, n=n)


def load_splat_scale(dataset_dir) -> float:
    """Depth multiplier from the Gaussian-splat dataparser transforms.

    The reference scales depth .npy files by 1/scale from
    dataparser_transforms.json (flower_attn_dataset.py:33-37). Returns 1.0
    when the file is absent (metric-depth datasets, e.g. the synthetic
    writer's output).
    """
    p = Path(dataset_dir) / "dataparser_transforms.json"
    if not p.exists():
        return 1.0
    return 1.0 / float(json.loads(p.read_text())["scale"])


def make_scene_sample_from_disk(data: DatasetPaths, name: str,
                                rng: np.random.Generator,
                                cfg: SceneSampleConfig = SceneSampleConfig(),
                                splat_scale: float | None = None
                                ) -> SceneSample | None:
    """The reference's disk-dataset sample chain (flower_attn_dataset.py:57-288).

    Per frame: rgb + mask + detection txt (Nx15: bbox4+uv2+rotmat9, the
    test_posenet.py:150-161 contract) + depth .npy x splat-scale + depth_val
    txt (2,N) + camera pose + gt_poses.npy. Detected-flower 3D points come
    from the detection centers lifted by the pooled depth (:73-76); GT poses
    are moved to the camera frame (:88), both are pushed through the random
    homography rotation, and GT flowers are kept when the nearest projected
    DETECTION is within `visibility_px` and inside the crop window
    (:174-195) — matching against real detections, not projected GT.
    """
    import jax.numpy as jnp
    from PIL import Image

    from flope_tpu.geometry import (crop_intrinsics, nullify_yaw,
                                    points3d_from_ray_depth)
    from flope_tpu.geometry.homography import (rotation_homography,
                                               transform_corners,
                                               warp_perspective)

    if splat_scale is None:
        splat_scale = load_splat_scale(data.dataset)

    # ---- Read one frame (flower_attn_dataset.py:61-69) ---------------------
    rgb_path = pth(data.rgb, name, "png")
    if not rgb_path.exists():
        rgb_path = pth(data.rgb, name, "jpg")
    img = np.asarray(Image.open(rgb_path).convert("RGB"), np.float32)
    mask = np.asarray(Image.open(pth(data.mask, name, "png")), np.float32)
    if mask.ndim == 3:
        mask = mask[..., 0]
    det = np.loadtxt(pth(data.det, name, "txt"))
    if det.size == 0:
        return None
    if det.ndim == 1:
        det = det[None]
    depth = np.load(pth(data.depth, name, "npy")).astype(np.float32) * splat_scale
    dv = np.loadtxt(pth(data.depth_val, name, "txt"))
    if dv.ndim == 1:
        dv = dv[:, None]
    depth_val = dv[0] * splat_scale
    pose = load_pose(pth(data.pose, name, "txt"))
    K_np, h, w = read_intrinsics_yaml(data.intrin)
    gt_poses = np.load(data.gt_poses)

    # ---- Detected flowers in 3D from this view (:72-76) --------------------
    depth_val = np.where(depth_val == 0, 1e-3, depth_val)
    uv = det[:, 4:6]
    K = jnp.asarray(K_np, jnp.float32)
    xyz = np.asarray(points3d_from_ray_depth(
        jnp.asarray(uv, jnp.float32), jnp.asarray(depth_val, jnp.float32), K))

    # ---- GT world -> camera (:88) -------------------------------------------
    gt_cam = np.linalg.inv(pose) @ gt_poses

    # ---- Random virtual-camera rotation (:121-129) --------------------------
    ang = np.array([rng.uniform(-cfg.tilt_deg, cfg.tilt_deg),
                    rng.uniform(-cfg.tilt_deg, cfg.tilt_deg),
                    rng.uniform(-cfg.inplane_deg, cfg.inplane_deg)], np.float32)
    H, R_rot = rotation_homography(K, jnp.asarray(ang))
    stacked = np.concatenate([img, mask[..., None], depth[..., None]], axis=-1)
    warped = np.asarray(warp_perspective(jnp.asarray(stacked), H))
    corners = np.asarray(transform_corners(h, w, H))
    R_rot = np.asarray(R_rot)
    gt_R_new = R_rot @ gt_cam[:, :3, :3]
    gt_t_new = gt_cam[:, :3, 3] @ R_rot.T
    xyz_rot = xyz @ R_rot.T

    # ---- Crop window inside the warped quad (:130-150) ---------------------
    corners = np.stack([np.clip(corners[:, 0], 0, w),
                        np.clip(corners[:, 1], 0, h)], axis=1)  # bound_corners
    rect = sample_rectangle(corners, cfg.crop_size, cfg.crop_size, rng)
    if rect is None:
        return None
    x0 = int(np.clip(round(rect[0]), 0, w - cfg.crop_size))
    y0 = int(np.clip(round(rect[1]), 0, h - cfg.crop_size))
    crop = warped[y0:y0 + cfg.crop_size, x0:x0 + cfg.crop_size]
    image = np.clip(crop[..., :3], 0, 255).astype(np.uint8)
    mask_c = np.clip(crop[..., 3], 0, 255).astype(np.uint8)
    depth_c = crop[..., 4]

    # ---- Visibility: detections in-window, GT matched < 20 px (:174-195) ---
    det_proj = (K_np @ xyz_rot.T).T
    det_proj = det_proj[:, :2] / det_proj[:, 2:3]
    in_window = ((det_proj[:, 0] > x0) & (det_proj[:, 0] < x0 + cfg.crop_size)
                 & (det_proj[:, 1] > y0) & (det_proj[:, 1] < y0 + cfg.crop_size))
    gt_proj = (K_np @ gt_t_new.T).T
    gt_proj = gt_proj[:, :2] / gt_proj[:, 2:3]
    dists = np.linalg.norm(det_proj[:, None] - gt_proj[None, :], axis=-1)
    nearest = np.argmin(dists, axis=1)
    matched = dists[np.arange(len(nearest)), nearest] < cfg.visibility_px
    keep = in_window & matched
    if not keep.any():
        return None
    Rs_out = gt_R_new[nearest[keep]]
    ts_out = gt_t_new[nearest[keep]]

    # ---- Yaw-nullify + fixed-slot padding (:246, :277-285) -----------------
    Rs_out = np.asarray(nullify_yaw(jnp.asarray(Rs_out, jnp.float32)))
    n = min(len(Rs_out), cfg.max_poses)
    poses = np.tile(np.eye(4), (cfg.max_poses, 1, 1))
    valid = np.zeros(cfg.max_poses, bool)
    poses[:n, :3, :3] = Rs_out[:n]
    poses[:n, :3, 3] = ts_out[:n]
    valid[:n] = True

    K_crop = np.asarray(crop_intrinsics(K, jnp.asarray([float(x0), float(y0)]),
                                        1.0))
    return SceneSample(image=image, mask=mask_c, depth=depth_c, poses=poses,
                       valid=valid, K_crop=K_crop, n=n)
