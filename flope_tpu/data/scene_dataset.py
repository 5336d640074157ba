"""Scene-level training/eval samples with homography augmentation.

Re-creation of the reference FlowerAttnDataset (dataset/flower_attn_dataset.py):
each sample is a full frame pushed through a random virtual camera rotation
(Rx, Ry in ±10 deg, Rz in ±180 deg, flower_attn_dataset.py:121-124), an
in-quad random crop window (:130-131), GT poses rotated into the virtual
camera (:127), visibility filtering by projecting detections and matching
GT centers < 20 px (:184-195), yaw-nullification (:246) and padding to a
fixed number of pose slots (15 in the reference, :277-285; configurable here).

Sources: a synthetic scene (exact GT) or a reference-layout dataset dir.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from flope_tpu.data.sampling import sample_rectangle
from flope_tpu.data.synthetic import SyntheticScene, orbit_camera, render_frame

__all__ = ["SceneSampleConfig", "SceneSample", "make_scene_sample"]


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
