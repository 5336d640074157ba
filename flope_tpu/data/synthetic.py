"""Synthetic flower-scene generator: ground truth for tests, training and eval.

The reference's datasets (rgb/depth/pose dirs, gt_poses.npy) are captures that
don't ship with the code, so the framework carries its own ground-truth
factory: a pure-numpy renderer that places oriented "flowers" in a world
frame, renders RGB (with a rotation-dependent shading pattern so PoseNet has a
learnable signal), a ray-distance depth map (matching the distance-along-ray
semantics of mvg.py:387-408), a segmentation mask and boxes — everything the
pipeline, the tracker, the metrics harness (generate_metrics.py) and the
trainer consume.

Also doubles as the dataset-on-disk writer for the reference's directory
contract (DatasetPath, utils/io.py:11-60) via `write_dataset`.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

from flope_tpu.utils import io as fio

__all__ = ["SyntheticScene", "FrameData", "render_frame", "orbit_camera", "write_dataset"]


@dataclasses.dataclass
class SyntheticScene:
    """World model: N flowers with fixed world poses + camera intrinsics."""

    K: np.ndarray                 # (3,3)
    height: int
    width: int
    positions: np.ndarray         # (N,3) world, meters
    rotations: np.ndarray         # (N,3,3) world
    radius_m: float = 0.04        # physical flower radius

    @staticmethod
    def random(rng: np.random.Generator, n_flowers: int = 5,
               height: int = 480, width: int = 640,
               spread: float = 0.35, distance: float = 1.0) -> "SyntheticScene":
        from scipy.spatial.transform import Rotation as sciR
        fx = fy = 0.9 * width
        K = np.array([[fx, 0, width / 2.0], [0, fy, height / 2.0], [0, 0, 1.0]])
        # Cluster of flowers around the world origin plane z ~ 0.
        pos = np.zeros((n_flowers, 3))
        pos[:, :2] = rng.uniform(-spread, spread, size=(n_flowers, 2))
        pos[:, 2] = rng.uniform(-0.1, 0.1, size=n_flowers)
        rot = sciR.random(n_flowers, random_state=np.random.RandomState(
            int(rng.integers(1 << 30)))).as_matrix()
        del distance
        return SyntheticScene(K=K, height=height, width=width,
                              positions=pos, rotations=rot)


@dataclasses.dataclass
class FrameData:
    """One rendered frame + its ground truth."""

    rgb: np.ndarray           # (H,W,3) uint8
    depth_mm: np.ndarray      # (H,W) uint16-ranged float: ray distance in mm
    mask: np.ndarray          # (H,W) uint8 {0,255} union of flower discs
    boxes: np.ndarray         # (D,4) int32 xyxy (padded)
    valid: np.ndarray         # (D,) bool
    gt_poses_cam: np.ndarray  # (D,4,4) camera-frame GT poses (padded identity)
    gt_poses_world: np.ndarray  # (D,4,4)
    centers_uv: np.ndarray    # (D,2) projected centers
    cam_pose: np.ndarray      # (4,4) camera-to-world


def orbit_camera(scene: SyntheticScene, angle_rad: float, radius: float = 1.0,
                 height: float = 0.35) -> np.ndarray:
    """Camera-to-world pose orbiting the flower cluster, looking at the origin."""
    eye = np.array([radius * np.sin(angle_rad), radius * np.cos(angle_rad), -height])
    target = np.zeros(3)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up_hint = np.array([0.0, 0.0, -1.0])
    right = np.cross(fwd, up_hint)
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    # OpenCV convention: columns = camera x (right), y (down), z (forward).
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
    return c2w


def render_frame(scene: SyntheticScene, cam_pose: np.ndarray, max_det: int = 16,
                 noise: float = 0.0, rng: np.random.Generator | None = None) -> FrameData:
    """Rasterize the scene from a camera pose.

    Flowers render as discs whose shading encodes their camera-frame rotation:
    channel pattern follows the projected flower x-axis (in-plane angle) and
    the z-axis tilt, giving PoseNet a recoverable orientation signal. Depth is
    the **ray distance of the flower center** across its disc, so masked depth
    pooling recovers the center distance exactly.
    """
    h, w = scene.height, scene.width
    n = scene.positions.shape[0]
    w2c = np.linalg.inv(cam_pose)

    rgb = np.zeros((h, w, 3), np.float32)
    rgb[..., :] = 40.0  # dark background
    depth = np.zeros((h, w), np.float32)
    mask = np.zeros((h, w), bool)

    ys, xs = np.mgrid[0:h, 0:w]
    boxes = np.zeros((max_det, 4), np.int32)
    valid = np.zeros((max_det,), bool)
    gt_cam = np.tile(np.eye(4), (max_det, 1, 1))
    gt_world = np.tile(np.eye(4), (max_det, 1, 1))
    centers = np.zeros((max_det, 2), np.float32)

    # Far-to-near painter's order so closer flowers occlude.
    t_cam_all = (w2c[:3, :3] @ scene.positions.T).T + w2c[:3, 3]
    order = np.argsort(-t_cam_all[:, 2])

    slot = 0
    for i in order:
        if slot >= max_det:
            break
        R_cam = w2c[:3, :3] @ scene.rotations[i]
        t_cam = t_cam_all[i]
        if t_cam[2] <= 0.05:
            continue  # behind / too close
        uvw = scene.K @ t_cam
        u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
        r_px = scene.K[0, 0] * scene.radius_m / t_cam[2]
        if r_px < 3:
            continue
        x0, y0 = int(u - r_px), int(v - r_px)
        x1, y1 = int(np.ceil(u + r_px)), int(np.ceil(v + r_px))
        if x1 <= 0 or y1 <= 0 or x0 >= w or y0 >= h:
            continue  # fully off-frame
        # Rasterize the disc.
        disc = (xs - u) ** 2 + (ys - v) ** 2 < r_px ** 2
        ray_dist = float(np.linalg.norm(t_cam))
        dxp, dyp = (xs - u) / max(r_px, 1e-6), (ys - v) / max(r_px, 1e-6)
        shade = _orientation_shading(R_cam, dxp, dyp)
        for c in range(3):
            rgb[..., c] = np.where(disc, shade[..., c], rgb[..., c])
        depth = np.where(disc, ray_dist * 1000.0, depth)  # mm
        mask |= disc

        boxes[slot] = [max(x0, 0), max(y0, 0), min(x1, w), min(y1, h)]
        valid[slot] = True
        gt_cam[slot, :3, :3] = R_cam
        gt_cam[slot, :3, 3] = t_cam
        gt_world[slot, :3, :3] = scene.rotations[i]
        gt_world[slot, :3, 3] = scene.positions[i]
        centers[slot] = [u, v]
        slot += 1

    if noise > 0 and rng is not None:
        rgb = rgb + rng.normal(0, noise * 255, rgb.shape)
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    return FrameData(
        rgb=rgb,
        depth_mm=depth,
        mask=(mask.astype(np.uint8)) * 255,
        boxes=boxes,
        valid=valid,
        gt_poses_cam=gt_cam,
        gt_poses_world=gt_world,
        centers_uv=centers,
        cam_pose=cam_pose,
    )


def _orientation_shading(R_cam: np.ndarray, dxp: np.ndarray,
                         dyp: np.ndarray) -> np.ndarray:
    """Rotation-encoding disc texture, shared by scene and crop renderers.

    Each disc pixel at local coordinates (u, v) (the flower's own frame) is
    colored by the camera-frame direction of that surface point:
    d = u * R[:,0] + v * R[:,1], channels = 128 + 100 * d. This makes the
    full rotation linearly recoverable from the image (no two rotations
    produce the same texture), so PoseNet's synthetic task is well-posed.
    """
    d = dxp[..., None] * R_cam[:, 0][None, None] \
        + dyp[..., None] * R_cam[:, 1][None, None]  # (..., 3)
    return 128.0 + 100.0 * np.clip(d, -1.0, 1.0)


def render_flower_crop(R_cam: np.ndarray, size: int = 512,
                       fill: float = 0.85,
                       center_offset: tuple[float, float] = (0.0, 0.0)) -> np.ndarray:
    """Render one masked flower crop (the PoseNet training-sample format:
    512^2 bg-zeroed crops, dataset/posenet_flower_dataset.py) with the same
    orientation shading as `render_frame`, so crop-trained PoseNets transfer
    to full scenes. center_offset (fractions of size) shifts the disc off
    center — box-jitter augmentation emulating imperfect detector boxes.
    Returns (size, size, 3) uint8."""
    u = size / 2.0 + center_offset[0] * size
    v = size / 2.0 + center_offset[1] * size
    r_px = fill * size / 2.0
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    disc = (xs - u) ** 2 + (ys - v) ** 2 < r_px ** 2
    dxp, dyp = (xs - u) / r_px, (ys - v) / r_px
    shade = _orientation_shading(R_cam, dxp, dyp)
    rgb = np.where(disc[..., None], shade, 0.0)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def write_dataset(out_dir: str | Path, n_frames: int = 20, n_flowers: int = 5,
                  seed: int = 0, height: int = 480, width: int = 640,
                  max_det: int = 16, with_detections: bool = False) -> Path:
    """Write a reference-layout dataset dir (rgb/ depth/ mask/ pose/
    intrinsics.yaml gt_poses.npy bad.txt) — the on-disk contract of
    DatasetPath (utils/io.py:11-60), consumable by the CLI scripts.

    with_detections additionally writes detection/ (Nx15 bbox4+uv2+rotmat9,
    the test_posenet.py:150-161 format) and depth_val/ ((2,N) values +
    reliable flags, extract_depth.py:50-57 format) from ground truth — a
    perfect-pipeline stand-in so downstream stages (align_measurements,
    scene_dataset disk source) can run without inference."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    scene = SyntheticScene.random(rng, n_flowers, height, width)
    out = Path(out_dir)
    subs = ["rgb", "depth", "mask", "pose"]
    if with_detections:
        subs += ["detection", "depth_val"]
    for sub in subs:
        (out / sub).mkdir(parents=True, exist_ok=True)

    for f in range(n_frames):
        ang = 2 * np.pi * f / max(n_frames, 1)
        frame = render_frame(scene, orbit_camera(scene, ang), max_det=max_det)
        name = f"frame_{f:05d}"
        Image.fromarray(frame.rgb).save(out / "rgb" / f"{name}.png")
        np.save(out / "depth" / f"{name}.npy", frame.depth_mm.astype(np.float32) / 1000.0)
        Image.fromarray(frame.mask).save(out / "mask" / f"{name}.png")
        # Camera pose txt: flat R9 + t3 (utils/io.py:69-80 load_pose format).
        flat = np.concatenate([frame.cam_pose[:3, :3].reshape(-1),
                               frame.cam_pose[:3, 3]])
        np.savetxt(out / "pose" / f"{name}.txt", flat)
        if with_detections:
            v = frame.valid
            rows = np.concatenate([
                frame.boxes[v].astype(np.float64),
                frame.centers_uv[v].astype(np.float64),
                frame.gt_poses_cam[v, :3, :3].reshape(-1, 9),
            ], axis=1)
            np.savetxt(out / "detection" / f"{name}.txt", rows, fmt="%.7f")
            dval = np.linalg.norm(frame.gt_poses_cam[v, :3, 3], axis=-1)
            np.savetxt(out / "depth_val" / f"{name}.txt",
                       np.vstack([dval, np.ones_like(dval)]))

    fio.write_intrinsics_yaml(out / "intrinsics.yaml", scene.K, height, width)
    gt = np.tile(np.eye(4), (n_flowers, 1, 1))
    gt[:, :3, :3] = scene.rotations
    gt[:, :3, 3] = scene.positions
    np.save(out / "gt_poses.npy", gt)
    (out / "bad.txt").write_text("")
    (out / "scene.json").write_text(json.dumps({
        "n_flowers": n_flowers, "seed": seed, "height": height, "width": width,
    }))
    return out


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Generate a synthetic flower dataset")
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--flowers", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    args = p.parse_args()
    path = write_dataset(args.out, args.frames, args.flowers, args.seed,
                         args.height, args.width)
    print(f"wrote synthetic dataset to {path}")
