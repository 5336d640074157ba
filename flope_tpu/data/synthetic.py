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

__all__ = ["SyntheticScene", "FrameData", "DomainConfig", "render_frame",
           "orbit_camera", "write_dataset"]


@dataclasses.dataclass(frozen=True)
class DomainConfig:
    """Rendering-domain difficulty knobs.

    `flat()` is the legacy renderer (flat-shaded discs on a uniform dark
    background, noiseless) kept bit-compatible for fast tests and perf
    benches. `hard()` stresses the stack the way the reference's real
    greenhouse captures do (flower_attn_dataset.py:61-69): petal-structured
    flowers with true perspective foreshortening and per-pixel depth,
    world-anchored leaf distractors that occlude, procedural foliage
    background, per-frame lighting/exposure variation, sensor noise, blur,
    and occlusion-based GT visibility filtering.
    """

    petals: int = 0               # 0 = legacy disc; k = petal lobes
    petal_depth: float = 0.0      # boundary modulation amplitude in (0,1)
    background: str = "flat"      # "flat" | "foliage"
    n_distractors: int = 0        # world-anchored leaf blobs (occluders)
    lighting: float = 0.0         # per-frame gain/gradient/color-jitter scale
    noise: float = 0.0            # sensor noise std, fraction of 255
    blur_sigma: float = 0.0       # max per-frame gaussian blur sigma (px)
    depth_noise_mm: float = 0.0   # depth sensor noise std (mm)
    min_visible_frac: float = 0.0  # GT slots require this unoccluded fraction
    overlap_spread: float | None = None  # override cluster spread (occlusion)
    # Probability that a GT TRAINING crop (render_flower_crop) gets partial
    # leaf occlusion — elliptical bites removed from the mask exactly like
    # the deployed mask-zeroing of an occluding leaf. Deployment crops carry
    # occlusion (scene flowers are valid down to min_visible_frac) but the
    # plain GT crop renderer never did; detector-matched crops were the only
    # occluded training source, and their labels are noisy (PERF.md r5).
    crop_occlusion: float = 0.0

    def is_flat(self) -> bool:
        return (self.petals == 0 and self.background == "flat"
                and self.n_distractors == 0 and self.lighting == 0
                and self.noise == 0 and self.blur_sigma == 0
                and self.depth_noise_mm == 0)

    @staticmethod
    def flat() -> "DomainConfig":
        return DomainConfig()

    @staticmethod
    def hard() -> "DomainConfig":
        return DomainConfig(petals=5, petal_depth=0.35, background="foliage",
                            n_distractors=12, lighting=1.0, noise=0.02,
                            blur_sigma=1.2, depth_noise_mm=4.0,
                            min_visible_frac=0.25, overlap_spread=0.2)

    @staticmethod
    def named(name: str) -> "DomainConfig":
        if name == "flat":
            return DomainConfig.flat()
        if name == "hard":
            return DomainConfig.hard()
        raise ValueError(f"unknown domain preset {name!r} (flat|hard)")


@dataclasses.dataclass
class SyntheticScene:
    """World model: N flowers with fixed world poses + camera intrinsics."""

    K: np.ndarray                 # (3,3)
    height: int
    width: int
    positions: np.ndarray         # (N,3) world, meters
    rotations: np.ndarray         # (N,3,3) world
    radius_m: float = 0.04        # physical flower radius
    domain: DomainConfig = dataclasses.field(default_factory=DomainConfig)
    bg_seed: int = 0
    distractor_positions: np.ndarray | None = None   # (M,3)
    distractor_rotations: np.ndarray | None = None   # (M,3,3)
    distractor_radii: np.ndarray | None = None       # (M,)

    @staticmethod
    def random(rng: np.random.Generator, n_flowers: int = 5,
               height: int = 480, width: int = 640,
               spread: float = 0.35, distance: float = 1.0,
               domain: DomainConfig | None = None) -> "SyntheticScene":
        from scipy.spatial.transform import Rotation as sciR
        domain = domain or DomainConfig.flat()
        if domain.overlap_spread is not None:
            spread = domain.overlap_spread
        fx = fy = 0.9 * width
        K = np.array([[fx, 0, width / 2.0], [0, fy, height / 2.0], [0, 0, 1.0]])
        # Cluster of flowers around the world origin plane z ~ 0.
        pos = np.zeros((n_flowers, 3))
        pos[:, :2] = rng.uniform(-spread, spread, size=(n_flowers, 2))
        pos[:, 2] = rng.uniform(-0.1, 0.1, size=n_flowers)
        rot = sciR.random(n_flowers, random_state=np.random.RandomState(
            int(rng.integers(1 << 30)))).as_matrix()
        del distance
        dpos = drot = drad = None
        if domain.n_distractors > 0:
            m = domain.n_distractors
            dpos = np.zeros((m, 3))
            dpos[:, :2] = rng.uniform(-1.6 * spread, 1.6 * spread, size=(m, 2))
            # Some distractors sit in FRONT of the flower plane so they
            # genuinely occlude flowers from parts of the orbit.
            dpos[:, 2] = rng.uniform(-0.2, 0.15, size=m)
            drot = sciR.random(m, random_state=np.random.RandomState(
                int(rng.integers(1 << 30)))).as_matrix()
            drad = rng.uniform(0.025, 0.06, size=m)
        return SyntheticScene(K=K, height=height, width=width,
                              positions=pos, rotations=rot, domain=domain,
                              bg_seed=int(rng.integers(1 << 30)),
                              distractor_positions=dpos,
                              distractor_rotations=drot,
                              distractor_radii=drad)


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
    # Unoccluded fraction of each GT flower's rasterized pixels (hard domain
    # z-buffer ownership; flat scenes have near-zero overlap and report 1.0).
    # Diagnostic ground truth for recall-vs-occlusion analysis; padded 0.
    visible_frac: np.ndarray | None = None


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

    With a non-flat `scene.domain` the legacy disc rasterizer is replaced by
    the hard-domain renderer (`_render_frame_hard`): ray-plane intersection
    with a z-buffer, petal profiles, distractors, foliage background,
    lighting/noise/blur — and per-pixel TRUE ray-distance depth (center-depth
    recovery then holds only approximately, like a real sensor).
    """
    if not scene.domain.is_flat():
        return _render_frame_hard(scene, cam_pose, max_det=max_det, rng=rng)
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
        visible_frac=valid.astype(np.float32),
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


# ---------------------------------------------------------------------------
# Hard-domain renderer
# ---------------------------------------------------------------------------

def _petal_profile(theta: np.ndarray, petals: int, depth: float) -> np.ndarray:
    """Radial boundary r(theta) in (0,1]: `petals` lobes, unity at lobe tips."""
    if petals <= 0:
        return np.ones_like(theta)
    return (1.0 - depth) + depth * np.abs(np.cos(petals * theta / 2.0)) ** 0.8


def _flower_texture(R_cam: np.ndarray, lu: np.ndarray, lv: np.ndarray,
                    vu: np.ndarray, vv: np.ndarray,
                    domain: DomainConfig) -> np.ndarray:
    """Petal-modulated orientation shading.

    Shared by the scene renderer and the crop renderer so PoseNet's training
    distribution matches deployment. Two coordinate systems, deliberately:

    * (lu, lv) — the flower's OWN plane coordinates — drive the petal
      ridges, radial edge-darkening and the yellow center disc, so that
      structure rotates/foreshortens with the flower like a real surface.
    * (vu, vv) — VIEW-anchored normalized pixel offsets — drive the linear
      orientation shading (the flat domain's encoding, 128 + 100*(vu*R0 +
      vv*R1)). This anchoring is what keeps the task well-posed: a shading
      painted in (lu, lv) is invariant under body-yaw (the local frame and
      the basis rotate together and cancel), so with 5-fold-symmetric
      petals the image would determine R only up to 5 discrete yaw
      alternatives — making yaw-nullified labels contradictory (measured:
      training plateaus at ~70 deg). View-anchored shading makes the full
      rotation linearly recoverable, like the flat domain.
    """
    shade = _orientation_shading(R_cam, vu, vv)
    rho = np.hypot(lu, lv)
    theta = np.arctan2(lv, lu)
    ridges = 0.78 + 0.22 * np.abs(np.cos(domain.petals * theta / 2.0)) ** 0.8
    edge = 0.82 + 0.18 * np.clip(1.0 - rho ** 2, 0.0, 1.0)
    rgb = shade * (ridges * edge)[..., None]
    # Yellow flower center (smooth blend) — hides the orientation signal in
    # the middle like a real flower's disc florets hide petal structure.
    wc = np.clip((0.22 - rho) / 0.10, 0.0, 1.0)
    center_col = np.array([205.0, 175.0, 70.0])
    return rgb * (1.0 - wc[..., None]) + center_col * wc[..., None]


def _leaf_texture(R_cam: np.ndarray, lu: np.ndarray, lv: np.ndarray) -> np.ndarray:
    """Green leaf with a bright mid-vein and side-vein striping."""
    veins = 0.75 + 0.25 * np.abs(np.sin(9.0 * lv + 3.0 * lu))
    mid = 1.0 + 0.35 * np.clip(1.0 - np.abs(lv) / 0.08, 0.0, 1.0)
    base = np.array([52.0, 96.0, 44.0])
    tilt = 0.8 + 0.2 * abs(float(R_cam[2, 2]))
    return base * (veins * mid * tilt)[..., None]


_BG_CACHE: dict[tuple, np.ndarray] = {}


def _foliage_background(h: int, w: int, seed: int) -> np.ndarray:
    """Procedural foliage texture (H, W+pad, 3) float, cached per scene.

    Multi-octave value noise mapped through a soil->dark-leaf->lit-leaf
    palette. Wider than the frame so per-frame parallax can roll it.
    """
    key = (h, w, seed)
    if key in _BG_CACHE:
        return _BG_CACHE[key]
    from scipy.ndimage import zoom

    pad_w = w + w // 2
    rng = np.random.default_rng(seed)
    acc = np.zeros((h, pad_w), np.float32)
    for octave, cells in enumerate([7, 14, 28]):
        cw = max(int(cells * pad_w / h), 2)
        g = rng.standard_normal((cells, cw)).astype(np.float32)
        z = zoom(g, (h / cells, pad_w / cw), order=3)[:h, :pad_w]
        acc += z / (1.6 ** octave)
    acc = (acc - acc.min()) / max(float(np.ptp(acc)), 1e-6)
    # Palette ramp: soil brown -> dark leaf -> lit leaf. Per-channel 2-D
    # float32 ops: (H,W,1)x(3,) float64 broadcasts are ~50x slower on this
    # class of single-core host (terrible stride pattern).
    cols = np.array([[48.0, 40.0, 28.0], [30.0, 52.0, 26.0],
                     [80.0, 120.0, 62.0]], np.float32)
    t = np.clip(acc * 2.0, 0.0, 2.0)
    lo = np.clip(t, 0, 1)
    hi = np.clip(t - 1.0, 0, 1)
    bg = np.empty((h, pad_w, 3), np.float32)
    for c in range(3):
        v = cols[0, c] * (1 - lo) + cols[1, c] * lo
        bg[..., c] = v * (1 - hi) + cols[2, c] * hi
    _BG_CACHE[key] = bg
    return _BG_CACHE[key]


def _project_disc_bbox(K: np.ndarray, t_cam: np.ndarray, R_cam: np.ndarray,
                       r_m: float, petals: int, depth: float,
                       n_samples: int = 64):
    """Project the (petal-modulated) disc boundary; return float bbox or None."""
    theta = np.linspace(0, 2 * np.pi, n_samples, endpoint=False)
    r = _petal_profile(theta, petals, depth) * r_m
    pts = (t_cam[:, None]
           + R_cam[:, 0][:, None] * (r * np.cos(theta))
           + R_cam[:, 1][:, None] * (r * np.sin(theta)))  # (3, S)
    if (pts[2] <= 1e-3).any():
        return None
    uv = (K @ pts)
    uv = uv[:2] / uv[2]
    return float(uv[0].min()), float(uv[1].min()), float(uv[0].max()), float(uv[1].max())


def _raster_plane_object(K_inv: np.ndarray, t_cam: np.ndarray, R_cam: np.ndarray,
                         r_m: float, bbox, h: int, w: int,
                         petals: int, petal_depth: float):
    """Rasterize a planar disc object via exact ray-plane intersection.

    Returns (ys slice, xs slice, inside (hb,wb) bool, dist (hb,wb) ray
    distance m, lu, lv local plane coords) or None if off-frame/degenerate.
    """
    x0 = max(int(np.floor(bbox[0])), 0)
    y0 = max(int(np.floor(bbox[1])), 0)
    x1 = min(int(np.ceil(bbox[2])) + 1, w)
    y1 = min(int(np.ceil(bbox[3])) + 1, h)
    if x1 <= x0 or y1 <= y0:
        return None
    xs = np.arange(x0, x1, dtype=np.float32)
    ys = np.arange(y0, y1, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)
    dirs = np.stack([gx, gy, np.ones_like(gx)], axis=-1) @ K_inv.T  # (hb,wb,3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    n = R_cam[:, 2]
    dn = dirs @ n
    tn = float(t_cam @ n)
    safe = np.abs(dn) > 1e-5
    s = np.where(safe, tn / np.where(safe, dn, 1.0), -1.0)  # ray distance
    q = s[..., None] * dirs
    rel = q - t_cam
    lu = (rel @ R_cam[:, 0]) / r_m
    lv = (rel @ R_cam[:, 1]) / r_m
    rho = np.hypot(lu, lv)
    theta = np.arctan2(lv, lu)
    inside = safe & (s > 0.05) & (rho <= _petal_profile(theta, petals, petal_depth))
    if not inside.any():
        return None
    return slice(y0, y1), slice(x0, x1), inside, s, lu, lv


def _render_frame_hard(scene: SyntheticScene, cam_pose: np.ndarray,
                       max_det: int = 16,
                       rng: np.random.Generator | None = None) -> FrameData:
    """Hard-domain rasterizer (see DomainConfig.hard). Deterministic given
    (scene, cam_pose): the per-frame rng defaults to a hash of both."""
    dom = scene.domain
    h, w = scene.height, scene.width
    if rng is None:
        seed = (scene.bg_seed ^ int(abs(cam_pose).sum() * 1e6)) % (1 << 32)
        rng = np.random.default_rng(seed)
    w2c = np.linalg.inv(cam_pose)
    K_inv = np.linalg.inv(scene.K)

    # Background.
    if dom.background == "foliage":
        bg = _foliage_background(h, w, scene.bg_seed)
        yaw = float(np.arctan2(cam_pose[0, 3], cam_pose[1, 3] + 1e-9))
        shift = int((yaw % (2 * np.pi)) / (2 * np.pi) * (bg.shape[1] - w))
        rgb = bg[:, shift:shift + w].copy()
    else:
        rgb = np.full((h, w, 3), 40.0, np.float32)
    depth = np.zeros((h, w), np.float32)
    zbuf = np.full((h, w), np.inf, np.float32)
    idbuf = np.full((h, w), -1, np.int32)   # flower index or -1
    mask = np.zeros((h, w), bool)

    n = scene.positions.shape[0]
    t_cam_all = (w2c[:3, :3] @ scene.positions.T).T + w2c[:3, 3]

    # All plane objects (flowers carry their index; distractors carry -1)
    # through one z-buffered rasterizer — order-independent occlusion.
    objects = [(i, t_cam_all[i], w2c[:3, :3] @ scene.rotations[i],
                scene.radius_m, True) for i in range(n)]
    if scene.distractor_positions is not None:
        d_cam = (w2c[:3, :3] @ scene.distractor_positions.T).T + w2c[:3, 3]
        objects += [(-1, d_cam[j], w2c[:3, :3] @ scene.distractor_rotations[j],
                     float(scene.distractor_radii[j]), False)
                    for j in range(d_cam.shape[0])]

    raster_px = np.zeros(n, np.int64)   # own raster footprint (pre-occlusion)
    flower_info: dict[int, tuple] = {}  # idx -> (bbox, u, v, R_cam, t_cam)

    for idx, t_c, R_c, r_m, is_flower in objects:
        if t_c[2] <= 0.05:
            continue
        petals = dom.petals if is_flower else 2
        pdepth = dom.petal_depth if is_flower else 0.6
        bbox = _project_disc_bbox(scene.K, t_c, R_c, r_m, petals, pdepth)
        if bbox is None:
            continue
        if is_flower:
            uvw = scene.K @ t_c
            u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
            r_px = scene.K[0, 0] * r_m / t_c[2]
            if r_px < 3:
                continue
            flower_info[idx] = (bbox, u, v, R_c, t_c)
        out = _raster_plane_object(K_inv, t_c, R_c, r_m, bbox, h, w,
                                   petals, pdepth)
        if out is None:
            continue
        ysl, xsl, inside, s, lu, lv = out
        if is_flower:
            raster_px[idx] = int(inside.sum())
        sel = inside & (s < zbuf[ysl, xsl])
        if not sel.any():
            continue
        if is_flower:
            gx, gy = np.meshgrid(
                np.arange(xsl.start, xsl.stop, dtype=np.float32),
                np.arange(ysl.start, ysl.stop, dtype=np.float32))
            tex = _flower_texture(R_c, lu, lv, (gx - u) / r_px,
                                  (gy - v) / r_px, dom)
        else:
            tex = _leaf_texture(R_c, lu, lv)
        sub_rgb = rgb[ysl, xsl]
        sub_rgb[sel] = tex[sel]
        rgb[ysl, xsl] = sub_rgb
        sub = zbuf[ysl, xsl]
        sub[sel] = s[sel]
        zbuf[ysl, xsl] = sub
        sub_d = depth[ysl, xsl]
        sub_d[sel] = s[sel] * 1000.0
        depth[ysl, xsl] = sub_d
        sub_i = idbuf[ysl, xsl]
        sub_i[sel] = idx if is_flower else -1
        idbuf[ysl, xsl] = sub_i
        if is_flower:
            sub_m = mask[ysl, xsl]
            sub_m[sel] = True
            mask[ysl, xsl] = sub_m
    # Distractors may overwrite earlier flower pixels: rebuild the flower
    # mask from the final id buffer (occluded pixels drop out correctly).
    mask = idbuf >= 0

    # GT slot assignment (far-to-near like the flat path), with the
    # occlusion-visibility filter: a flower whose final visible fraction is
    # below min_visible_frac is NOT ground truth (matching the reference's
    # <20px detection-visibility filtering, flower_attn_dataset.py:184-195).
    boxes = np.zeros((max_det, 4), np.int32)
    valid = np.zeros((max_det,), bool)
    gt_cam = np.tile(np.eye(4), (max_det, 1, 1))
    gt_world = np.tile(np.eye(4), (max_det, 1, 1))
    centers = np.zeros((max_det, 2), np.float32)
    vis_frac = np.zeros((max_det,), np.float32)
    visible_px = np.bincount(idbuf[idbuf >= 0].ravel(), minlength=n) \
        if (idbuf >= 0).any() else np.zeros(n, np.int64)

    slot = 0
    for i in np.argsort(-t_cam_all[:, 2]):
        if slot >= max_det or i not in flower_info:
            continue
        if raster_px[i] == 0:
            continue
        frac = visible_px[i] / raster_px[i]
        if frac < dom.min_visible_frac or visible_px[i] < 12:
            continue
        vis_frac[slot] = frac
        bbox, u, v, R_c, t_c = flower_info[i]
        boxes[slot] = [max(int(bbox[0]), 0), max(int(bbox[1]), 0),
                       min(int(np.ceil(bbox[2])), w), min(int(np.ceil(bbox[3])), h)]
        valid[slot] = True
        gt_cam[slot, :3, :3] = R_c
        gt_cam[slot, :3, 3] = t_c
        gt_world[slot, :3, :3] = scene.rotations[i]
        gt_world[slot, :3, 3] = scene.positions[i]
        centers[slot] = [u, v]
        slot += 1

    # Per-frame imaging effects: lighting gain + directional gradient +
    # channel jitter, gaussian blur, sensor noise, depth noise.
    rgb = np.ascontiguousarray(rgb, np.float32)
    if dom.lighting > 0:
        gain = 1.0 + dom.lighting * rng.uniform(-0.35, 0.3)
        ang = rng.uniform(0, 2 * np.pi)
        rampx = (np.arange(w, dtype=np.float32) / max(w - 1, 1) - 0.5) * np.cos(ang)
        rampy = (np.arange(h, dtype=np.float32) / max(h - 1, 1) - 0.5) * np.sin(ang)
        scale = np.float32(gain) * (1.0 + np.float32(dom.lighting * 0.25)
                                    * (rampy[:, None] + rampx[None, :]))
        ch = 1.0 + dom.lighting * rng.uniform(-0.12, 0.12, size=3)
        for c in range(3):
            rgb[..., c] *= scale * np.float32(ch[c])
    if dom.blur_sigma > 0:
        from scipy.ndimage import gaussian_filter
        sigma = rng.uniform(0.0, dom.blur_sigma)
        if sigma > 0.05:
            rgb = gaussian_filter(rgb, sigma=(sigma, sigma, 0))
    if dom.noise > 0:
        rgb += np.float32(dom.noise * 255.0) * rng.standard_normal(
            rgb.shape, dtype=np.float32)
    if dom.depth_noise_mm > 0:
        dn = np.float32(dom.depth_noise_mm) * rng.standard_normal(
            depth.shape, dtype=np.float32)
        depth = np.where(depth > 0, np.maximum(depth + dn, 1.0), 0.0)

    return FrameData(
        rgb=np.clip(rgb, 0, 255).astype(np.uint8),
        depth_mm=depth.astype(np.float32),
        mask=mask.astype(np.uint8) * 255,
        boxes=boxes,
        valid=valid,
        gt_poses_cam=gt_cam,
        gt_poses_world=gt_world,
        centers_uv=centers,
        cam_pose=cam_pose,
        visible_frac=vis_frac,
    )


def render_flower_crop(R_cam: np.ndarray, size: int = 512,
                       fill: float = 0.85,
                       center_offset: tuple[float, float] = (0.0, 0.0),
                       domain: DomainConfig | None = None,
                       rng: np.random.Generator | None = None) -> np.ndarray:
    """Render one masked flower crop (the PoseNet training-sample format:
    512^2 bg-zeroed crops, dataset/posenet_flower_dataset.py) with the same
    orientation shading as `render_frame`, so crop-trained PoseNets transfer
    to full scenes. center_offset (fractions of size) shifts the disc off
    center — box-jitter augmentation emulating imperfect detector boxes.

    With a non-flat `domain` (+ rng) the crop is rendered with the
    hard-domain appearance the scene renderer produces at deployment:
    petal-shaped flower with orthographic foreshortening (the plane basis
    projected by R), `_flower_texture` shading, foliage background leaking
    through an imperfect segmentation mask (emulating detector-mask error),
    lighting gain, blur and sensor noise.
    Returns (size, size, 3) uint8."""
    if domain is not None and not domain.is_flat():
        return _render_flower_crop_hard(R_cam, size, fill, center_offset,
                                        domain, rng or np.random.default_rng(0))
    u = size / 2.0 + center_offset[0] * size
    v = size / 2.0 + center_offset[1] * size
    r_px = fill * size / 2.0
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    disc = (xs - u) ** 2 + (ys - v) ** 2 < r_px ** 2
    dxp, dyp = (xs - u) / r_px, (ys - v) / r_px
    shade = _orientation_shading(R_cam, dxp, dyp)
    rgb = np.where(disc[..., None], shade, 0.0)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def _render_flower_crop_hard(R_cam: np.ndarray, size: int, fill: float,
                             center_offset: tuple[float, float],
                             domain: DomainConfig,
                             rng: np.random.Generator) -> np.ndarray:
    """Hard-domain crop: orthographic petal flower + imperfect-mask bg leak.

    Orthographic is the small-object limit of the scene renderer's
    perspective ray-plane intersection: pixel offset = r_px * A @ (u, v)
    with A = R[:2, :2] (the projected plane basis), so tilt foreshortening
    is geometric, exactly like deployment crops.
    """
    u0 = size / 2.0 + center_offset[0] * size
    v0 = size / 2.0 + center_offset[1] * size
    r_px = fill * size / 2.0
    A = np.array([[R_cam[0, 0], R_cam[0, 1]], [R_cam[1, 0], R_cam[1, 1]]])
    det = np.linalg.det(A)
    if abs(det) < 0.05:
        # Near edge-on: nudge to keep the inverse well-conditioned (the
        # flower projects to a sliver; exact shape is irrelevant).
        A = A + np.sign(det if det != 0 else 1.0) * 0.05 * np.eye(2)
    A_inv = np.linalg.inv(A)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    dx, dy = (xs - u0) / r_px, (ys - v0) / r_px
    lu = A_inv[0, 0] * dx + A_inv[0, 1] * dy
    lv = A_inv[1, 0] * dx + A_inv[1, 1] * dy
    rho = np.hypot(lu, lv)
    theta = np.arctan2(lv, lu)
    inside = rho <= _petal_profile(theta, domain.petals, domain.petal_depth)

    tex = _flower_texture(R_cam, lu, lv, dx, dy, domain)
    if domain.background == "foliage":
        bg_full = _foliage_background(size, size, int(rng.integers(1 << 30)) % 97)
        bg = bg_full[:, :size]
    else:
        bg = np.full((size, size, 3), 40.0, np.float32)
    # Imperfect segmentation mask: the deployed pipeline multiplies the crop
    # by the detector's (resized, imperfect) mask — emulate with a randomly
    # eroded/dilated flower mask, leaking background at the boundary.
    mask = inside
    if domain.lighting > 0:
        from scipy.ndimage import binary_dilation, binary_erosion
        it = int(rng.integers(0, max(2, size // 100)))
        if it > 0:
            mask = (binary_dilation(inside, iterations=it) if rng.random() < 0.5
                    else binary_erosion(inside, iterations=it))
    if domain.crop_occlusion > 0 and rng.random() < domain.crop_occlusion:
        # Partial leaf occlusion: elliptical bites removed from the mask.
        # The deployed pipeline zeroes non-mask pixels, so an occluding leaf
        # appears as a zeroed region — reproduced exactly by mask removal.
        occ = np.zeros((size, size), bool)
        for _ in range(int(rng.integers(1, 3))):
            cx = u0 + rng.uniform(-1.0, 1.0) * r_px
            cy = v0 + rng.uniform(-1.0, 1.0) * r_px
            a = rng.uniform(0.25, 0.7) * r_px
            b = rng.uniform(0.15, 0.5) * r_px
            ang = rng.uniform(0, np.pi)
            ca, sa = np.cos(ang), np.sin(ang)
            ex = ((xs - cx) * ca + (ys - cy) * sa) / a
            ey = (-(xs - cx) * sa + (ys - cy) * ca) / b
            occ |= ex ** 2 + ey ** 2 < 1.0
        vis = 1.0 - (occ & inside).sum() / max(inside.sum(), 1)
        # Keep at least the scene GT filter's visibility bound — flowers
        # more occluded than this are never ground truth at deployment.
        if vis >= max(domain.min_visible_frac, 0.25):
            mask = mask & ~occ
    rgb = np.where(mask[..., None], np.where(inside[..., None], tex, bg), 0.0)

    if domain.lighting > 0:
        gain = 1.0 + domain.lighting * rng.uniform(-0.35, 0.3)
        ch = 1.0 + domain.lighting * rng.uniform(-0.12, 0.12, size=3)
        rgb = rgb * gain * ch
    if domain.blur_sigma > 0:
        from scipy.ndimage import gaussian_filter
        sigma = rng.uniform(0.0, domain.blur_sigma)
        if sigma > 0.05:
            rgb = gaussian_filter(rgb, sigma=(sigma, sigma, 0))
    if domain.noise > 0:
        noise = rng.normal(0, domain.noise * 255.0, rgb.shape)
        rgb = np.where(mask[..., None], rgb + noise, rgb)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def write_dataset(out_dir: str | Path, n_frames: int = 20, n_flowers: int = 5,
                  seed: int = 0, height: int = 480, width: int = 640,
                  max_det: int = 16, with_detections: bool = False,
                  domain: DomainConfig | None = None) -> Path:
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
    scene = SyntheticScene.random(rng, n_flowers, height, width, domain=domain)
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
    p.add_argument("--domain", default="flat", choices=["flat", "hard"])
    args = p.parse_args()
    path = write_dataset(args.out, args.frames, args.flowers, args.seed,
                         args.height, args.width,
                         domain=DomainConfig.named(args.domain))
    print(f"wrote synthetic dataset to {path}")
