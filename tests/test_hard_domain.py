"""Hard-domain renderer tests (data/synthetic.py::DomainConfig.hard).

The hard domain is the round-3 robustness upgrade: petal-structured flowers
with true perspective foreshortening and per-pixel depth, world-anchored
occluding leaf distractors, foliage background, lighting/noise/blur, and
occlusion-based GT visibility filtering. These tests pin its contracts
without depending on trained models.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as sciR

from flope_tpu.data.synthetic import (DomainConfig, SyntheticScene,
                                      orbit_camera, render_frame,
                                      render_flower_crop)


def hard_scene(seed=0, n=6, h=240, w=320, **dom_kw):
    dom = DomainConfig.hard()
    if dom_kw:
        dom = type(dom)(**{**dom.__dict__, **dom_kw})
    rng = np.random.default_rng(seed)
    return SyntheticScene.random(rng, n, h, w, domain=dom)


class TestHardFrame:
    def test_deterministic(self):
        scene = hard_scene()
        a = render_frame(scene, orbit_camera(scene, 0.7))
        b = render_frame(scene, orbit_camera(scene, 0.7))
        assert np.array_equal(a.rgb, b.rgb)
        assert np.array_equal(a.depth_mm, b.depth_mm)
        assert np.array_equal(a.valid, b.valid)

    def test_flat_domain_dispatch_unchanged(self):
        # A flat-domain scene must take the legacy rasterizer: constant
        # per-flower ray-distance depth and a uniform 40-valued background.
        rng = np.random.default_rng(3)
        scene = SyntheticScene.random(rng, 4, 240, 320)
        fr = render_frame(scene, orbit_camera(scene, 0.5))
        bgpx = fr.rgb[fr.mask == 0]
        assert (bgpx == 40).all()

    def test_gt_boxes_cover_flower_pixels(self):
        # Without distractors/background, every flower pixel must fall in
        # the union of GT boxes (+2 px slack for the int floor/ceil edges).
        scene = hard_scene(seed=1, n=4, n_distractors=0, background="flat",
                          noise=0.0, blur_sigma=0.0, lighting=0.0,
                          min_visible_frac=0.0)
        fr = render_frame(scene, orbit_camera(scene, 0.4))
        assert fr.valid.any()
        cover = np.zeros(fr.mask.shape, bool)
        for b in fr.boxes[fr.valid]:
            y0, y1 = max(b[1] - 2, 0), min(b[3] + 2, fr.mask.shape[0])
            x0, x1 = max(b[0] - 2, 0), min(b[2] + 2, fr.mask.shape[1])
            cover[y0:y1, x0:x1] = True
        flower_px = fr.mask > 0
        assert (flower_px <= cover).all()

    def test_occluded_flower_dropped_from_gt(self):
        # One flower face-on at the origin; a LARGE leaf directly between
        # the camera and the flower. The flower must not be GT (visibility
        # below min_visible_frac) even though it is in-frustum.
        h, w = 240, 320
        fx = 0.9 * w
        K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1.0]])
        dom = DomainConfig.hard()
        base = SyntheticScene(
            K=K, height=h, width=w,
            positions=np.zeros((1, 3)),
            rotations=np.eye(3)[None],
            domain=dom, bg_seed=7,
            distractor_positions=None, distractor_rotations=None,
            distractor_radii=None)
        cam = orbit_camera(base, 0.0)
        eye = cam[:3, 3]
        # Visible control case first.
        fr_clear = render_frame(base, cam)
        assert fr_clear.valid.sum() == 1
        # Occluder at 40% of the way from camera to flower, facing the
        # camera (leaf plane normal along the view ray), radius >> flower.
        occluded = SyntheticScene(
            K=K, height=h, width=w,
            positions=np.zeros((1, 3)),
            rotations=np.eye(3)[None],
            domain=dom, bg_seed=7,
            distractor_positions=(0.6 * eye)[None],
            distractor_rotations=cam[:3, :3][None],
            distractor_radii=np.array([0.2]))
        fr_occ = render_frame(occluded, cam)
        assert fr_occ.valid.sum() == 0

    def test_depth_is_per_pixel_ray_distance(self):
        # Unlike the flat domain's constant center distance, hard depth
        # varies across a tilted flower — but its masked mean stays within
        # a few percent of the center ray distance (depth pooling still
        # recovers translation approximately).
        scene = hard_scene(seed=2, n=1, n_distractors=0, background="flat",
                          noise=0.0, blur_sigma=0.0, lighting=0.0,
                          depth_noise_mm=0.0, min_visible_frac=0.0,
                          overlap_spread=0.01)
        fr = render_frame(scene, orbit_camera(scene, 1.2))
        assert fr.valid.sum() == 1
        center_dist_mm = np.linalg.norm(fr.gt_poses_cam[0, :3, 3]) * 1000
        on = fr.depth_mm[fr.mask > 0]
        assert on.size > 20
        assert on.std() > 0  # genuinely per-pixel
        assert abs(on.mean() - center_dist_mm) / center_dist_mm < 0.03

    def test_noise_and_lighting_vary_by_frame(self):
        scene = hard_scene(seed=4)
        a = render_frame(scene, orbit_camera(scene, 0.1))
        b = render_frame(scene, orbit_camera(scene, 0.1001))
        # Nearly identical geometry, different per-frame imaging draws.
        assert not np.array_equal(a.rgb, b.rgb)

    def test_depth_noise_only_on_measured_pixels(self):
        scene = hard_scene(seed=5)
        fr = render_frame(scene, orbit_camera(scene, 0.9))
        assert (fr.depth_mm[fr.depth_mm != 0] >= 1.0).all()
        # Background (no return) stays exactly 0 — sensor-hole contract.
        assert (fr.depth_mm == 0).any()


class TestHardCrop:
    def test_crop_occlusion_bites_mask(self):
        """crop_occlusion=1: elliptical bites remove flower pixels (zeroed,
        like the deployed mask-multiply of an occluding leaf), at least 25%
        of the flower always stays visible, and crop_occlusion=0 is the
        unchanged default path."""
        import dataclasses

        from flope_tpu.data.synthetic import DomainConfig, render_flower_crop
        base = DomainConfig.hard()
        occd = dataclasses.replace(base, crop_occlusion=1.0)
        assert base.crop_occlusion == 0.0  # presets unchanged by default
        R = np.eye(3)
        losses = []
        for s in range(12):
            a = render_flower_crop(R, 96, domain=base,
                                   rng=np.random.default_rng(s))
            b = render_flower_crop(R, 96, domain=occd,
                                   rng=np.random.default_rng(s))
            na = int((a.sum(-1) > 0).sum())
            nb = int((b.sum(-1) > 0).sum())
            losses.append((na - nb) / max(na, 1))
            assert nb >= 0.2 * na  # never mostly occluded
        assert max(losses) > 0.10  # some crops lose a real bite

    def test_crop_renders_petal_flower(self):
        R = sciR.from_euler("zyx", [30, 20, 10], degrees=True).as_matrix()
        crop = render_flower_crop(R, 128, domain=DomainConfig.hard(),
                                  rng=np.random.default_rng(0))
        assert crop.shape == (128, 128, 3)
        assert (crop > 60).mean() > 0.05  # flower pixels present

    def test_crop_deterministic_given_rng(self):
        R = sciR.random(1, random_state=np.random.RandomState(1)).as_matrix()[0]
        a = render_flower_crop(R, 96, domain=DomainConfig.hard(),
                               rng=np.random.default_rng(9))
        b = render_flower_crop(R, 96, domain=DomainConfig.hard(),
                               rng=np.random.default_rng(9))
        assert np.array_equal(a, b)

    def test_foreshortening(self):
        # A face-on flower covers far more pixels than a steeply tilted one.
        dom = DomainConfig(petals=5, petal_depth=0.35)
        face_on = render_flower_crop(np.eye(3), 128, domain=dom,
                                     rng=np.random.default_rng(0))
        R_tilt = sciR.from_euler("y", 80, degrees=True).as_matrix()
        tilted = render_flower_crop(R_tilt, 128, domain=dom,
                                    rng=np.random.default_rng(0))
        assert (face_on.sum(-1) > 0).sum() > 3 * (tilted.sum(-1) > 0).sum()

    def test_body_yaw_observable_through_petal_symmetry(self):
        """Well-posedness regression (the round-3 fix): the orientation
        shading is anchored in VIEW coordinates, so a body-yaw by exactly
        the petal-symmetry angle (2pi/petals) — which leaves the petal
        geometry pixel-identical — must still change the image. A local-
        frame shading (the broken renderer) is yaw-invariant and makes
        yaw-nullified labels 5-way contradictory."""
        dom = DomainConfig(petals=5, petal_depth=0.35, background="flat",
                           noise=0.0, blur_sigma=0.0, lighting=0.0)
        R = sciR.from_euler("zyx", [15, 25, 10], degrees=True).as_matrix()
        Ry = R @ sciR.from_euler("z", 360.0 / 5, degrees=True).as_matrix()
        a = render_flower_crop(R, 128, domain=dom,
                               rng=np.random.default_rng(4))
        b = render_flower_crop(Ry, 128, domain=dom,
                               rng=np.random.default_rng(4))
        # Same silhouette (petal symmetry) ...
        sil_a, sil_b = a.sum(-1) > 0, b.sum(-1) > 0
        overlap = (sil_a & sil_b).sum() / max((sil_a | sil_b).sum(), 1)
        assert overlap > 0.95, f"petal silhouettes diverged ({overlap:.3f})"
        # ... but materially different shading on the flower pixels.
        both = sil_a & sil_b
        diff = np.abs(a.astype(np.float32) - b.astype(np.float32))[both]
        assert diff.mean() > 5.0, f"yaw-invariant shading (mean {diff.mean():.2f})"

    def test_synthetic_crops_hard(self):
        from flope_tpu.data.posenet_dataset import synthetic_crops
        d = synthetic_crops(6, 64, seed=3, box_jitter=0.06,
                            domain=DomainConfig.hard())
        assert d["images"].shape == (6, 64, 64, 3)
        assert d["rotations"].shape == (6, 3, 3)
        # Labels stay yaw-nullified representatives.
        e = sciR.from_matrix(d["rotations"]).as_euler("zyx", degrees=True)
        assert np.abs(e[:, 0]).max() < 1e-4


class TestDomainConfig:
    def test_presets(self):
        assert DomainConfig.flat().is_flat()
        assert not DomainConfig.hard().is_flat()
        assert DomainConfig.named("hard") == DomainConfig.hard()
        with pytest.raises(ValueError):
            DomainConfig.named("nope")
