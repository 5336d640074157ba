"""Reference-grounded fidelity A/B: same inputs + same weights through the
reference's real torch/cv2 pipeline AND the fused JAX pipeline, then deltas.

This is the parity measurement BASELINE.json contracts (<2 deg mean
rotation-error delta vs the reference): the reference side is the actual
code at /root/reference (pose_predictor.py:69-186) driven via
flope_tpu.compat; the JAX side is flope_tpu.pipeline.predict_frames in
teacher mode. Rotation delta is the geodesic angle between the two returned
rotation matrices per matched flower; translation delta is the Euclidean gap
in cm. Flowers are matched by nearest translation (both pipelines order
outputs by surviving detection slot, but reliability filtering may differ, so
matching is explicit).
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["ABResult", "aggregate_ab", "run_reference_ab", "make_ab_frames"]


@dataclasses.dataclass
class ABResult:
    crop_size: int
    n_frames: int
    n_matched: int
    n_ref_only: int
    n_jax_only: int
    rot_delta_deg_mean: float
    rot_delta_deg_max: float
    trans_delta_cm_mean: float
    trans_delta_cm_max: float
    # Context: absolute errors vs synthetic GT for each side.
    ref_rot_err_deg_mean: float
    jax_rot_err_deg_mean: float
    label: str = ""

    def row(self) -> str:
        return (f"| {self.label or self.crop_size} | {self.n_matched} | "
                f"{self.rot_delta_deg_mean:.3f} | {self.rot_delta_deg_max:.3f} | "
                f"{self.trans_delta_cm_mean:.4f} | {self.trans_delta_cm_max:.4f} | "
                f"{self.ref_rot_err_deg_mean:.2f} | {self.jax_rot_err_deg_mean:.2f} |")


def aggregate_ab(results: list["ABResult"], label: str = "") -> "ABResult":
    """Match-count-weighted aggregate across scenes (means weighted, maxes
    maxed, counts summed)."""
    w = np.array([max(r.n_matched, 0) for r in results], float)
    wsum = max(w.sum(), 1.0)

    def wmean(vals):
        v = np.array(vals, float)
        ok = np.isfinite(v)
        return float((v[ok] * w[ok]).sum() / max(w[ok].sum(), 1.0)) \
            if ok.any() else float("nan")

    return ABResult(
        crop_size=results[0].crop_size,
        n_frames=sum(r.n_frames for r in results),
        n_matched=int(w.sum()),
        n_ref_only=sum(r.n_ref_only for r in results),
        n_jax_only=sum(r.n_jax_only for r in results),
        rot_delta_deg_mean=wmean([r.rot_delta_deg_mean for r in results]),
        rot_delta_deg_max=max(r.rot_delta_deg_max for r in results),
        trans_delta_cm_mean=wmean([r.trans_delta_cm_mean for r in results]),
        trans_delta_cm_max=max(r.trans_delta_cm_max for r in results),
        ref_rot_err_deg_mean=wmean([r.ref_rot_err_deg_mean for r in results]),
        jax_rot_err_deg_mean=wmean([r.jax_rot_err_deg_mean for r in results]),
        label=label or results[0].label,
    )


def _rot_angle_deg(Ra: np.ndarray, Rb: np.ndarray) -> np.ndarray:
    """Geodesic angle (deg) between rotation matrices, batched on axis 0."""
    tr = np.einsum("nij,nij->n", Ra, Rb)
    return np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))


def make_ab_frames(seed: int = 0, n_frames: int = 6, n_flowers: int = 5,
                   height: int = 480, width: int = 640, max_det: int = 8):
    """Synthetic scene + frames shared by both sides of the A/B."""
    from flope_tpu.data.synthetic import SyntheticScene, orbit_camera, render_frame

    rng = np.random.default_rng(seed)
    scene = SyntheticScene.random(rng, n_flowers=n_flowers, height=height,
                                  width=width)
    frames = [render_frame(scene, orbit_camera(scene, 2 * np.pi * i / n_frames),
                           max_det=max_det) for i in range(n_frames)]
    return scene, frames


def run_reference_ab(variables: dict, scene, frames, crop_size: int = 512,
                     reference_root: str | None = None,
                     ref_variables: dict | None = None,
                     model_width: float = 1.0,
                     label: str = "") -> ABResult:
    """Run both pipelines on the same frames/weights and measure deltas.

    The reference side always crops at 512^2 (hard-coded,
    pose_predictor.py:145); crop_size applies to the JAX side only, so
    crop_size=512 measures pure implementation drift and crop_size=256
    additionally measures the resolution substitution the TPU default uses.

    ref_variables: weights for the torch side (defaults to `variables`).
    Passing resolution-matched weights per side (a 512-trained model to the
    reference, a 256-trained model to the 256 JAX config) turns the abs-error
    columns into a deployment-config comparison instead of feeding one model
    off-distribution inputs. model_width: JAX-side backbone width (0.5 = the
    distilled student; pass its checkpoint as `variables`).
    """
    import jax.numpy as jnp

    from flope_tpu.compat import make_reference_predictor, run_reference_frames
    from flope_tpu.compat.reference_runner import DEFAULT_REFERENCE_ROOT
    from flope_tpu.models import posenet_state_dict_to_torch
    from flope_tpu.pipeline import PipelineConfig, predict_frames

    root = reference_root or DEFAULT_REFERENCE_ROOT
    max_det = frames[0].boxes.shape[0]

    # Depth in RealSense-405 sensor units: the reference divides by 10000
    # (pose_predictor.py:118); our synthetic depth is in mm -> x10.
    depth_units = [f.depth_mm * 10.0 for f in frames]

    # ---- Reference side: the real torch/cv2 code ---------------------------
    sd = posenet_state_dict_to_torch(ref_variables or variables)
    pred = make_reference_predictor(sd, scene.K, scene.height, scene.width,
                                    reference_root=root)
    ref_out = run_reference_frames(
        pred, [f.rgb for f in frames], depth_units,
        [f.boxes[f.valid] for f in frames], [f.mask for f in frames])

    # ---- JAX side: the fused TPU program in teacher mode -------------------
    cfg = PipelineConfig(max_det=max_det, crop_size=crop_size,
                         crop_region=None, model_width=model_width).teacher()
    jax_out = predict_frames(
        variables,
        jnp.asarray(np.stack([f.rgb for f in frames]), jnp.float32),
        jnp.asarray(np.stack(depth_units), jnp.float32),
        jnp.asarray(np.stack([f.boxes for f in frames])),
        jnp.asarray(np.stack([f.valid for f in frames])),
        jnp.asarray(np.stack([f.mask for f in frames])),
        jnp.asarray(scene.K, jnp.float32), cfg)
    jax_poses = np.asarray(jax_out.poses)
    jax_valid = np.asarray(jax_out.valid)

    # ---- Match per frame by nearest translation and accumulate deltas ------
    rot_d, trans_d, ref_gt, jax_gt = [], [], [], []
    n_matched = n_ref_only = n_jax_only = 0
    for fi, frame in enumerate(frames):
        ref = ref_out[fi]
        ours = jax_poses[fi][jax_valid[fi]]
        nr = 0 if ref is None else ref.shape[0]
        no = ours.shape[0]
        if nr == 0 or no == 0:
            n_ref_only += nr
            n_jax_only += no
            continue
        dist = np.linalg.norm(ref[:, None, :3, 3] - ours[None, :, :3, 3], axis=-1)
        used = np.zeros(no, bool)
        gt = np.array(frame.gt_poses_cam[frame.valid])
        # Both pipelines yaw-nullify their outputs (pose_predictor.py:161);
        # the GT context columns must compare like with like or they read as
        # a uniform ~90 deg of phantom error.
        from flope_tpu.geometry import nullify_yaw
        gt[:, :3, :3] = np.asarray(nullify_yaw(jnp.asarray(gt[:, :3, :3])))
        for ri in np.argsort(dist.min(axis=1)):
            oi = int(np.argmin(np.where(used, np.inf, dist[ri])))
            if used[oi] or dist[ri, oi] > 0.05:  # 5 cm gate
                n_ref_only += 1
                continue
            used[oi] = True
            n_matched += 1
            rot_d.append(_rot_angle_deg(ref[ri][None, :3, :3],
                                        ours[oi][None, :3, :3])[0])
            trans_d.append(100.0 * dist[ri, oi])
            # Absolute error vs GT (context): nearest GT flower by translation.
            gi = int(np.argmin(np.linalg.norm(gt[:, :3, 3] - ref[ri, :3, 3],
                                              axis=-1)))
            ref_gt.append(_rot_angle_deg(ref[ri][None, :3, :3],
                                         gt[gi][None, :3, :3])[0])
            jax_gt.append(_rot_angle_deg(ours[oi][None, :3, :3],
                                         gt[gi][None, :3, :3])[0])
        n_jax_only += int((~used).sum())

    rot_d = np.asarray(rot_d) if rot_d else np.asarray([np.nan])
    trans_d = np.asarray(trans_d) if trans_d else np.asarray([np.nan])
    return ABResult(
        crop_size=crop_size,
        n_frames=len(frames),
        n_matched=n_matched,
        n_ref_only=n_ref_only,
        n_jax_only=n_jax_only,
        rot_delta_deg_mean=float(np.mean(rot_d)),
        rot_delta_deg_max=float(np.max(rot_d)),
        trans_delta_cm_mean=float(np.mean(trans_d)),
        trans_delta_cm_max=float(np.max(trans_d)),
        ref_rot_err_deg_mean=float(np.mean(ref_gt)) if ref_gt else float("nan"),
        jax_rot_err_deg_mean=float(np.mean(jax_gt)) if jax_gt else float("nan"),
        label=label or str(crop_size),
    )
