"""Global multi-camera track fusion over the ``stream`` mesh axis.

The multi-camera rig (BASELINE config 5) shards frames over a
``('stream',)`` mesh: each device runs the fused detect->pose graph on its
own camera's frame. The world-frame track table, however, is a GLOBAL
structure — the reference's FlowerModel holds one table and feeds it every
camera's measurements sequentially (flower_model.py:146-215, 218-248).

This module is SURVEY §5.8's plan made real: per-stream measurements are
computed on-device inside ``shard_map`` (cheap: camera-to-world transform of
(D,4,4) poses), then **only the (D,7) measurement vectors** ride the ICI
``all_gather`` — never the frames or crops. Every lane then applies the
identical deterministic update, so the replicated table stays bit-identical
across devices and equals the single-device result.

Stream-merge semantics: the gathered streams are consumed **sequentially in
stream order** (a ``lax.scan`` of ``tracker_step`` per stream), exactly as
the reference's single loop would consume S consecutive frames — so the same
flower seen simultaneously by all cameras lands in ONE track (stream 0
spawns it, streams 1..S-1 match it). Concatenating the streams into one
virtual frame instead would spawn S duplicate tracks, because tracker_step
associates only against frame-start tracks (flower_model.py:179-185
computes the distance matrix once per frame). Contract (asserted by
tests/test_fusion.py on an 8-virtual-device mesh):

    fused_tracker_step(state, meas(S,D,7), ...) ==
        functools.reduce(lambda st, s: tracker_step(st, meas[s], valid[s]),
                         range(S), state)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from flope_tpu.geometry import pose_cam_to_world, rotmat_to_quat
from flope_tpu.tracking.tracker import TrackState, init_tracks, tracker_step

__all__ = ["world_measurements", "fused_tracker_step", "fused_track_sequence",
           "fuse_stream_predictions"]


def world_measurements(poses_cam: jax.Array, cam_pose: jax.Array) -> jax.Array:
    """Camera-frame flower poses -> world-frame 7-D measurements [t3, q4].

    poses_cam: (..., D, 4, 4); cam_pose: (..., 4, 4) camera-to-world.
    Exactly the reference's measurement construction
    (flower_model.py:242-248: pose_cam_to_world then rotmat2qvec).
    """
    world = pose_cam_to_world(poses_cam, cam_pose[..., None, :, :])
    q = rotmat_to_quat(world[..., :3, :3])
    return jnp.concatenate([world[..., :3, 3], q], axis=-1)


def _scan_streams(state: TrackState, meas_g: jax.Array, valid_g: jax.Array,
                  dist_th: float) -> TrackState:
    """Consume gathered (S, D, 7) streams sequentially in stream order."""
    def step(st, inputs):
        m, v = inputs
        return tracker_step(st, m, v, dist_th=dist_th), None

    final, _ = jax.lax.scan(step, state, (meas_g, valid_g))
    return final


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "dist_th"))
def fused_tracker_step(state: TrackState, meas: jax.Array,
                       meas_valid: jax.Array, mesh: Mesh,
                       axis: str = "stream",
                       dist_th: float = 0.05) -> TrackState:
    """One fused step: gather all streams' measurements, update the table.

    state: replicated TrackState. meas: (S, D, 7) world-frame measurements
    with the leading (stream) axis sharded over ``axis``; meas_valid: (S, D).
    Streams are consumed sequentially in stream order (see module docstring).
    """
    def body(state, m, v):
        mg = jax.lax.all_gather(m, axis, axis=0, tiled=True)   # (S, D, 7)
        vg = jax.lax.all_gather(v, axis, axis=0, tiled=True)   # (S, D)
        return _scan_streams(state, mg, vg, dist_th)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )(state, meas, meas_valid)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis", "dist_th", "max_tracks"))
def fused_track_sequence(meas: jax.Array, meas_valid: jax.Array, mesh: Mesh,
                         axis: str = "stream", dist_th: float = 0.05,
                         max_tracks: int = 64) -> TrackState:
    """Offline fused mode: a whole multi-camera sequence in one program.

    meas: (F, S, D, 7) — F time steps of S sharded streams; meas_valid:
    (F, S, D). One all_gather of the (small) measurement tensors, then a
    ``lax.scan`` of tracker_step over the (time, stream)-major flattening —
    equivalent to S*F sequential reference frames in that order.
    """
    f, s_total = meas.shape[0], meas.shape[1]

    def body(m, v):
        mg = jax.lax.all_gather(m, axis, axis=1, tiled=True)   # (F, S, D, 7)
        vg = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        return _scan_streams(init_tracks(max_tracks),
                             mg.reshape(f * s_total, -1, 7),
                             vg.reshape(f * s_total, -1), dist_th)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=P(),
        check_vma=False,
    )(meas, meas_valid)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "dist_th"))
def fuse_stream_predictions(state: TrackState, poses_cam: jax.Array,
                            valid: jax.Array, cam_poses: jax.Array,
                            mesh: Mesh, axis: str = "stream",
                            dist_th: float = 0.05) -> TrackState:
    """Pipeline-facing fused step: per-stream camera-frame predictions in,
    updated world track table out.

    poses_cam: (S, D, 4, 4) from ``predict_frames`` (stream-sharded);
    valid: (S, D); cam_poses: (S, 4, 4) per-stream camera-to-world. The
    cam->world transform runs on each stream's own device; only (D, 7)
    measurements cross the ICI.
    """
    def body(state, pc, v, cp):
        m = world_measurements(pc, cp)                          # local (s,D,7)
        mg = jax.lax.all_gather(m, axis, axis=0, tiled=True)
        vg = jax.lax.all_gather(v, axis, axis=0, tiled=True)
        return _scan_streams(state, mg, vg, dist_th)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )(state, poses_cam, valid, cam_poses)
