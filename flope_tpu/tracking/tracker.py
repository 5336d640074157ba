"""Multi-view Kalman tracker: fixed-slot TPU version of FlowerModel.

Reference semantics being reproduced (flower_model.py:146-215,
assign_meas_to_state):

* Tracks associate by nearest-neighbor **translation** distance against each
  track's FIRST-SEEN position (the reference never updates `self.state` after
  creation — only the KF state `kf.x` evolves). Distance threshold in meters
  (dist_th/1000, flower_model.py:39).
* The distance matrix is computed once per frame against tracks existing at
  frame start; tracks spawned mid-frame don't participate until next frame.
* Matched measurements apply KF predict+update **sequentially in measurement
  order** (two measurements matching the same track both update it, in order).
* Unmatched measurements spawn new tracks with score 1.
* The reference grows its track list unboundedly; here capacity is MAX_TRACKS
  slots and overflow measurements are dropped (recorded via `dropped` counter)
  — behavior is identical while unique flowers <= MAX_TRACKS.

The whole step is one jitted program; offline sequences run it under
``jax.lax.scan`` (`track_sequence`).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from flope_tpu.tracking.kalman import KF_Q, KF_R, kf_update

__all__ = ["TrackState", "init_tracks", "tracker_step", "track_sequence"]


@flax.struct.dataclass
class TrackState:
    """Fixed-capacity track table.

    first_trans: (T, 3) first-seen translation (association key).
    x: (T, 7) KF state [t3, q4].
    p: (T,) scalar covariance (p * I_7, see tracking.kalman).
    score: (T,) match count (reference: self.scores).
    alive: (T,) slot occupancy.
    dropped: () int32 measurements lost to slot exhaustion.
    """

    first_trans: jax.Array
    x: jax.Array
    p: jax.Array
    score: jax.Array
    alive: jax.Array
    dropped: jax.Array


def init_tracks(max_tracks: int = 64) -> TrackState:
    return TrackState(
        first_trans=jnp.zeros((max_tracks, 3)),
        x=jnp.zeros((max_tracks, 7)).at[:, 6].set(1.0),
        p=jnp.ones((max_tracks,)),
        score=jnp.zeros((max_tracks,)),
        alive=jnp.zeros((max_tracks,), bool),
        dropped=jnp.zeros((), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("dist_th",))
def tracker_step(state: TrackState, meas: jax.Array, meas_valid: jax.Array,
                 dist_th: float = 0.05) -> TrackState:
    """Assign one frame's measurements (D, 7) = [t3, q4] to the track table.

    dist_th in meters (reference default dist_th=50 mm, flower_model.py:31,39).
    """
    n_tracks = state.x.shape[0]

    # --- association against frame-start tracks (first-seen translations) ---
    d = jnp.linalg.norm(
        meas[:, None, :3] - state.first_trans[None, :, :], axis=-1)
    d = jnp.where(state.alive[None, :], d, jnp.inf)
    d = jnp.where(meas_valid[:, None], d, jnp.inf)
    jmin = jnp.argmin(d, axis=1)                       # (D,)
    dmin = jnp.min(d, axis=1)
    any_alive = state.alive.any()
    matched = meas_valid & (dmin < dist_th) & any_alive
    unmatched = meas_valid & ~matched

    # --- sequential KF updates in measurement order -------------------------
    def apply_match(i, carry):
        x, p, score = carry

        def do(args):
            x, p, score = args
            j = jmin[i]
            xj, pj = kf_update(x[j], p[j], meas[i], KF_Q, KF_R)
            return (x.at[j].set(xj), p.at[j].set(pj), score.at[j].add(1.0))

        return jax.lax.cond(matched[i], do, lambda a: a, (x, p, score))

    x, p, score = jax.lax.fori_loop(
        0, meas.shape[0], apply_match, (state.x, state.p, state.score))

    # --- spawn unmatched measurements into free slots in order --------------
    free = ~state.alive                                # (T,)
    # k-th unmatched measurement -> k-th free slot.
    meas_rank = jnp.cumsum(unmatched) - 1              # (D,) rank among unmatched
    free_idx_sorted = jnp.argsort(~free)               # free slots first, in index order
    n_free = jnp.sum(free)
    can_place = unmatched & (meas_rank < n_free)
    slot_for_meas = free_idx_sorted[jnp.clip(meas_rank, 0, n_tracks - 1)]

    def place(i, carry):
        ft, x, p, score, alive = carry

        def do(args):
            ft, x, p, score, alive = args
            s = slot_for_meas[i]
            return (
                ft.at[s].set(meas[i, :3]),
                x.at[s].set(meas[i]),
                p.at[s].set(1.0),
                score.at[s].set(1.0),
                alive.at[s].set(True),
            )

        return jax.lax.cond(can_place[i], do, lambda a: a, carry)

    ft, x, p, score, alive = jax.lax.fori_loop(
        0, meas.shape[0], place,
        (state.first_trans, x, p, score, state.alive))

    dropped = state.dropped + jnp.sum(unmatched & ~can_place).astype(jnp.int32)
    return TrackState(first_trans=ft, x=x, p=p, score=score, alive=alive,
                      dropped=dropped)


@functools.partial(jax.jit, static_argnames=("dist_th", "max_tracks"))
def track_sequence(meas: jax.Array, meas_valid: jax.Array,
                   dist_th: float = 0.05, max_tracks: int = 64) -> TrackState:
    """Offline mode: scan the tracker over a whole sequence.

    meas: (F, D, 7), meas_valid: (F, D). Returns the final TrackState — the
    TPU equivalent of the FlowerModel frame loop (flower_model.py:277-291).
    """
    def step(state, inputs):
        m, v = inputs
        return tracker_step(state, m, v, dist_th), None

    final, _ = jax.lax.scan(step, init_tracks(max_tracks), (meas, meas_valid))
    return final
