"""Score-weighted running-average fusion: the reference's Env3D on TPU.

Second of the two multi-view fusion algorithms the reference ships
(scripts/align_measurements.py:30-135 / flower_pose_aggregrator.py:23-104):
instead of a Kalman filter, matched measurements fold into a score-weighted
running mean (translation) and a slerp at t = 1/(score+1) (rotation).

Faithful quirks reproduced:
* Association is against the UPDATED state translations (unlike the KF
  tracker, which associates against first-seen positions).
* If a frame matches nothing at all, ALL of its measurements spawn new states
  (align_measurements.py:76-80) — including ones that would have matched had
  any sibling matched.
* Duplicate matches to one state: numpy fancy assignment keeps the LAST
  matching measurement and the buffered `score[idx] += 1` increments once —
  both reproduced deterministically here.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from flope_tpu.geometry import slerp

__all__ = ["AverageState", "init_average_state", "average_step", "average_sequence"]


@flax.struct.dataclass
class AverageState:
    trans: jax.Array    # (T, 3) running-mean translations
    quat: jax.Array     # (T, 4) slerp-averaged xyzw quaternions
    score: jax.Array    # (T,)
    alive: jax.Array    # (T,)
    dropped: jax.Array  # () int32


def init_average_state(max_tracks: int = 64) -> AverageState:
    return AverageState(
        trans=jnp.zeros((max_tracks, 3)),
        quat=jnp.zeros((max_tracks, 4)).at[:, 3].set(1.0),
        score=jnp.zeros((max_tracks,)),
        alive=jnp.zeros((max_tracks,), bool),
        dropped=jnp.zeros((), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("dist_th",))
def average_step(state: AverageState, tvec: jax.Array, qvec: jax.Array,
                 meas_valid: jax.Array, dist_th: float = 0.05) -> AverageState:
    """One frame of measurements: tvec (D,3), qvec (D,4), meas_valid (D,)."""
    n_tracks = state.trans.shape[0]
    d = jnp.linalg.norm(tvec[:, None, :] - state.trans[None, :, :], axis=-1)
    d = jnp.where(state.alive[None, :], d, jnp.inf)
    d = jnp.where(meas_valid[:, None], d, jnp.inf)
    jmin = jnp.argmin(d, axis=1)
    dmin = jnp.min(d, axis=1)
    good = meas_valid & (dmin < dist_th) & state.alive.any()
    any_good = good.any()
    # Reference quirk: a frame with zero matches spawns EVERYTHING as new.
    spawn = jnp.where(any_good, meas_valid & ~good, meas_valid)

    # Per-state update from the LAST matching measurement (numpy fancy-assign).
    midx = jnp.arange(tvec.shape[0])
    match_of = (good[:, None] & (jmin[:, None] == jnp.arange(n_tracks)[None, :]))
    has_match = match_of.any(axis=0)                              # (T,)
    last_i = jnp.argmax(jnp.where(match_of, midx[:, None], -1), axis=0)  # (T,)

    s = state.score
    w_meas = 1.0 / (s + 1.0)
    new_trans = state.trans * (s / (s + 1.0))[:, None] + tvec[last_i] * w_meas[:, None]
    new_quat = slerp(state.quat, qvec[last_i], w_meas)
    trans = jnp.where((has_match & any_good)[:, None], new_trans, state.trans)
    quat = jnp.where((has_match & any_good)[:, None], new_quat, state.quat)
    score = jnp.where(has_match & any_good, s + 1.0, s)

    # Spawn new states in free slots, measurement order.
    free = ~state.alive
    rank = jnp.cumsum(spawn) - 1
    free_sorted = jnp.argsort(~free)
    n_free = jnp.sum(free)
    can = spawn & (rank < n_free)
    slots = free_sorted[jnp.clip(rank, 0, n_tracks - 1)]

    def place(i, carry):
        tr, qu, sc, al = carry

        def do(args):
            tr, qu, sc, al = args
            j = slots[i]
            return (tr.at[j].set(tvec[i]), qu.at[j].set(qvec[i]),
                    sc.at[j].set(1.0), al.at[j].set(True))

        return jax.lax.cond(can[i], do, lambda a: a, carry)

    trans, quat, score, alive = jax.lax.fori_loop(
        0, tvec.shape[0], place, (trans, quat, score, state.alive))
    dropped = state.dropped + jnp.sum(spawn & ~can).astype(jnp.int32)
    return AverageState(trans=trans, quat=quat, score=score, alive=alive,
                        dropped=dropped)


@functools.partial(jax.jit, static_argnames=("dist_th", "max_tracks"))
def average_sequence(tvec: jax.Array, qvec: jax.Array, meas_valid: jax.Array,
                     dist_th: float = 0.05, max_tracks: int = 64) -> AverageState:
    """Offline scan over (F, D, ...) measurement arrays
    (the align_measurements.py main loop)."""
    def step(state, inputs):
        t, q, v = inputs
        return average_step(state, t, q, v, dist_th), None

    final, _ = jax.lax.scan(step, init_average_state(max_tracks),
                            (tvec, qvec, meas_valid))
    return final
