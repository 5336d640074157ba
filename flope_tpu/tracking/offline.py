"""Offline per-flower quaternion smoothing (scripts/kalman_filter.py on TPU).

The reference's third fusion stage: given aligned measurements (F, N, 7) where
flower identity is already resolved (zero rows = not seen that frame), run an
independent 7-D KF per flower over time, keep RAW translations but FILTERED
quaternions (kalman_filter.py:132-134 — a deliberate choice in the reference).
Expressed as one `lax.scan` over frames with all N filters updating in parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flope_tpu.tracking.kalman import KF_Q, KF_R, kf_update

__all__ = ["smooth_quaternions"]


@functools.partial(jax.jit, static_argnames=())
def smooth_quaternions(trans: jax.Array, quat: jax.Array
                       ) -> tuple[jax.Array, jax.Array]:
    """trans: (F, N, 3), quat: (F, N, 4). Missing detections are all-zero
    translation rows (kalman_filter.py:116). Returns (trans_out, quat_filtered)
    with trans passed through raw, matching the reference output.
    """
    f, n = trans.shape[0], trans.shape[1]

    def step(carry, inputs):
        x, p, started = carry
        t, q = inputs
        z = jnp.concatenate([t, q], axis=-1)            # (N,7)
        present = jnp.sum(jnp.abs(t), axis=-1) != 0     # (N,)

        # First sighting initializes the filter at the measurement
        # (kalman_filter.py:123-125); later sightings predict+update.
        x_upd, p_upd = kf_update(x, p, z, KF_Q, KF_R)
        first = present & ~started
        later = present & started
        x_new = jnp.where(later[:, None], x_upd,
                          jnp.where(first[:, None], z, x))
        p_new = jnp.where(later, p_upd, p)
        # Quaternion renorm happens on every present step, incl. first
        # (kalman_filter.py:131).
        qpart = x_new[:, 3:]
        qnorm = jnp.maximum(jnp.linalg.norm(qpart, axis=-1, keepdims=True), 1e-12)
        x_new = jnp.where(present[:, None],
                          jnp.concatenate([x_new[:, :3], qpart / qnorm], axis=-1),
                          x_new)
        started_new = started | present
        # Missing frames emit zeros, matching the reference's zeros_like
        # output buffers (kalman_filter.py:110-116).
        out_q = jnp.where(present[:, None], x_new[:, 3:], 0.0)
        return (x_new, p_new, started_new), out_q

    x0 = jnp.zeros((n, 7))
    p0 = jnp.ones((n,))
    started0 = jnp.zeros((n,), bool)
    (_, _, _), quat_f = jax.lax.scan(step, (x0, p0, started0), (trans, quat))
    return trans, quat_f
