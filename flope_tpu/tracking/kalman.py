"""Closed-form 7-D Kalman filtering for flower tracks.

The reference's per-track filterpy KalmanFilter (flower_model.py:18-26,
kalman_filter.py:77-85) uses F = H = I, P0 = I, Q = q*I, R = r*I. Under those
parameters the full 7x7 covariance stays exactly p*I forever, so predict +
update collapse to one scalar gain:

    predict:  p' = p + q
    update:   K = p' / (p' + r);  x += K (z - x);  p = (1 - K) p'

This is bit-for-bit the filterpy recursion (verified against a full-matrix
numpy oracle in tests) at a fraction of the FLOPs, and — being a pure
elementwise map — batches over every track slot at once on the VPU.
The post-update quaternion renormalization (flower_model.py:195,
kalman_filter.py:131) is kept.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["KF_Q", "KF_R", "kf_init_variance", "kf_update"]

KF_Q = 0.001  # process noise (flower_model.py:24)
KF_R = 0.1    # measurement noise (flower_model.py:25)


def kf_init_variance() -> float:
    """P0 = I (flower_model.py:23)."""
    return 1.0


def kf_update(x: jax.Array, p: jax.Array, z: jax.Array,
              q: float = KF_Q, r: float = KF_R,
              renormalize_quat: bool = True) -> tuple[jax.Array, jax.Array]:
    """One predict+update step. x: (..., 7) [t3, q4], p: (...,) variance.

    Returns (x_new, p_new). Broadcasts over leading dims (track slots).
    """
    p_pred = p + q
    gain = p_pred / (p_pred + r)
    x_new = x + gain[..., None] * (z - x)
    p_new = (1.0 - gain) * p_pred
    if renormalize_quat:
        qv = x_new[..., 3:]
        qv = qv / jnp.maximum(jnp.linalg.norm(qv, axis=-1, keepdims=True), 1e-12)
        x_new = jnp.concatenate([x_new[..., :3], qv], axis=-1)
    return x_new, p_new
