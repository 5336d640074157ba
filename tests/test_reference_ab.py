"""Reference-grounded parity: the fused JAX pipeline vs the reference's
actual code (pose_predictor.py:69-186) on the same inputs and weights.

This is the BASELINE.json fidelity contract (<2 deg mean rotation delta)
measured against the real implementation, not a self-made oracle. The torch
side runs the unmodified /root/reference modules through
flope_tpu.compat's dependency shims.

Random-init weights (seeded) are deliberately used: an untrained net is a
high-gain amplifier of preprocessing drift (crop/resize, erosion, SVD), so
passing here is a stricter numerical statement than with a trained model.
The trained-model report lives in PARITY_AB.md (scripts/reference_ab.py).
"""

import os

import numpy as np
import pytest

import jax

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "sunflower")),
    reason="reference snapshot not mounted")


@pytest.fixture(scope="module")
def ab_setup():
    from flope_tpu.eval.reference_ab import make_ab_frames
    from flope_tpu.models import init_posenet

    _, variables = init_posenet(jax.random.PRNGKey(0), image_size=64)
    scene, frames = make_ab_frames(seed=0, n_frames=2, n_flowers=4,
                                   height=320, width=416, max_det=6)
    return variables, scene, frames


def test_reference_ab_512_parity(ab_setup):
    from flope_tpu.eval.reference_ab import run_reference_ab

    variables, scene, frames = ab_setup
    r = run_reference_ab(variables, scene, frames, crop_size=512,
                         reference_root=REFERENCE_ROOT)
    assert r.n_matched >= 4, f"too few matches: {r}"
    # Both sides must agree on which flowers survive filtering.
    assert r.n_ref_only == 0 and r.n_jax_only == 0, r
    assert r.rot_delta_deg_mean < 2.0, r
    assert r.trans_delta_cm_mean < 0.5, r
    assert np.isfinite(r.rot_delta_deg_max)


def test_reference_shims_do_not_shadow_real_packages():
    """Shims are appended to sys.path: installed packages must win."""
    import sys

    from flope_tpu.compat import add_reference_paths

    add_reference_paths(REFERENCE_ROOT)
    import scipy  # real

    assert "compat" not in (scipy.__file__ or "")
    # A shimmed module resolves to our shims dir (roma is not installed here;
    # if it ever gets installed, the real one should win instead).
    import importlib
    roma = importlib.import_module("roma")
    spec_path = roma.__file__ or ""
    assert ("shims" in spec_path) or ("site-packages" in spec_path)
