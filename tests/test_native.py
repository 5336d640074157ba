"""Native crop renderer: bit-parity vs the numpy reference path."""

import numpy as np
import pytest

from flope_tpu.data.synthetic import render_flower_crop
from flope_tpu.native import native_available, render_crops_native


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
class TestNativeCropRender:
    def test_matches_numpy_renderer(self, rng):
        from scipy.spatial.transform import Rotation as sciR

        n, size = 12, 96
        R = sciR.random(n, random_state=3).as_matrix()
        offs = rng.uniform(-0.08, 0.08, size=(n, 2))
        fills = rng.uniform(0.8, 1.1, size=n)
        got = render_crops_native(R, offs, fills, size)
        assert got.shape == (n, size, size, 3) and got.dtype == np.uint8
        for i in range(n):
            want = render_flower_crop(
                R[i], size, fill=float(fills[i]),
                center_offset=(float(offs[i, 0]), float(offs[i, 1])))
            diff = got[i].astype(int) - want.astype(int)
            # Identical up to float rounding at uint8 truncation boundaries.
            assert np.abs(diff).max() <= 1
            frac = (diff != 0).mean()
            assert frac < 1e-3, f"crop {i}: {frac:.4%} pixels differ"

    def test_default_centered_crop(self):
        R = np.eye(3)[None]
        got = render_crops_native(R, np.zeros((1, 2)), np.array([0.85]), 64)
        want = render_flower_crop(np.eye(3), 64)
        np.testing.assert_array_equal(got[0], want)

    def test_synthetic_crops_uses_it(self):
        from flope_tpu.data.posenet_dataset import synthetic_crops

        d = synthetic_crops(4, size=48, seed=0, box_jitter=0.05)
        assert d["images"].shape == (4, 48, 48, 3)
        assert np.isfinite(d["images"]).all()
        assert d["images"].max() <= 1.0
