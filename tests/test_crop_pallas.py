"""Pallas fused crop kernel vs the XLA region path (interpret mode on CPU).

The kernel's contract (ops/crop_pallas.py): same semantics as
crop_resize_with_mask's region path within +-1 uint8 LSB — the sublane-
aligned window shift changes tap coordinates, so f32 sums reassociate and
ties in the uint8 quantize can flip by one.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from flope_tpu.ops.crop_pallas import crop_resize_with_mask_pallas
from flope_tpu.ops.crop_resize import crop_resize_with_mask


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _scene(rng, h=270, w=480):
    img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    mask = (rng.random((h, w)) < 0.5).astype(np.float32) * 255
    return img, mask


class TestCropPallas:
    def test_matches_xla_region_path(self, rng):
        img, mask = _scene(rng)
        boxes = np.array([[40, 30, 160, 150], [200, 100, 380, 260],
                          [0, 0, 0, 0]], np.float32)
        want = np.asarray(crop_resize_with_mask(
            jnp.asarray(img), jnp.asarray(mask), jnp.asarray(boxes),
            out_size=64, region_size=192))
        got = np.asarray(crop_resize_with_mask_pallas(
            jnp.asarray(img), jnp.asarray(mask), jnp.asarray(boxes),
            out_size=64, region_size=192, interpret=True))
        assert got.shape == want.shape == (3, 64, 64, 3)
        assert np.abs(want - got).max() <= 1.0

    def test_bottom_edge_box_alignment(self, rng):
        """A box hugging the frame bottom forces the aligned window past
        h; the zero-padded rows must not leak into the crop."""
        img, mask = _scene(rng)
        mask[:] = 255.0
        boxes = np.array([[300, 150, 440, 268]], np.float32)
        want = np.asarray(crop_resize_with_mask(
            jnp.asarray(img), jnp.asarray(mask), jnp.asarray(boxes),
            out_size=64, region_size=192))
        got = np.asarray(crop_resize_with_mask_pallas(
            jnp.asarray(img), jnp.asarray(mask), jnp.asarray(boxes),
            out_size=64, region_size=192, interpret=True))
        # image quantize and mask quantize can each tie-flip 1 LSB
        assert np.abs(want - got).max() <= 2.0
        # Bottom rows of the crop must carry real content, not pad zeros.
        assert got[0, -1].mean() > 1.0

    def test_degenerate_and_padded_lanes_finite(self, rng):
        img, mask = _scene(rng)
        boxes = np.zeros((4, 4), np.float32)
        got = np.asarray(crop_resize_with_mask_pallas(
            jnp.asarray(img), jnp.asarray(mask), jnp.asarray(boxes),
            out_size=64, region_size=192, interpret=True))
        assert np.isfinite(got).all()

    def test_bf16_close_to_f32(self, rng):
        img, mask = _scene(rng)
        boxes = np.array([[40, 30, 160, 150]], np.float32)
        a = np.asarray(crop_resize_with_mask_pallas(
            jnp.asarray(img), jnp.asarray(mask), jnp.asarray(boxes),
            out_size=64, region_size=192, interpret=True))
        b = np.asarray(crop_resize_with_mask_pallas(
            jnp.asarray(img), jnp.asarray(mask), jnp.asarray(boxes),
            out_size=64, region_size=192, compute_dtype=jnp.bfloat16,
            interpret=True))
        assert np.abs(a - b).max() <= 4.0  # bf16 taps: image+mask LSBs compound

    def test_nchw_layout_matches_nhwc(self, rng):
        """layout='NCHW' returns the kernel's native planar crops; they must
        be exactly the NHWC result transposed (no transpose in-graph)."""
        img, mask = _scene(rng)
        boxes = np.array([[40, 30, 160, 150], [200, 100, 380, 260],
                          [0, 0, 0, 0]], np.float32)
        nhwc = np.asarray(crop_resize_with_mask_pallas(
            jnp.asarray(img), jnp.asarray(mask), jnp.asarray(boxes),
            out_size=64, region_size=192, interpret=True))
        planar = np.asarray(crop_resize_with_mask_pallas(
            jnp.asarray(img), jnp.asarray(mask), jnp.asarray(boxes),
            out_size=64, region_size=192, interpret=True, layout="NCHW"))
        assert nhwc.shape == (3, 64, 64, 3)
        assert planar.shape == (3, 3, 64, 64)
        np.testing.assert_array_equal(planar.transpose(0, 2, 3, 1), nhwc)

    def test_nchw_layout_batched(self, rng):
        img, mask = _scene(rng)
        imgs = np.stack([img, img[::-1].copy()])
        masks = np.stack([mask, mask])
        boxes = np.array([[[40, 30, 160, 150]], [[200, 100, 380, 260]]],
                         np.float32)
        nhwc = np.asarray(crop_resize_with_mask_pallas(
            jnp.asarray(imgs), jnp.asarray(masks), jnp.asarray(boxes),
            out_size=64, region_size=192, interpret=True))
        planar = np.asarray(crop_resize_with_mask_pallas(
            jnp.asarray(imgs), jnp.asarray(masks), jnp.asarray(boxes),
            out_size=64, region_size=192, interpret=True, layout="NCHW"))
        assert nhwc.shape == (2, 1, 64, 64, 3)
        assert planar.shape == (2, 1, 3, 64, 64)
        np.testing.assert_array_equal(planar.transpose(0, 1, 3, 4, 2), nhwc)

    def test_region_multiple_of_16_required(self, rng):
        img, mask = _scene(rng)
        boxes = np.zeros((1, 4), np.float32)
        with pytest.raises(ValueError, match="multiple of 16"):
            crop_resize_with_mask_pallas(
                jnp.asarray(img), jnp.asarray(mask), jnp.asarray(boxes),
                out_size=64, region_size=100, interpret=True)
