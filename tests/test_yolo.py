"""YOLO11-seg structural + decode + postprocess tests (CPU, tiny inputs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flope_tpu.models.yolo import (
    SCALES,
    Yolo11Seg,
    decode_predictions,
    postprocess,
    init_yolo,
)


@pytest.fixture(scope="module")
def tiny_yolo():
    return init_yolo(jax.random.PRNGKey(0), image_size=96)


class TestArchitecture:
    def test_level_shapes(self, tiny_yolo):
        model, v = tiny_yolo
        raw = model.apply(v, jnp.zeros((2, 96, 96, 3)), train=False)
        assert [b.shape[1] for b in raw["box"]] == [12, 6, 3]  # /8 /16 /32
        assert raw["box"][0].shape == (2, 12, 12, 64)          # 4*reg_max
        assert raw["cls"][0].shape == (2, 12, 12, 1)           # single class
        assert raw["mc"][0].shape == (2, 12, 12, 32)
        assert raw["proto"].shape == (2, 24, 24, 32)           # /4

    def test_nano_param_count_plausible(self, tiny_yolo):
        # ultralytics YOLO11n-seg is ~2.9M params; ours must land in the
        # same class (exact equality isn't expected: head width details vary).
        _, v = tiny_yolo
        n = sum(x.size for x in jax.tree.leaves(v["params"]))
        assert 2e6 < n < 4.5e6, n

    def test_train_mode_updates_stats(self, tiny_yolo):
        model, v = tiny_yolo
        out, updates = model.apply(v, jnp.ones((1, 96, 96, 3)), train=True,
                                   mutable=["batch_stats"])
        before = jax.tree.leaves(v["batch_stats"])
        after = jax.tree.leaves(updates["batch_stats"])
        assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
                   for a, b in zip(before, after))


class TestDecode:
    def test_dfl_decode_against_oracle(self, tiny_yolo, rng):
        """DFL: softmax-expectation distances around cell centers x stride."""
        model, v = tiny_yolo
        raw = model.apply(v, jnp.asarray(
            rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)), train=False)
        dec = decode_predictions(raw)
        # Oracle for level 0 cell (i, j):
        b0 = np.asarray(raw["box"][0][0], np.float64)  # (12,12,64)
        i, j = 5, 7
        logits = b0[i, j].reshape(4, 16)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        dist = (e / e.sum(-1, keepdims=True)) @ np.arange(16.0)
        cx, cy, s = j + 0.5, i + 0.5, 8.0
        want = np.array([(cx - dist[0]) * s, (cy - dist[1]) * s,
                         (cx + dist[2]) * s, (cy + dist[3]) * s])
        got = np.asarray(dec["boxes"][0][i * 12 + j])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_scores_are_sigmoid(self, tiny_yolo):
        model, v = tiny_yolo
        raw = model.apply(v, jnp.zeros((1, 96, 96, 3)), train=False)
        dec = decode_predictions(raw)
        s = np.asarray(dec["scores"])
        assert (s >= 0).all() and (s <= 1).all()


class TestPostprocess:
    def _fake_decoded(self, boxes, scores, a_total=64, nm=32):
        n = len(boxes)
        d_boxes = np.zeros((a_total, 4), np.float32)
        d_scores = np.zeros((a_total, 1), np.float32)
        d_mc = np.zeros((a_total, nm), np.float32)
        d_boxes[:n] = boxes
        d_scores[:n, 0] = scores
        d_mc[:n] = 5.0  # strongly positive coefficients
        return {"boxes": jnp.asarray(d_boxes), "scores": jnp.asarray(d_scores),
                "mc": jnp.asarray(d_mc)}

    def test_nms_and_compaction(self):
        boxes = np.array([[10, 10, 50, 50], [12, 12, 52, 52], [100, 100, 140, 140]],
                         np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        dec = self._fake_decoded(boxes, scores)
        proto = jnp.ones((40, 40, 32)) * 0.2
        out = postprocess(dec, proto, max_det=4, score_th=0.25, iou_th=0.5, topk=16)
        valid = np.asarray(out["valid"])
        assert valid.tolist() == [True, True, False, False]  # 2 kept, compacted
        np.testing.assert_array_equal(np.asarray(out["boxes"])[0], [10, 10, 50, 50])
        np.testing.assert_array_equal(np.asarray(out["boxes"])[1], [100, 100, 140, 140])
        assert np.asarray(out["scores"])[0] == pytest.approx(0.9)

    def test_masks_cropped_to_boxes_and_union(self):
        boxes = np.array([[0, 0, 80, 80]], np.float32)  # proto coords /4 -> 20x20
        dec = self._fake_decoded(boxes, np.array([0.9], np.float32))
        proto = jnp.ones((40, 40, 32)) * 0.2
        out = postprocess(dec, proto, max_det=4, score_th=0.25, iou_th=0.5, topk=16)
        masks = np.asarray(out["masks"])
        assert masks[0][:20, :20].min() > 0.5   # inside box: confident
        assert masks[0][25:, 25:].max() == 0.0  # outside box: cropped
        union = np.asarray(out["union_mask"])
        assert union.max() <= 1.0 and union[:20, :20].max() > 0.5

    def test_refine_boxes_from_mask(self):
        """refine_boxes=True: regressed box replaced by the instance-mask
        tight box (models/yolo.py postprocess)."""
        boxes = np.array([[0, 0, 120, 120]], np.float32)  # loose box
        dec = self._fake_decoded(boxes, np.array([0.9], np.float32))
        # Proto positive only in a small region -> mask occupies
        # [4..12) x [6..10) proto cells = pixels x:[16,48) y:[24,40).
        proto = np.full((40, 40, 32), -5.0, np.float32)
        proto[6:10, 4:12] = 5.0
        out = postprocess(dec, jnp.asarray(proto), max_det=4, score_th=0.25,
                          iou_th=0.5, topk=16, refine_boxes=True)
        np.testing.assert_array_equal(np.asarray(out["boxes"])[0],
                                      [16, 24, 48, 40])
        # Empty-mask detections keep the regressed box.
        proto_neg = jnp.full((40, 40, 32), -5.0)
        out2 = postprocess(dec, proto_neg, max_det=4, score_th=0.25,
                           iou_th=0.5, topk=16, refine_boxes=True)
        np.testing.assert_array_equal(np.asarray(out2["boxes"])[0],
                                      [0, 0, 120, 120])

    def test_below_threshold_invalid(self):
        boxes = np.array([[10, 10, 50, 50]], np.float32)
        dec = self._fake_decoded(boxes, np.array([0.1], np.float32))
        proto = jnp.zeros((40, 40, 32))
        out = postprocess(dec, proto, max_det=4, score_th=0.25, iou_th=0.5, topk=16)
        assert not np.asarray(out["valid"]).any()

    def test_overflow_beyond_max_det_dropped(self):
        n = 8
        boxes = np.stack([np.array([i * 60, 0, i * 60 + 40, 40]) for i in range(n)]
                         ).astype(np.float32)
        scores = np.linspace(0.9, 0.5, n).astype(np.float32)
        dec = self._fake_decoded(boxes, scores)
        proto = jnp.zeros((40, 40, 32))
        out = postprocess(dec, proto, max_det=4, score_th=0.25, iou_th=0.5, topk=16)
        assert np.asarray(out["valid"]).sum() == 4
        # Highest scores retained.
        np.testing.assert_allclose(np.asarray(out["scores"]),
                                   scores[:4], rtol=1e-5)


class TestScales:
    def test_scale_table(self):
        assert set(SCALES) == {"n", "s", "m", "l"}

    def test_s_scale_builds(self):
        model = Yolo11Seg(scale="s")
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                       train=False)
        n = sum(x.size for x in jax.tree.leaves(v["params"]))
        assert n > 8e6  # s is ~4x n
