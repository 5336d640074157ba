"""YOLO training tests: assignment semantics, loss behavior, learning smoke.

CPU jit-compiles of the full YOLO grad graph cost ~40 s each, so everything
model-dependent shares ONE module-scoped model + train step at 64 px.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from flope_tpu.models.yolo import init_yolo
from flope_tpu.train.yolo_train import (
    YoloTrainConfig,
    make_anchors,
    ciou,
    assign_targets,
    yolo_loss,
    make_yolo_train_step,
)

CFG = YoloTrainConfig(image_size=64, max_gt=4)


@pytest.fixture(scope="module")
def setup():
    model, v = init_yolo(jax.random.PRNGKey(0), image_size=64)
    tx = optax.adamw(1e-3)
    step = make_yolo_train_step(model, tx, CFG)
    return model, v, tx, step


class TestAnchors:
    def test_counts_and_strides(self):
        pts, strides = make_anchors(64)
        assert pts.shape == (8 * 8 + 4 * 4 + 2 * 2, 2)
        assert float(strides[0]) == 8.0 and float(strides[-1]) == 32.0
        np.testing.assert_allclose(np.asarray(pts[0]), [4.0, 4.0])  # (0.5*8)


class TestCIoU:
    def test_identical_is_one(self):
        b = jnp.asarray([[10.0, 10, 50, 50]])
        assert float(ciou(b, b)[0]) == pytest.approx(1.0, abs=1e-5)

    def test_disjoint_negative(self):
        a = jnp.asarray([[0.0, 0, 10, 10]])
        b = jnp.asarray([[100.0, 100, 110, 110]])
        assert float(ciou(a, b)[0]) < 0.0

    def test_monotone_in_overlap(self):
        a = jnp.asarray([[0.0, 0, 40, 40]])
        near = jnp.asarray([[5.0, 5, 45, 45]])
        far = jnp.asarray([[20.0, 20, 60, 60]])
        assert float(ciou(a, near)[0]) > float(ciou(a, far)[0])


class TestAssignment:
    def test_anchor_inside_gt_assigned(self):
        pts, _ = make_anchors(64)
        a = pts.shape[0]
        gt = jnp.asarray([[8.0, 8, 40, 40], [0, 0, 0, 0]])
        gtv = jnp.asarray([True, False])
        pred = jnp.tile(gt[0], (a, 1))
        scores = jnp.ones((a,)) * 0.9
        asg = assign_targets(pts, pred, scores, gt, gtv, CFG)
        fg = np.asarray(asg["fg"])
        inside = np.asarray((pts[:, 0] > 8) & (pts[:, 0] < 40)
                            & (pts[:, 1] > 8) & (pts[:, 1] < 40))
        assert fg.sum() > 0
        assert (fg <= inside).all()
        assert (np.asarray(asg["gt_idx"])[fg] == 0).all()

    def test_no_gt_no_fg(self):
        pts, _ = make_anchors(64)
        a = pts.shape[0]
        asg = assign_targets(pts, jnp.zeros((a, 4)), jnp.ones((a,)),
                             jnp.zeros((2, 4)), jnp.zeros(2, bool), CFG)
        assert not np.asarray(asg["fg"]).any()
        assert np.asarray(asg["cls_target"]).sum() == 0

    def test_conflict_resolved_to_best(self):
        pts, _ = make_anchors(64)
        a = pts.shape[0]
        gt = jnp.asarray([[8.0, 8, 40, 40], [10.0, 10, 42, 42]])
        gtv = jnp.asarray([True, True])
        pred = jnp.tile(gt[0], (a, 1))
        asg = assign_targets(pts, pred, jnp.ones((a,)) * 0.9, gt, gtv, CFG)
        fg = np.asarray(asg["fg"])
        overlap = np.asarray((pts[:, 0] > 10) & (pts[:, 0] < 40)
                             & (pts[:, 1] > 10) & (pts[:, 1] < 40))
        chosen = np.asarray(asg["gt_idx"])
        assert (chosen[fg & overlap] == 0).all()


class TestLossAndLearning:
    def test_loss_finite_and_positive(self, setup):
        model, v, _, _ = setup
        raw = model.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
        gtb = jnp.asarray([[[10.0, 10, 40, 40], [44, 44, 60, 60],
                            [0, 0, 0, 0], [0, 0, 0, 0]]])
        gtv = jnp.asarray([[True, True, False, False]])
        gtm = jnp.zeros((1, 4, 16, 16)).at[:, 0, 3:10, 3:10].set(1.0)
        total, parts = yolo_loss(raw, gtb, gtv, gtm, CFG)
        assert np.isfinite(float(total)) and float(total) > 0
        for k, x in parts.items():
            assert np.isfinite(float(x)), k
        # Empty GT: box loss must vanish, total stays finite.
        total2, parts2 = yolo_loss(raw, gtb, jnp.zeros((1, 4), bool), gtm, CFG)
        assert np.isfinite(float(total2))
        assert float(parts2["box"]) == 0.0

    def test_train_step_learns_on_fixed_batch(self, setup):
        _, v, tx, step = setup
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        gtb = jnp.asarray([[[16.0, 16, 48, 48]] + [[0, 0, 0, 0]] * 3])
        gtv = jnp.asarray([[True, False, False, False]])
        gtm = jnp.zeros((1, 4, 16, 16)).at[:, 0, 4:12, 4:12].set(1.0)
        params, stats = v["params"], v["batch_stats"]
        opt = tx.init(params)
        losses = []
        for _ in range(6):
            params, stats, opt, m = step(params, stats, opt, images, gtb, gtv, gtm)
            losses.append(float(m["total"]))
            assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0], losses
