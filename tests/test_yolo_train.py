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

    def test_seg_loss_topk_gather_is_exact(self, setup):
        """The seg loss gathers a top-K anchor superset before the mask BCE
        (the old all-anchor formulation OOM'd at det 640). Oracle: recompute
        the seg term over ALL anchors and assert the production loss
        matches — valid because task-aligned assignment bounds fg anchors
        at topk * MAX_GT, all of which the gather covers."""
        import optax as _optax
        from flope_tpu.models.yolo import decode_predictions
        model, v, _, _ = setup
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
        raw = model.apply(v, img, train=False)
        gtb = jnp.asarray([[[8.0, 8, 30, 30], [34, 20, 60, 52],
                            [12, 40, 28, 60], [0, 0, 0, 0]]])
        gtv = jnp.asarray([[True, True, True, False]])
        gtm = jnp.asarray(rng.random((1, 4, 16, 16)) < 0.4, jnp.float32)
        _, parts = yolo_loss(raw, gtb, gtv, gtm, CFG)

        # Full-anchor oracle for the seg term (image 0).
        anchor_pts, _ = make_anchors(CFG.image_size)
        dec = decode_predictions(raw)
        asg = assign_targets(anchor_pts, dec["boxes"][0],
                             dec["scores"][0][:, 0], gtb[0], gtv[0], CFG)
        fg = asg["fg"]
        n_fg = jnp.maximum(jnp.sum(asg["cls_target"]), 1.0)
        proto = raw["proto"][0]
        hp, wp = proto.shape[0], proto.shape[1]
        pm = jnp.einsum("am,hwm->ahw", dec["mc"][0], proto)
        tm = gtm[0][asg["gt_idx"]]
        bce = _optax.sigmoid_binary_cross_entropy(pm, tm)
        bx = gtb[0][asg["gt_idx"]] / 4.0
        ys = jax.lax.broadcasted_iota(jnp.float32, (1, hp, 1), 1)
        xs = jax.lax.broadcasted_iota(jnp.float32, (1, 1, wp), 2)
        in_box = ((xs >= bx[:, 0, None, None]) & (xs < bx[:, 2, None, None])
                  & (ys >= bx[:, 1, None, None]) & (ys < bx[:, 3, None, None]))
        area = jnp.maximum((bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1]), 1.0)
        per = jnp.sum(jnp.where(in_box, bce, 0.0), axis=(1, 2)) / area
        want = float(jnp.sum(jnp.where(fg, per, 0.0)) / n_fg)
        assert int(np.asarray(fg).sum()) > 0  # the oracle must be non-trivial
        np.testing.assert_allclose(float(parts["seg"]), want, rtol=1e-5)

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


class TestNonFiniteGuard:
    """One pathological batch must cost one step, not the run.

    Observed blowups: flat YOLO NaN at epoch 148/150, hard-1600 warm-started
    runs NaN at epochs 6 and 17 at two different LRs — the guarded optimizer
    (make_yolo_optimizer) skips the update and the train step gates the
    batch-norm running stats on gradient finiteness.
    """

    def test_optimizer_skips_nonfinite_update(self):
        from flope_tpu.train.yolo_train import make_yolo_optimizer
        tx = make_yolo_optimizer(1e-2, CFG, clip_norm=1.0)
        params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
        opt = tx.init(params)
        good = {"w": jnp.full((4,), 100.0), "b": jnp.ones((2,))}

        # Finite grads: applied, and clipped to global norm 1.
        up, opt = tx.update(good, opt, params)
        norm = float(optax.global_norm(up))
        assert 0 < norm, "finite update must be applied"
        p1 = optax.apply_updates(params, up)

        # Poisoned grads: the update must be exactly zero (params untouched)
        # and the inner optimizer state must be restored, not advanced.
        bad = {"w": jnp.array([1.0, jnp.nan, 1.0, 1.0]), "b": jnp.ones((2,))}
        up2, opt2 = tx.update(bad, opt, p1)
        assert all(float(jnp.abs(u).max()) == 0.0 for u in jax.tree.leaves(up2))
        assert int(opt2.notfinite_count) == 1

        # Recovery: the next finite step applies again.
        up3, opt3 = tx.update(good, opt2, p1)
        assert float(optax.global_norm(up3)) > 0
        assert int(opt3.notfinite_count) == 0

    def test_assignment_is_stop_gradient(self):
        """Targets must carry NO gradient back into predictions: x**0.5 has
        an infinite derivative at 0, and background sigmoid scores underflow
        to exactly 0.0 once training pushes their logits past ~-90 — the
        root cause of the hard-1600 run's skip rate climbing to ~90% of
        steps by epoch 25 (and of the three pre-guard NaN blowups)."""
        pts = jnp.stack([jnp.linspace(2.0, 62, 16),
                         jnp.linspace(2.0, 62, 16)], -1)
        gtb = jnp.asarray([[0.0, 0, 64, 64]])
        gtv = jnp.asarray([True])
        boxes = jnp.tile(jnp.asarray([[1.0, 1, 63, 63]]), (16, 1))

        def targets_sum(logits):
            asg = assign_targets(pts, jax.lax.stop_gradient(boxes),
                                 jax.lax.stop_gradient(jax.nn.sigmoid(logits)),
                                 gtb, gtv, CFG)
            return jnp.sum(asg["cls_target"])

        # Underflowed sigmoid (exactly 0.0): grad must be exactly zero, not
        # NaN/inf (without stop_gradient it is NaN — the regression).
        g = jax.grad(targets_sum)(jnp.full((16,), -200.0))
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_loss_grad_finite_with_underflowed_scores(self, setup):
        """End-to-end: the full loss gradient stays finite when the class
        head's sigmoid underflows (bias forced to -200)."""
        model, v, _, _ = setup
        images = jnp.zeros((1, 64, 64, 3))
        gtb = jnp.asarray([[[16.0, 16, 48, 48]] + [[0, 0, 0, 0]] * 3])
        gtv = jnp.asarray([[True, False, False, False]])
        gtm = jnp.zeros((1, 4, 16, 16)).at[:, 0, 4:12, 4:12].set(1.0)

        def poison(path, leaf):
            keys = jax.tree_util.keystr(path)
            if "cls" in keys and "bias" in keys:
                return jnp.full_like(leaf, -200.0)
            return leaf

        params = jax.tree_util.tree_map_with_path(poison, v["params"])

        def loss_fn(p):
            raw = model.apply({"params": p,
                               "batch_stats": v["batch_stats"]},
                              images, train=False)
            total, _ = yolo_loss(raw, gtb, gtv, gtm, CFG)
            return total

        grads = jax.grad(loss_fn)(params)
        for leaf in jax.tree.leaves(grads):
            assert bool(jnp.all(jnp.isfinite(leaf)))

    def test_optimizer_never_gives_up(self):
        """optax.apply_if_finite APPLIES the NaN update once notfinite_count
        exceeds max_consecutive_errors — the guarded optimizer must be
        configured so that give-up path is unreachable; aborting is the
        training loop's job (scripts/train_yolo_seg.py --max-skips)."""
        from flope_tpu.train.yolo_train import make_yolo_optimizer
        tx = make_yolo_optimizer(1e-2, CFG, clip_norm=1.0)
        params = {"w": jnp.ones((4,))}
        opt = tx.init(params)
        bad = {"w": jnp.array([1.0, jnp.nan, 1.0, 1.0])}
        for i in range(200):
            up, opt = tx.update(bad, opt, params)
            assert all(float(jnp.abs(u).max()) == 0.0
                       for u in jax.tree.leaves(up)), f"NaN applied at {i}"
        assert int(opt.notfinite_count) == 200
        params = optax.apply_updates(params, up)
        assert np.isfinite(np.asarray(params["w"])).all()

    def test_step_gates_batch_stats_on_nan_batch(self, setup):
        _, v, tx, step = setup
        rng = np.random.default_rng(1)
        gtb = jnp.asarray([[[16.0, 16, 48, 48]] + [[0, 0, 0, 0]] * 3])
        gtv = jnp.asarray([[True, False, False, False]])
        gtm = jnp.zeros((1, 4, 16, 16)).at[:, 0, 4:12, 4:12].set(1.0)
        params, stats = v["params"], v["batch_stats"]
        opt = tx.init(params)
        nan_images = jnp.full((1, 64, 64, 3), jnp.nan, jnp.float32)
        _, new_stats, _, m = step(params, stats, opt, nan_images, gtb, gtv, gtm)
        assert float(m["skipped"]) == 1.0
        # Running stats must be byte-identical to the pre-step stats.
        for old, new in zip(jax.tree.leaves(stats), jax.tree.leaves(new_stats)):
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


class TestAugment:
    """augment_batch: label consistency under flips + bounded photometrics."""

    def _batch(self, seed=0, b=4, s=64, g=4):
        rng = np.random.default_rng(seed)
        images = rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32)
        x1 = rng.uniform(0, s - 16, (b, g)).astype(np.float32)
        y1 = rng.uniform(0, s - 16, (b, g)).astype(np.float32)
        w = rng.uniform(8, 16, (b, g)).astype(np.float32)
        h = rng.uniform(8, 16, (b, g)).astype(np.float32)
        boxes = np.stack([x1, y1, x1 + w, y1 + h], -1)
        masks = (rng.uniform(0, 1, (b, g, s // 4, s // 4)) > 0.5).astype(
            np.float32)
        return jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(masks)

    def test_boxes_stay_ordered_and_in_frame(self):
        from flope_tpu.train.yolo_train import augment_batch
        images, boxes, masks = self._batch()
        for seed in range(4):
            _, b2, _ = augment_batch(jax.random.PRNGKey(seed), images, boxes,
                                     masks, 64)
            b2 = np.asarray(b2)
            assert (b2[..., 2] > b2[..., 0]).all()
            assert (b2[..., 3] > b2[..., 1]).all()
            assert (b2 >= 0).all() and (b2 <= 64).all()
            # Box sizes are preserved exactly by flips.
            np.testing.assert_allclose(
                b2[..., 2] - b2[..., 0],
                np.asarray(boxes[..., 2] - boxes[..., 0]), rtol=1e-6)

    def test_mask_follows_image_flip(self):
        """Paint one GT box into the image; after augmentation the painted
        region must still be where the (flipped) box says it is."""
        from flope_tpu.train.yolo_train import augment_batch
        s = 64
        images = np.zeros((2, s, s, 3), np.float32)
        boxes = np.tile(np.array([8.0, 16.0, 24.0, 40.0], np.float32),
                        (2, 1, 1))
        images[:, 16:40, 8:24] = 1.0
        masks = np.zeros((2, 1, s // 4, s // 4), np.float32)
        masks[:, 0, 4:10, 2:6] = 1.0
        for seed in range(6):
            im2, b2, m2 = augment_batch(
                jax.random.PRNGKey(seed), jnp.asarray(images),
                jnp.asarray(boxes), jnp.asarray(masks), s)
            im2, b2, m2 = map(np.asarray, (im2, b2, m2))
            for i in range(2):
                x1, y1, x2, y2 = b2[i, 0].round().astype(int)
                # photometric jitter keeps painted >> unpainted
                inside = im2[i, y1:y2, x1:x2].mean()
                outside = im2[i].mean() * s * s / max(
                    (s * s - (x2 - x1) * (y2 - y1)), 1)
                assert inside > 0.3
                # proto-res mask inside the box/4 region
                mx1, my1, mx2, my2 = (np.array([x1, y1, x2, y2]) / 4).round(
                ).astype(int)
                assert m2[i, 0, my1:my2, mx1:mx2].mean() > 0.9
                assert m2[i, 0].sum() == masks[i, 0].sum()

    def test_augmented_step_runs(self, setup):
        from flope_tpu.train.yolo_train import make_yolo_train_step
        model, v, tx, _ = setup
        step = make_yolo_train_step(model, tx, CFG, augment=True)
        images, boxes, masks = self._batch(b=2)
        valid = jnp.ones(boxes.shape[:2], bool)
        opt = tx.init(v["params"])
        p, s, o, m = step(v["params"], v["batch_stats"], opt, images, boxes,
                          valid, masks, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["total"]))
