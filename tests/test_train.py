"""Training tests: loss/metric semantics, learning on synthetic crops,
data-parallel mesh step, checkpoint round trip, disk dataset round trip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scipy.spatial.transform import Rotation as sciR

from flope_tpu.data.posenet_dataset import (
    load_crop_dataset,
    synthetic_crops,
    write_crop_dataset,
)
from flope_tpu.parallel import make_mesh
from flope_tpu.train import (
    TrainConfig,
    chordal_loss,
    angle_error_deg,
    create_train_state,
    make_optimizer,
    make_train_step,
    make_eval_step,
    train_posenet,
)

SMALL = dict(image_size=48, ckpt_dir=None, log_path=None)


class TestLossMetrics:
    def test_chordal_matches_torch_mse_semantics(self, rng):
        """train_posenet.py:40-41 — mean over ALL matrix elements."""
        a = rng.normal(size=(8, 3, 3)).astype(np.float32)
        b = rng.normal(size=(8, 3, 3)).astype(np.float32)
        got = float(chordal_loss(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, np.mean((a - b) ** 2), rtol=1e-6)

    def test_angle_error_zero_for_identical(self, rng):
        R = sciR.random(6, random_state=0).as_matrix()
        err = float(angle_error_deg(jnp.asarray(R), jnp.asarray(R)))
        assert err < 0.5  # float32 acos noise near 1.0

    def test_angle_error_known_rotation(self):
        R1 = np.eye(3)[None]
        R2 = sciR.from_euler("y", 30, degrees=True).as_matrix()[None]
        err = float(angle_error_deg(jnp.asarray(R1), jnp.asarray(R2)))
        np.testing.assert_allclose(err, 30.0, atol=0.1)


class TestTrainingLearns:
    def test_loss_and_angle_decrease(self):
        cfg = TrainConfig(optimizer="adamw", lr=3e-4, batch_size=32,
                          epochs=4, dropout=0.0, **SMALL)
        data = synthetic_crops(128, size=cfg.image_size, seed=0)
        _, _, hist = train_posenet(cfg, data, epochs=4, log_fn=lambda *_: None)
        assert hist[-1]["train_loss"] < hist[0]["train_loss"] * 0.9
        assert hist[-1]["train_angle"] < hist[0]["train_angle"]

    def test_ema_shadow_trails_params_and_is_released(self):
        """ema_decay>0: the shadow is a smoothed copy (neither frozen at init
        nor equal to the live params), and best/eval use it."""
        cfg = TrainConfig(optimizer="adamw", lr=3e-3, batch_size=32,
                          epochs=3, dropout=0.0, ema_decay=0.9, **SMALL)
        data = synthetic_crops(64, size=cfg.image_size, seed=0)
        model, state, hist = train_posenet(cfg, data, data, epochs=3,
                                           log_fn=lambda *_: None)
        lead = state.params["fc_rot"]["kernel"]
        shadow = state.ema_params["fc_rot"]["kernel"]
        init_model, init_state = create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
        init_k = init_state.params["fc_rot"]["kernel"]
        assert not np.allclose(np.asarray(lead), np.asarray(shadow))
        assert not np.allclose(np.asarray(shadow), np.asarray(init_k))
        # eval path consumes the shadow without error
        ev = make_eval_step(model, use_ema=True)
        m = ev(state, jnp.asarray(data["images"][:8]),
               jnp.asarray(data["rotations"][:8]))
        assert np.isfinite(float(m["angle_deg"]))

    def test_ema_off_has_no_shadow(self):
        cfg = TrainConfig(optimizer="adamw", epochs=1, dropout=0.0, **SMALL)
        _, state = create_train_state(cfg, jax.random.PRNGKey(0))
        assert state.ema_params is None

    def test_cosine_schedule_trains_and_fills_total_steps(self):
        # total_steps=0 must be derived from epochs x steps-per-epoch inside
        # train_posenet; the run must learn at least as well as constant-lr
        # over the same tiny budget (sanity, not a benchmark).
        cfg = TrainConfig(optimizer="adamw", lr=3e-4, lr_schedule="cosine",
                          batch_size=32, epochs=4, dropout=0.0, **SMALL)
        data = synthetic_crops(128, size=cfg.image_size, seed=0)
        _, _, hist = train_posenet(cfg, data, epochs=4, log_fn=lambda *_: None)
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]

    def test_cosine_without_total_steps_raises_outside_trainer(self):
        cfg = TrainConfig(optimizer="adamw", lr_schedule="cosine", **SMALL)
        with pytest.raises(ValueError, match="total_steps"):
            make_optimizer(cfg)

    def test_adadelta_parity_default_runs(self):
        cfg = TrainConfig(batch_size=16, **SMALL)  # optimizer='adadelta'
        data = synthetic_crops(32, size=cfg.image_size, seed=1)
        _, state, hist = train_posenet(cfg, data, epochs=1, log_fn=lambda *_: None)
        assert np.isfinite(hist[0]["train_loss"])
        assert int(state.step) == 2  # 32 samples / batch 16


class TestMeshTraining:
    def test_data_parallel_step_runs_on_8_devices(self):
        mesh = make_mesh({"data": 4, "model": 2})
        cfg = TrainConfig(optimizer="adamw", batch_size=8, dropout=0.0, **SMALL)
        model, state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(model, make_optimizer(cfg), mesh)
        data = synthetic_crops(8, size=cfg.image_size, seed=2)
        with mesh:
            state, m = step(state, jnp.asarray(data["images"]),
                            jnp.asarray(data["rotations"]), jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
        assert int(state.step) == 1

    def test_mesh_step_matches_single_device(self):
        cfg = TrainConfig(optimizer="adamw", batch_size=8, dropout=0.0, **SMALL)
        data = synthetic_crops(8, size=cfg.image_size, seed=3)
        outs = []
        for mesh in [None, make_mesh({"data": 8, "model": 1})]:
            model, state = create_train_state(cfg, jax.random.PRNGKey(0))
            step = make_train_step(model, make_optimizer(cfg), mesh)
            ctx = mesh if mesh is not None else _null_ctx()
            with ctx:
                state, m = step(state, jnp.asarray(data["images"]),
                                jnp.asarray(data["rotations"]),
                                jax.random.PRNGKey(1))
            outs.append(float(m["loss"]))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4)


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class TestDonation:
    """Donated-buffer correctness (SURVEY.md §5.2): make_train_step donates
    the input state (donate_argnums=(0,), posenet_train.py); aliasing bugs
    would corrupt the in-place-rewritten params/opt buffers mid-update, so
    the donating trajectory must match a non-donating one exactly."""

    def test_donating_trajectory_matches_undonated(self):
        cfg = TrainConfig(optimizer="adamw", batch_size=8, dropout=0.0, **SMALL)
        data = synthetic_crops(8, size=cfg.image_size, seed=5)
        images = jnp.asarray(data["images"])
        rots = jnp.asarray(data["rotations"])

        losses = {}
        final_params = {}
        for donate in (False, True):
            model, state = create_train_state(cfg, jax.random.PRNGKey(0))
            step = make_train_step(model, make_optimizer(cfg), donate=donate)
            ls = []
            for i in range(3):
                state, m = step(state, images, rots, jax.random.PRNGKey(i))
                ls.append(float(m["loss"]))
            losses[donate] = ls
            final_params[donate] = jax.tree.leaves(state.params)[0]
        np.testing.assert_array_equal(losses[True], losses[False])
        np.testing.assert_array_equal(np.asarray(final_params[True]),
                                      np.asarray(final_params[False]))

    def test_donated_state_buffers_are_consumed(self):
        cfg = TrainConfig(optimizer="adamw", batch_size=8, dropout=0.0, **SMALL)
        data = synthetic_crops(8, size=cfg.image_size, seed=6)
        model, state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(model, make_optimizer(cfg))
        old_leaf = jax.tree.leaves(state.params)[0]
        state2, _ = step(state, jnp.asarray(data["images"]),
                         jnp.asarray(data["rotations"]), jax.random.PRNGKey(1))
        jax.block_until_ready(state2.step)
        if old_leaf.is_deleted():
            # Donation honored: stale reads must fail loudly, not silently
            # return rewritten memory.
            with pytest.raises(Exception):
                np.asarray(old_leaf) + 0
        else:
            pytest.skip("backend did not honor donation (no aliasing risk)")


class TestCheckpointRoundtrip:
    def test_orbax_save_restore(self, tmp_path):
        import orbax.checkpoint as ocp
        cfg = TrainConfig(optimizer="adamw", **SMALL)
        model, state = create_train_state(cfg, jax.random.PRNGKey(0))
        tree = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step}
        ckptr = ocp.StandardCheckpointer()
        path = tmp_path / "ckpt_e0"
        ckptr.save(path, tree)
        ckptr.wait_until_finished()
        restored = ckptr.restore(path)
        flat1 = jax.tree_util.tree_leaves(tree)
        flat2 = jax.tree_util.tree_leaves(restored)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


    def test_npz_release_roundtrip(self, tmp_path):
        """save_npz_ckpt -> load_ckpt: the single-file release format (bf16
        floats, raw ints) that lets deployed weights live in git."""
        from flope_tpu.utils.checkpoint import (check_ckpt_meta, load_ckpt,
                                                save_npz_ckpt)
        cfg = TrainConfig(optimizer="adamw", **SMALL)
        model, state = create_train_state(cfg, jax.random.PRNGKey(0))
        tree = {"params": state.params, "batch_stats": state.batch_stats,
                "step": np.int32(7)}
        path = tmp_path / "rel" / "posenet.npz"
        save_npz_ckpt(path, tree, image_size=48)
        restored = load_ckpt(path)
        p1, t1 = jax.tree_util.tree_flatten_with_path(tree)[0], None
        flat2 = dict(jax.tree_util.tree_flatten_with_path(restored)[0])
        assert len(p1) == len(flat2)
        import ml_dtypes
        for kp, a in p1:
            b = flat2[kp]
            a = np.asarray(a)
            assert np.asarray(b).shape == a.shape
            if np.issubdtype(a.dtype, np.floating):
                # exact at bf16 precision, restored as float32
                np.testing.assert_array_equal(
                    np.asarray(b), a.astype(ml_dtypes.bfloat16).astype(np.float32))
            else:
                np.testing.assert_array_equal(np.asarray(b), a)
        # meta sidecar participates in the config-mismatch warning
        warnings = []
        check_ckpt_meta(path, warn=warnings.append, image_size=512)
        assert len(warnings) == 1


class TestCkptDirResolution:
    def test_run_dir_resolves_to_best_then_highest_epoch(self, tmp_path):
        from flope_tpu.utils.checkpoint import _resolve_ckpt_dir
        run = tmp_path / "run"
        for name in ["posenet_e7", "posenet_e79", "posenet_best"]:
            (run / name).mkdir(parents=True)
            (run / name / "_CHECKPOINT_METADATA").write_text("{}")
        assert _resolve_ckpt_dir(run).name == "posenet_best"
        import shutil
        shutil.rmtree(run / "posenet_best")
        assert _resolve_ckpt_dir(run).name == "posenet_e79"
        # A leaf checkpoint passes through untouched.
        assert _resolve_ckpt_dir(run / "posenet_e7") == run / "posenet_e7"

    def test_ckpt_meta_roundtrip_and_mismatch_warning(self, tmp_path):
        from flope_tpu.utils.checkpoint import (check_ckpt_meta,
                                                read_ckpt_meta,
                                                write_ckpt_meta)
        run = tmp_path / "run"
        write_ckpt_meta(run, image_size=256, width_mult=1.0)
        assert read_ckpt_meta(run) == {"image_size": 256, "width_mult": 1.0}
        # Leaf snapshot inside the run dir inherits the sidecar.
        leaf = run / "posenet_best"
        leaf.mkdir()
        assert read_ckpt_meta(leaf)["image_size"] == 256
        warnings = []
        check_ckpt_meta(leaf, warn=warnings.append, image_size=512)
        assert len(warnings) == 1 and "image_size" in warnings[0]
        check_ckpt_meta(leaf, warn=warnings.append, image_size=256)
        assert len(warnings) == 1  # matching config stays silent
        # Unknown keys and missing sidecars are silently tolerated.
        check_ckpt_meta(leaf, warn=warnings.append, det_size=640)
        check_ckpt_meta(tmp_path / "nowhere", warn=warnings.append,
                        image_size=1)
        assert len(warnings) == 1

    def test_non_ckpt_dir_raises_clearly(self, tmp_path):
        from flope_tpu.utils.checkpoint import load_ckpt
        empty = tmp_path / "empty"
        empty.mkdir()
        with pytest.raises(FileNotFoundError, match="not an orbax checkpoint"):
            load_ckpt(empty)


class TestDiskDataset:
    def test_write_load_roundtrip(self, tmp_path):
        out = write_crop_dataset(tmp_path / "crops", n=10, size=32, seed=0)
        train = load_crop_dataset(out, test=False)
        test = load_crop_dataset(out, test=True)
        assert train["images"].shape[0] == 8  # 80/20 sorted split
        assert test["images"].shape[0] == 2
        assert train["images"].shape[1:] == (32, 32, 3)
        assert train["images"].max() <= 1.0
        # Rotations survive the quat round trip.
        src = synthetic_crops(10, size=32, seed=0)
        np.testing.assert_allclose(train["rotations"], src["rotations"][:8],
                                   atol=1e-5)
