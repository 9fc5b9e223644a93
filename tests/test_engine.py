"""Engine tests: optimizer group masks, LR schedules, DG/source train steps,
eval, checkpoint roundtrip, and an end-to-end smoke train on synthetic data."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sug_tpu.data import PointCloudDataset, BatchIterator, make_synthetic_pointda
from sug_tpu.engine import (
    DGTrainer,
    SourceTrainer,
    Evaluator,
    cosine_lr,
    dis_lr_schedule,
    param_group_masks,
)
from sug_tpu.engine.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint,
    wait_for_saves,
)
from sug_tpu.utils.config import ConfigDict

B, N = 8, 128

DG_CFG = ConfigDict(
    {
        "METHODS": {
            "MMD_WEIGHT": 1.0,
            "CLS_WEIGHT": 1.0,
            "GEO_MMD": [
                {"NAME": "SOFT_MMD", "LABEL_SCALE": 50, "GEO_WEIGHTS": "mean2one", "GEO_SCALE": 1}
            ],
            "SEM_MMD": [
                {
                    "NAME": "SOFT_MMD",
                    "LABEL_SCALE": 5,
                    "SEM_WEIGHTS": "mean2one",
                    "LABEL_WEIGHT": 0.5,
                    "SEM_SCALE": 1,
                }
            ],
            "TARGET_LOSS": 1.0,
            "SRC_LOSS_WEIGHT": 1.0,
            "ADV_WEIGHT": 0.5,
            "PURE_CLS_EPOCH": 1,
            "GRL": False,
        },
        "OPTIMIZATION": {
            "NUM_EPOCHES": 10,
            "LR": 1e-3,
            "LR_SCALER": 1.0,
            "WEIGHT_DECAY": 5e-4,
        },
    }
)


def test_lr_schedules():
    assert cosine_lr(1e-3, 0, 100) == pytest.approx(1e-3)
    assert cosine_lr(1e-3, 100, 100) == pytest.approx(0.0, abs=1e-12)
    assert cosine_lr(1e-3, 50, 100) == pytest.approx(5e-4)
    assert dis_lr_schedule(1e-3, 1.0, 0) == pytest.approx(1e-3)
    assert dis_lr_schedule(1e-3, 1.0, 5) == pytest.approx(5e-4)
    assert dis_lr_schedule(1e-3, 1.0, 30) == pytest.approx(1e-3 * 0.5**6)
    assert dis_lr_schedule(1e-3, 2.0, 31) == pytest.approx(2e-3 * 0.5**3)


class TestParamGroups:
    def setup_method(self):
        self.trainer = DGTrainer(DG_CFG, model_name="Pointnet")
        self.state = self.trainer.init_state(seed=0, batch_size=B, num_points=N)

    def test_masks_cover_correct_modules(self):
        masks = param_group_masks(self.state.params)
        flat_g = jax.tree_util.tree_leaves_with_path(masks["g"])
        # pred_offset excluded from g
        for path, val in flat_g:
            names = [str(getattr(p, "key", p)) for p in path]
            if "pred_offset" in names:
                assert val is False
            elif names[0] == "g":
                assert val is True
            else:
                assert val is False
        flat_c = jax.tree_util.tree_leaves_with_path(masks["c"])
        for path, val in flat_c:
            names = [str(getattr(p, "key", p)) for p in path]
            assert val == (names[0] in ("c1", "c2"))
        flat_d = jax.tree_util.tree_leaves_with_path(masks["dis"])
        for path, val in flat_d:
            names = [str(getattr(p, "key", p)) for p in path]
            assert val == (names[0] in ("g", "attention_s", "attention_t"))

    def test_dg_step_updates_all_groups(self, rng):
        data_s = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        data_t = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        ls = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
        lt = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
        new_state, metrics = self.trainer.train_step(
            self.state, data_s, ls, data_t, lt, jax.random.key(0), 1e-3, 1e-3, 1e-3
        )
        assert np.isfinite(float(metrics["loss_total"]))
        assert np.isfinite(float(metrics["loss_geo"]))
        assert np.isfinite(float(metrics["loss_sem"]))

        def changed(path_prefix):
            before = self.state.params[path_prefix]
            after = new_state.params[path_prefix]
            diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), before, after)
            return max(jax.tree.leaves(diffs))

        assert changed("g") > 0
        assert changed("c1") > 0
        assert changed("attention_s") > 0
        assert changed("attention_t") > 0

    def test_pred_offset_gets_only_dis_update(self, rng):
        """pred_offset is excluded from optimizer_g but present in
        optimizer_dis — with lr_dis=0 it must not move at all."""
        data_s = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        data_t = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        ls = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
        lt = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
        new_state, _ = self.trainer.train_step(
            self.state, data_s, ls, data_t, lt, jax.random.key(0), 1e-3, 1e-3, 0.0
        )

        def find_pred_offset(tree):
            out = []
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
                names = [str(getattr(p, "key", p)) for p in path]
                if "pred_offset" in names:
                    out.append((tuple(names), leaf))
            return out

        before = dict(find_pred_offset(self.state.params))
        after = dict(find_pred_offset(new_state.params))
        assert before, "model should contain a pred_offset module"
        for k in before:
            np.testing.assert_allclose(np.asarray(before[k]), np.asarray(after[k]))

    def test_cls_only_step(self, rng):
        data_s = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        data_t = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        ls = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
        lt = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
        _, metrics = self.trainer.train_step(
            self.state, data_s, ls, data_t, lt, jax.random.key(0),
            1e-3, 1e-3, 1e-3, mmd_on=False,
        )
        assert "loss_geo" not in metrics
        assert np.isfinite(float(metrics["loss_cls"]))


class TestSourceTrainer:
    def test_loss_decreases_on_synthetic(self):
        pts, labels = make_synthetic_pointda(num_per_class=8, num_points=N)
        ds = PointCloudDataset("modelnet", pts, labels, num_points=N)
        # augment=False and dropout 0: random z-rotations + the reference's
        # p=0.7 dropout make ~40-step convergence too slow for a smoke test;
        # the aug path is covered by test_augment.py
        trainer = SourceTrainer(model_name="Pointnet", augment=False)
        from sug_tpu.models.pointnet import PointNetClassifier

        trainer.model = PointNetClassifier(num_class=10, dropout_rate=0.0)
        trainer._train_step = jax.jit(trainer._step)
        state = trainer.init_state(seed=0, batch_size=16, num_points=N)
        it = BatchIterator(ds, batch_size=16, seed=1)
        losses = []
        key = jax.random.key(0)
        for epoch in range(8):
            ep = []
            for data, label in it:
                key, k = jax.random.split(key)
                state, m = trainer.train_step(state, data, label, k, 1e-3)
                ep.append(float(m["loss"]))
            losses.append(np.mean(ep))
        assert losses[-1] < losses[0] * 0.8, losses

        ev = Evaluator(trainer.eval_apply)
        res = ev.run(state.params, state.batch_stats, BatchIterator(ds, 16, shuffle=False))
        assert res["overall_acc"] > 0.2  # well above 10% chance after 6 epochs


class TestEvaluatorAndCheckpoint:
    def test_eval_metrics_shape(self, rng):
        trainer = SourceTrainer(model_name="Pointnet")
        state = trainer.init_state(seed=0, batch_size=4, num_points=N)
        ev = Evaluator(trainer.eval_apply)
        batches = [
            (rng.normal(size=(4, N, 3)).astype(np.float32), rng.integers(0, 10, 4))
            for _ in range(3)
        ]
        res = ev.run(state.params, state.batch_stats, batches)
        assert 0.0 <= res["overall_acc"] <= 1.0
        assert res["class_acc"].shape == (10,)

    def test_checkpoint_roundtrip(self, tmp_path, rng):
        trainer = SourceTrainer(model_name="Pointnet")
        state = trainer.init_state(seed=0, batch_size=4, num_points=N)
        data = rng.normal(size=(4, N, 3)).astype(np.float32)
        label = rng.integers(0, 10, 4)
        state, _ = trainer.train_step(state, data, label, jax.random.key(0), 1e-3)

        # async default: the write commits in the background; wait_for_saves
        # (also called inside restore_checkpoint) makes it durable
        path = save_checkpoint(str(tmp_path), "modelnet", 1, state, max_ckpt_save_num=2)
        wait_for_saves()
        assert os.path.exists(path)

        fresh = trainer.init_state(seed=7, batch_size=4, num_points=N)
        restored = restore_checkpoint(path, fresh)
        assert restored["epoch"] == 1
        old_leaf = jax.tree.leaves(state.params)[0]
        new_leaf = jax.tree.leaves(restored["state"].params)[0]
        np.testing.assert_allclose(np.asarray(old_leaf), np.asarray(new_leaf))

    def test_checkpoint_rotation(self, tmp_path, rng):
        trainer = SourceTrainer(model_name="Pointnet")
        state = trainer.init_state(seed=0, batch_size=4, num_points=N)
        for epoch in range(1, 5):
            save_checkpoint(str(tmp_path), "m", epoch, state, max_ckpt_save_num=2)
        remaining = sorted(d for d in os.listdir(tmp_path) if "_checkpoint_" in d)
        assert len(remaining) == 2
        assert latest_checkpoint(str(tmp_path)).endswith("epoch_4")

    def test_async_save_restore_without_explicit_wait(self, tmp_path, rng):
        """restore_checkpoint must flush an in-flight async save of the same
        path before reading (no sleep/wait in between here)."""
        trainer = SourceTrainer(model_name="Pointnet")
        state = trainer.init_state(seed=3, batch_size=4, num_points=N)
        path = save_checkpoint(str(tmp_path), "m", 9, state)  # async default
        fresh = trainer.init_state(seed=11, batch_size=4, num_points=N)
        restored = restore_checkpoint(path, fresh)
        assert restored["epoch"] == 9
        for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(restored["state"].params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
