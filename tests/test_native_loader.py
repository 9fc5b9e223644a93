"""Native C++ data runtime vs the Python pipeline: identical semantics."""

import os

import numpy as np
import pytest

from sug_tpu import native
from sug_tpu.data import PointCloudDataset, make_synthetic_pointda

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native loader not built and no compiler"
)


@pytest.fixture
def dumps(tmp_path):
    pts, labels = make_synthetic_pointda(num_per_class=6, num_points=64)
    pp = tmp_path / "train_pts.npy"
    lp = tmp_path / "train_label.npy"
    np.save(pp, pts)
    np.save(lp, labels)
    return str(pp), str(lp), pts, labels


class TestNativeDataset:
    def test_matches_python_ingest(self, dumps):
        pp, lp, pts, labels = dumps
        nds = native.NativePointCloudDataset(pp, lp, num_points=64)
        npts, nlabels = nds.arrays()
        pds = PointCloudDataset("modelnet", pts, labels, num_points=64)
        assert len(nds) == len(pds) == 60
        np.testing.assert_array_equal(nlabels, pds.labels)
        # same normalization math (no subsample at equal point counts)
        np.testing.assert_allclose(npts, pds.pts, atol=1e-5)
        assert nds.cls_num_counter == pds.cls_num_counter

    def test_fixed_x_rotation(self, dumps):
        pp, lp, pts, labels = dumps
        plain = native.NativePointCloudDataset(pp, lp, num_points=64)
        rot = native.NativePointCloudDataset(pp, lp, num_points=64, fixed_x_rotation=True)
        a, _ = plain.arrays()
        b, _ = rot.arrays()
        pds = PointCloudDataset("scannet", pts, labels, num_points=64, model="DGCNN")
        np.testing.assert_allclose(b, pds.pts, atol=1e-5)
        assert not np.allclose(a, b)

    def test_pad_and_subsample(self, dumps):
        pp, lp, pts, labels = dumps
        padded = native.NativePointCloudDataset(pp, lp, num_points=96)
        p, _ = padded.arrays()
        assert p.shape == (60, 96, 3)
        np.testing.assert_allclose(p[:, 64:], 0.0)
        sub = native.NativePointCloudDataset(pp, lp, num_points=32)
        s, _ = sub.arrays()
        assert s.shape == (60, 32, 3)

    def test_int64_and_float64_npy(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(5, 16, 3)).astype(np.float64)
        labels = np.arange(5, dtype=np.int64)
        np.save(tmp_path / "p.npy", pts)
        np.save(tmp_path / "l.npy", labels)
        ds = native.NativePointCloudDataset(
            str(tmp_path / "p.npy"), str(tmp_path / "l.npy"), num_points=16
        )
        _, lbl = ds.arrays()
        np.testing.assert_array_equal(lbl, labels.astype(np.int32))


class TestNativeIterator:
    def test_epoch_coverage(self, dumps):
        pp, lp, *_ = dumps
        ds = native.NativePointCloudDataset(pp, lp, num_points=64)
        it = native.NativeBatchIterator(ds, batch_size=10, shuffle=True, seed=1)
        assert len(it) == 6
        seen_labels = []
        batches = list(it)
        assert len(batches) == 6
        for bp, bl in batches:
            assert bp.shape == (10, 64, 3)
            seen_labels.extend(bl.tolist())
        assert len(seen_labels) == 60

    def test_shuffle_changes_across_epochs(self, dumps):
        pp, lp, *_ = dumps
        ds = native.NativePointCloudDataset(pp, lp, num_points=64)
        it = native.NativeBatchIterator(ds, batch_size=10, shuffle=True, seed=2)
        e1 = np.concatenate([l for _, l in it])
        e2 = np.concatenate([l for _, l in it])
        assert sorted(e1.tolist()) == sorted(e2.tolist())
        assert (e1 != e2).any()

    def test_class_balanced(self, dumps):
        pp, lp, *_ = dumps
        ds = native.NativePointCloudDataset(pp, lp, num_points=64)
        it = native.NativeBatchIterator(
            ds, batch_size=20, class_balance=True, class_per_batch=10, seed=3
        )
        for bp, bl in it:
            assert bp.shape == (20, 64, 3)
            assert set(bl.tolist()) <= set(range(10))

    def test_wrap_tail_when_not_drop_last(self, dumps):
        pp, lp, *_ = dumps
        ds = native.NativePointCloudDataset(pp, lp, num_points=64)
        it = native.NativeBatchIterator(ds, batch_size=16, drop_last=False, seed=4)
        batches = list(it)
        assert len(batches) == 4  # ceil(60/16)
        for bp, _ in batches:
            assert bp.shape == (16, 64, 3)  # fixed shape, tail wrapped

    def test_from_arrays_matches_file_path(self, dumps):
        pp, lp, pts, labels = dumps
        pds = PointCloudDataset("modelnet", pts, labels, num_points=64)
        nds = native.NativePointCloudDataset.from_arrays(pds.pts, pds.labels)
        npts, nlabels = nds.arrays()
        np.testing.assert_array_equal(npts, pds.pts)
        np.testing.assert_array_equal(nlabels, pds.labels)
        assert nds.cls_num_counter == pds.cls_num_counter

    def test_mid_epoch_set_epoch_restarts_cleanly(self, dumps):
        """The DG loop zips paired iterators and abandons the longer one
        mid-epoch; set_epoch must quiesce the prefetch thread and restart."""
        pp, lp, pts, labels = dumps
        pds = PointCloudDataset("modelnet", pts, labels, num_points=64)
        nds = native.NativePointCloudDataset.from_arrays(pds.pts, pds.labels)
        it = native.NativeBatchIterator(nds, batch_size=10, shuffle=True, seed=7)
        for n_consume in (0, 1, 3):
            gen = iter(it)
            for _ in range(n_consume):
                next(gen)
            it.set_epoch(42)
            batches = list(it)
            assert len(batches) == 6
            labels_seen = sorted(np.concatenate([l for _, l in batches]).tolist())
            assert labels_seen == sorted(pds.labels.tolist())


class TestNativePointOps:
    """Native FPS/ICP (pointops.cpp) vs the jax implementations they replace
    on the offline splitter's host path."""

    pytestmark = pytest.mark.skipif(
        not native.pointops_available(), reason="pointops not in the built .so"
    )

    def test_fps_bit_exact_vs_jax(self):
        import jax.numpy as jnp

        from sug_tpu.ops.geometry import farthest_point_sample

        rng = np.random.default_rng(0)
        pts = rng.normal(size=(5, 200, 3)).astype(np.float32)
        got = native.fps_native(pts, 50)
        ref = np.asarray(farthest_point_sample(jnp.asarray(pts), 50))
        np.testing.assert_array_equal(got, ref)

    def test_fps_start_idx_and_duplicates(self):
        """Duplicate points force argmax ties — first index must win, and a
        nonzero start index must be honored."""
        import jax.numpy as jnp

        from sug_tpu.ops.geometry import farthest_point_sample

        rng = np.random.default_rng(1)
        base = rng.normal(size=(2, 32, 3)).astype(np.float32)
        pts = np.concatenate([base, base], axis=1)  # every point duplicated
        start = np.array([5, 17], dtype=np.int32)
        got = native.fps_native(pts, 16, start_idx=start)
        ref = np.asarray(
            farthest_point_sample(jnp.asarray(pts), 16, jnp.asarray(start))
        )
        np.testing.assert_array_equal(got, ref)

    def test_icp_recovers_rotated_cloud(self):
        """Aligning a cloud onto a rotated copy of itself must give ~1.0
        fitness; onto an unrelated cloud, much lower."""
        rng = np.random.default_rng(2)
        a = rng.normal(size=(128, 3)).astype(np.float32)
        a /= np.abs(a).max()
        th = 0.3
        R = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
            dtype=np.float32,
        )
        other = rng.normal(size=(128, 3)).astype(np.float32) * 3.0 + 5.0
        clouds = np.stack([a @ R.T, other])
        fit = native.icp_fitness_native(a, clouds, iters=25)
        assert fit[0] > 0.95
        assert fit[1] < fit[0]

    def test_icp_matches_jax_fitness(self):
        from sug_tpu.data.offline_splitter import _icp_fitness_batch

        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        anchor = rng.normal(size=(64, 3)).astype(np.float32)
        clouds = rng.normal(size=(6, 64, 3)).astype(np.float32)
        clouds[0] = anchor  # exact match -> fitness 1.0 in both
        got = native.icp_fitness_native(anchor, clouds)
        ref = np.asarray(_icp_fitness_batch(jnp.asarray(anchor), jnp.asarray(clouds)))
        assert got[0] == ref[0] == 1.0
        # fixed-iteration ICP from different SVD precisions can settle in
        # different local minima on unstructured noise; require agreement on
        # the majority of clouds and bounded disagreement elsewhere
        close = np.abs(got - ref) < 0.1
        assert close.sum() >= 4, (got, ref)

    def test_splitter_uses_native_path(self, monkeypatch):
        from sug_tpu.data import offline_splitter

        monkeypatch.setenv("SUG_NATIVE_SPLITTER", "1")
        assert offline_splitter._use_native_pointops()
        monkeypatch.setenv("SUG_NATIVE_SPLITTER", "0")
        assert not offline_splitter._use_native_pointops()


def test_native_iterator_epoch_determinism(tmp_path, rng=None):
    """set_epoch(e) must produce an epoch-DETERMINED order: a resumed run
    replays the uninterrupted run's shuffles regardless of how many resets
    happened before (the Python BatchIterator contract)."""
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(30, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 10, 30).astype(np.int32)
    ds = native.NativePointCloudDataset.from_arrays(pts, labels)
    it = native.NativeBatchIterator(ds, batch_size=10, shuffle=True, seed=13)

    it.set_epoch(5)
    run1 = [l.copy() for _, l in it]
    # scramble the internal stream: several resets at other epochs
    it.set_epoch(0)
    next(iter(it))
    it.set_epoch(9)
    _ = list(it)
    it.set_epoch(5)
    run2 = [l.copy() for _, l in it]
    assert len(run1) == len(run2) == 3
    for a, b in zip(run1, run2):
        np.testing.assert_array_equal(a, b)
    # and a different epoch gives a different order
    it.set_epoch(6)
    run3 = [l.copy() for _, l in it]
    assert any(not np.array_equal(a, b) for a, b in zip(run1, run3))
