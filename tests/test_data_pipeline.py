"""Tests for ingest, samplers, splitter contracts, and config system."""

import os
import pickle

import numpy as np
import pytest

from sug_tpu.data import (
    PointCloudDataset,
    BatchIterator,
    ClassBalancedBatchIterator,
    make_synthetic_pointda,
    split_dataset,
)
from sug_tpu.utils.config import ConfigDict, cfg_from_list, merge_new_config


@pytest.fixture
def synth():
    return make_synthetic_pointda(num_per_class=8, num_points=64)


class TestDataset:
    def test_normalized_and_padded(self, synth):
        pts, labels = synth
        ds = PointCloudDataset("modelnet", pts, labels, num_points=64)
        assert ds.pts.shape == (80, 64, 3)
        norms = np.sqrt((ds.pts**2).sum(-1)).max(1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_pad_short_clouds(self, synth):
        pts, labels = synth
        ds = PointCloudDataset("modelnet", pts, labels, num_points=128)
        assert ds.pts.shape == (80, 128, 3)
        # padded region is exactly zero
        np.testing.assert_allclose(ds.pts[:, 64:], 0.0)

    def test_subsample_long_clouds(self, synth):
        pts, labels = synth
        ds = PointCloudDataset("modelnet", pts, labels, num_points=32)
        assert ds.pts.shape == (80, 32, 3)

    def test_fixed_x_rotation_for_dgcnn(self, synth):
        pts, labels = synth
        ds_plain = PointCloudDataset("scannet", pts, labels, num_points=64, model="Pointnet")
        ds_rot = PointCloudDataset("scannet", pts, labels, num_points=64, model="DGCNN")
        assert not np.allclose(ds_plain.pts, ds_rot.pts)
        # rotation preserves norms
        np.testing.assert_allclose(
            np.linalg.norm(ds_plain.pts, axis=-1),
            np.linalg.norm(ds_rot.pts, axis=-1),
            atol=1e-4,
        )

    def test_class_counters_and_weights(self, synth):
        pts, labels = synth
        ds = PointCloudDataset("modelnet", pts, labels, num_points=64)
        assert ds.cls_num_counter == [8] * 10
        w = ds.cls_wights("DLSA", q_=0.4)
        np.testing.assert_allclose(w, 0.1, rtol=1e-5)


class TestIterators:
    def test_batch_iterator_shapes(self, synth):
        pts, labels = synth
        ds = PointCloudDataset("modelnet", pts, labels, num_points=64)
        it = BatchIterator(ds, batch_size=16)
        batches = list(it)
        assert len(batches) == 5
        for bp, bl in batches:
            assert bp.shape == (16, 64, 3)
            assert bl.shape == (16,)

    def test_class_balanced(self, synth):
        pts, labels = synth
        ds = PointCloudDataset("modelnet", pts, labels, num_points=64)
        it = ClassBalancedBatchIterator(ds, batch_size=20, class_per_batch=10)
        for bp, bl in it:
            assert bp.shape == (20, 64, 3)
        # all labels drawn from the chosen class subset (here: all 10)
        assert set(np.unique(bl).tolist()) <= set(range(10))


class TestSplitter:
    def test_random_split_and_pkl_cache(self, tmp_path, synth):
        pts, labels = synth
        droot = tmp_path / "PointDA_data"
        (droot / "modelnet").mkdir(parents=True)
        np.save(droot / "modelnet" / "train_pts.npy", pts)
        np.save(droot / "modelnet" / "train_label.npy", labels)

        config = ConfigDict(
            METHOD="Random", SUBSET_FULLSIZE=False, SAMPLE_RATE=0.5, TRAIN_BASE=1, RELOAD=True
        )
        out = split_dataset("modelnet", config, data_root=str(droot))
        n1 = out["subset_1"]["pts"].shape[0]
        n2 = out["subset_2"]["pts"].shape[0]
        assert n1 == 40 and n2 == 40
        # cache file written with the reference naming contract
        cache = droot / "modelnet" / "size_1.0Random_0.5.pkl"
        assert cache.exists()
        with open(cache, "rb") as f:
            idx = pickle.load(f)
        assert set(idx.keys()) == {"index1", "index2"}
        # second call reloads identical indices
        out2 = split_dataset("modelnet", config, data_root=str(droot))
        np.testing.assert_array_equal(out["subset_1"]["label"], out2["subset_1"]["label"])

    def test_fullsize_subset2(self, tmp_path, synth):
        pts, labels = synth
        droot = tmp_path / "PointDA_data"
        (droot / "modelnet").mkdir(parents=True)
        np.save(droot / "modelnet" / "train_pts.npy", pts)
        np.save(droot / "modelnet" / "train_label.npy", labels)
        config = ConfigDict(
            METHOD="Random", SUBSET_FULLSIZE=True, SAMPLE_RATE=0.5, TRAIN_BASE=1, RELOAD=False
        )
        out = split_dataset("modelnet", config, data_root=str(droot))
        assert out["subset_2"]["pts"].shape[0] == 80

    def test_cluster_split_from_offline_files(self, tmp_path, synth):
        pts, labels = synth
        droot = tmp_path / "PointDA_data"
        spl = droot / "modelnet" / "DGCNN_spliter"
        spl.mkdir(parents=True)
        np.save(droot / "modelnet" / "train_pts.npy", pts)
        np.save(droot / "modelnet" / "train_label.npy", labels)
        # fabricate 4 clusters per class with 2 clouds each
        for c in range(10):
            cls_pts = pts[labels == c]
            for k in range(4):
                np.save(spl / f"kmeans_{c}_{k}_2.npy", cls_pts[2 * k : 2 * k + 2])
        config = ConfigDict(
            METHOD="Cluster", SUBSET_FULLSIZE=False, SAMPLE_RATE=0.5, TRAIN_BASE=1, RELOAD=False
        )
        out = split_dataset("modelnet", config, data_root=str(droot))
        assert out["subset_1"]["pts"].shape[0] == 40  # 2 clusters x 2 x 10
        assert out["subset_2"]["pts"].shape[0] == 40


class TestConfig:
    def test_merge_and_base_config(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text("A: 1\nB:\n  C: 2\n")
        child = {"_BASE_CONFIG_": str(base), "B": {"D": 3}, "E": "x"}
        config = ConfigDict()
        merge_new_config(config, child)
        assert config.A == 1
        assert config.B.C == 2
        assert config.B.D == 3
        assert config.E == "x"

    def test_cfg_from_list_typed(self):
        config = ConfigDict({"OPT": {"LR": 0.001, "N": 10}, "NAME": "abc"})
        cfg_from_list(["OPT.LR", "0.01", "NAME", "xyz", "OPT.N", "20"], config)
        assert config.OPT.LR == 0.01
        assert config.OPT.N == 20
        assert config.NAME == "xyz"

    def test_cfg_from_list_rejects_unknown(self):
        config = ConfigDict({"A": 1})
        with pytest.raises(AssertionError):
            cfg_from_list(["B", "2"], config)

    def test_cfg_from_list_widens_int_to_float(self):
        # "--set METHODS.MMD_WEIGHT 0" must not trip the type check: the CLI
        # token parses as int but the key is float — widen losslessly.
        config = ConfigDict({"METHODS": {"MMD_WEIGHT": 0.5}, "N": 10})
        cfg_from_list(["METHODS.MMD_WEIGHT", "0"], config)
        assert config.METHODS.MMD_WEIGHT == 0.0
        assert isinstance(config.METHODS.MMD_WEIGHT, float)
        # the reverse (float onto an int key) still fails, with the key named
        with pytest.raises(AssertionError, match="N"):
            cfg_from_list(["N", "2.5"], config)

    def test_attribute_access(self):
        c = ConfigDict({"x": {"y": [1, {"z": 2}]}})
        assert c.x.y[1].z == 2
