"""Tests for the offline splitter: clustering, ICP, file contract,
end-to-end consumption by the train-time splitter."""

import os

import numpy as np
import pytest

from sug_tpu.data.datasets import make_synthetic_pointda
from sug_tpu.data.offline_splitter import (
    cal_probs2entropy,
    entropy_clustering,
    icp_distance_batch,
    kmeans_cluster_idx_update,
    spliter_cls_data,
    split_dataset_geometric,
)
from sug_tpu.data.splitter import split_dataset
from sug_tpu.utils.config import ConfigDict


def test_entropy_helpers(rng):
    p = rng.dirichlet(np.ones(10), size=32)
    e = cal_probs2entropy(p)
    assert e.shape == (32,)
    assert (e >= 0).all() and (e <= np.log(10) + 1e-6).all()
    labels, ent = entropy_clustering(p, cluster_num=4)
    assert set(np.unique(labels)) <= {0, 1, 2, 3}


def test_kmeans_reorder():
    labels = np.array([0, 0, 1, 1, 2, 2])
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [1.0, 0.0]])
    new_labels, new_centers = kmeans_cluster_idx_update(labels, centers)
    # cluster 0 (anchor) keeps id 0; nearest-to-anchor (old 2) becomes 1
    assert (new_labels == np.array([0, 0, 2, 2, 1, 1])).all()


class TestICP:
    def test_identical_clouds_zero_distance(self, rng):
        pc = rng.normal(size=(64, 3)).astype(np.float32)
        d = icp_distance_batch(pc, pc[None])
        np.testing.assert_allclose(d, 0.0, atol=1e-5)

    def test_rigid_transform_recovered(self, rng):
        pc = rng.normal(size=(128, 3)).astype(np.float32)
        theta = 0.4
        R = np.array(
            [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
        )
        moved = (pc @ R.T + np.array([0.05, -0.03, 0.02])).astype(np.float32)
        d = icp_distance_batch(pc, moved[None])
        assert d[0] < 0.05  # nearly full fitness after registration

    def test_unrelated_clouds_large_distance(self, rng):
        a = rng.normal(size=(64, 3)).astype(np.float32)
        b = (rng.normal(size=(64, 3)) * 0.05 + 5.0).astype(np.float32)
        d = icp_distance_batch(a, b[None])
        assert d[0] > 0.3


class TestFileContract:
    def test_spliter_cls_data_naming(self, tmp_path, rng):
        pts = rng.normal(size=(20, 32, 3)).astype(np.float32)
        labels = np.array([0] * 10 + [1] * 10)
        clusters = np.array([0, 1] * 10).astype(float)
        droot = tmp_path / "PointDA_data"
        (droot / "modelnet").mkdir(parents=True)
        spliter_cls_data(
            pts_all=pts, cluster_labels=clusters, cls=3, method="kmeans",
            dataset_type="modelnet", data_root=str(droot),
        )
        files = sorted(os.listdir(droot / "modelnet" / "spliter"))
        assert files == ["kmeans_3_0_10.npy", "kmeans_3_1_10.npy"]

        # cls=-1 (entropy) also writes label files
        spliter_cls_data(
            pts_all=pts, cluster_labels=clusters, cls=-1, method="entropy",
            dataset_type="modelnet", raw_labels=labels,
            cls_entropy=rng.uniform(0, 1, 20), data_root=str(droot),
        )
        files = os.listdir(droot / "modelnet" / "spliter")
        assert any("_labels.npy" in f for f in files)
        assert any("_entropy_" in f for f in files)

    def test_geometric_split_end_to_end(self, tmp_path):
        """Geometric offline split -> consumed by the train-time splitter."""
        pts, labels = make_synthetic_pointda(num_per_class=6, num_points=64)
        droot = tmp_path / "PointDA_data"
        (droot / "modelnet").mkdir(parents=True)
        np.save(droot / "modelnet" / "train_pts.npy", pts)
        np.save(droot / "modelnet" / "train_label.npy", labels)

        split_dataset_geometric(
            "modelnet", fps_points=32, data_root=str(droot), seed=1
        )
        files = os.listdir(droot / "modelnet" / "spliter")
        assert len([f for f in files if f.startswith("geometric_")]) >= 10

        config = ConfigDict(
            METHOD="Geometric", SUBSET_FULLSIZE=False, SAMPLE_RATE=0.5,
            TRAIN_BASE=1, RELOAD=False,
        )
        out = split_dataset("modelnet", config, data_root=str(droot))
        n1 = out["subset_1"]["pts"].shape[0]
        n2 = out["subset_2"]["pts"].shape[0]
        assert n1 + n2 == 60
        assert n1 > 0 and n2 > 0
