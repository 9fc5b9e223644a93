"""Tests for PFH descriptors, visualization, PLY reader, legacy loaders."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from sug_tpu.data.datasets import (
    load_modelnet_files,
    load_scannet_h5,
    make_synthetic_pointda,
    extract_shapenet_to_npy,
)
from sug_tpu.utils.pfh import (
    estimate_normals,
    get_pfh_descriptor,
    pfh_descriptor_batch,
    pfh_hist_distance,
)
from sug_tpu.utils.visualization import draw_pc, visualize_feature_scatter


class TestPFH:
    def test_normals_unit_and_plane(self, rng):
        # points on the z=0 plane -> normals ~ +-z
        pc = np.zeros((1, 64, 3), dtype=np.float32)
        pc[0, :, :2] = rng.uniform(-1, 1, (64, 2))
        n = np.asarray(estimate_normals(jnp.asarray(pc), k=8))
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
        assert (np.abs(n[0, :, 2]) > 0.99).all()

    def test_descriptor_shapes(self, rng):
        pc = jnp.asarray(rng.normal(size=(4, 128, 3)), jnp.float32)
        d = pfh_descriptor_batch(pc, "FPFH", 8, 5)
        assert d.shape == (4, 15)
        assert np.isfinite(np.asarray(d)).all()

    def test_descriptor_separates_shapes(self):
        pts, labels = make_synthetic_pointda(num_per_class=4, num_points=128)
        sphere = pts[labels == 0]
        cone = pts[labels == 3]
        hs = get_pfh_descriptor(sphere, "FPFH")
        hc = get_pfh_descriptor(cone, "FPFH")
        d_between = pfh_hist_distance(hs, hc)
        d_within = pfh_hist_distance(hs[:2], hs[2:])
        assert d_between > d_within

    def test_hist_distance_zero_identical(self, rng):
        h = rng.uniform(0, 1, (4, 15))
        assert pfh_hist_distance(h, h) == pytest.approx(0.0)

    def test_pfh_joint_matches_numpy_oracle(self, rng):
        """method='PFH' must produce the reference's div**3 JOINT histogram
        (utils/pfh.py:303-349,:497-520), not concatenated marginals. Oracle:
        direct per-pair numpy evaluation of that spec, fed the same normals
        and neighbor sets as the jax path (isolates binning semantics from
        kNN tie-breaks)."""
        import jax

        from sug_tpu.ops.geometry import knn_indices
        from sug_tpu.utils.pfh import pfh_joint

        k, div = 5, 3
        pc = np.asarray(rng.normal(size=(2, 24, 3)), np.float32)
        normals = np.asarray(estimate_normals(jnp.asarray(pc), k=k))
        # {self + k distinct neighbors}: knn_indices is self-inclusive, so
        # k+1 gives self once plus k true neighbors (reference p_list shape)
        idx = np.asarray(knn_indices(jnp.asarray(pc), k + 1))

        def oracle_hist(pts, nrm, members):
            hist = np.zeros(div**3)
            n = len(members)
            for a in range(n):
                for b in range(a + 1, n):
                    pA, pB = pts[members[a]], pts[members[b]]
                    nA, nB = nrm[members[a]], nrm[members[b]]
                    if np.dot(nA, pB - pA) >= np.dot(nB, pA - pB):
                        ps, pt, ns, nt = pA, pB, nA, nB
                    else:
                        ps, pt, ns, nt = pB, pA, nB, nA
                    d = pt - ps
                    d = d / (np.linalg.norm(d) + 1e-12)
                    u = ns
                    v = np.cross(d, u)
                    w = np.cross(u, v)
                    alpha = np.dot(v, nt)
                    phi = np.dot(u, d)
                    theta = np.arctan(np.dot(w, nt) / (np.dot(u, nt) + 1e-12))
                    t_ap = [-1 + i * 2.0 / div for i in range(1, div)]
                    t_th = [-np.pi / 2 + i * np.pi / div for i in range(1, div)]
                    b_a = sum(alpha >= t for t in t_ap)
                    b_p = sum(phi >= t for t in t_ap)
                    b_t = sum(theta >= t for t in t_th)
                    hist[b_a + b_p * div + b_t * div * div] += 1
            return hist / (n * (n - 1) / 2.0)

        got = np.asarray(pfh_joint(jnp.asarray(pc), jnp.asarray(normals), k, div))
        assert got.shape == (2, 24, div**3)
        for b in range(2):
            for i in range(0, 24, 7):
                members = list(idx[b, i])
                assert members[0] == i and len(set(members)) == k + 1
                want = oracle_hist(pc[b], normals[b], members)
                np.testing.assert_allclose(got[b, i], want, atol=1e-5)
        # per-point histograms are normalized distributions
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)

    def test_pfh_method_dispatch_shapes(self, rng):
        pc = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
        assert pfh_descriptor_batch(pc, "PFH", 8, 5).shape == (2, 125)
        assert pfh_descriptor_batch(pc, "FPFH", 8, 5).shape == (2, 15)


class TestVisualization:
    def test_feature_scatter_writes_png(self, tmp_path, rng):
        feats = rng.normal(size=(50, 2))
        labels = rng.integers(0, 4, 50)
        out = visualize_feature_scatter(
            feats, cls=1, labels_=labels,
            cluster_centers=rng.normal(size=(4, 2)),
            file_path=str(tmp_path / "scatter.png"),
        )
        if out is not None:  # matplotlib present
            assert os.path.exists(out)

    def test_draw_pc(self, tmp_path, rng):
        out = draw_pc(rng.normal(size=(64, 3)), save_dir=str(tmp_path), text_="t")
        if out is not None:
            assert os.path.exists(out)


class TestPlyReader:
    def _write_ascii_ply(self, path, pts):
        with open(path, "wb") as f:
            header = (
                "ply\nformat ascii 1.0\n"
                f"element vertex {len(pts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n"
            )
            f.write(header.encode())
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n".encode())

    def _write_binary_ply(self, path, pts):
        import struct

        with open(path, "wb") as f:
            header = (
                "ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(pts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\n"
                "end_header\n"
            )
            f.write(header.encode())
            for p in pts:
                f.write(struct.pack("<fffB", p[0], p[1], p[2], 255))

    def test_ascii_and_binary(self, tmp_path, rng):
        import sys

        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..", "tools", "data_extraction")
        )
        from extract_scannet_objects import read_ply_vertices, canonical_label

        pts = rng.normal(size=(20, 3)).astype(np.float32)
        self._write_ascii_ply(tmp_path / "a.ply", pts)
        got = read_ply_vertices(str(tmp_path / "a.ply"))
        np.testing.assert_allclose(got, pts, atol=1e-4)

        self._write_binary_ply(tmp_path / "b.ply", pts)
        got = read_ply_vertices(str(tmp_path / "b.ply"))
        np.testing.assert_allclose(got, pts, atol=1e-5)

        assert canonical_label("Couch ") == "sofa"
        assert canonical_label("chair") == "chair"
        assert canonical_label("doorframe") is None


class TestLegacyLoaders:
    def test_per_file_tree_roundtrip(self, tmp_path, rng):
        # build a tiny per-file tree, load it, and also test the dump builder
        for ci, cls in enumerate(["chair", "table"]):
            for split in ("train", "test"):
                d = tmp_path / cls / split
                d.mkdir(parents=True)
                for i in range(3):
                    np.save(d / f"{i}.npy", rng.normal(size=(32, 3)).astype(np.float32))
        pts, labels = load_modelnet_files(str(tmp_path), "train", pc_input_num=32)
        assert pts.shape == (6, 32, 3)
        assert sorted(labels.tolist()) == [0, 0, 0, 1, 1, 1]

        extract_shapenet_to_npy(str(tmp_path))
        assert (tmp_path / "train_pts.npy").exists()
        dumped = np.load(tmp_path / "train_pts.npy")
        assert dumped.shape[0] == 6

    def test_scannet_h5(self, tmp_path, rng):
        import h5py

        data = rng.normal(size=(5, 16, 3)).astype(np.float32)
        label = rng.integers(0, 10, 5)
        with h5py.File(tmp_path / "train_0.h5", "w") as hf:
            hf.create_dataset("data", data=data)
            hf.create_dataset("label", data=label)
        (tmp_path / "train_files.txt").write_text("train_0.h5\n")
        pts, labels = load_scannet_h5(str(tmp_path), "train")
        np.testing.assert_allclose(pts, data)
        np.testing.assert_array_equal(labels, label)
