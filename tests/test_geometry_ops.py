"""Unit tests for sug_tpu.ops.geometry against brute-force numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sug_tpu.ops import (
    square_distance,
    knn_indices,
    index_points,
    farthest_point_sample,
    query_ball_point,
    three_nn_interpolate,
    chamfer_distance,
    get_graph_feature,
    sample_and_group,
    sample_and_group_all,
)


def np_square_distance(src, dst):
    return ((src[:, :, None, :] - dst[:, None, :, :]) ** 2).sum(-1)


def np_fps(xyz, npoint, start):
    """Brute-force farthest point sampling oracle (per cloud)."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int64)
    for b in range(B):
        dists = np.full(N, 1e10)
        farthest = start[b]
        for i in range(npoint):
            out[b, i] = farthest
            d = ((xyz[b] - xyz[b, farthest]) ** 2).sum(-1)
            dists = np.minimum(dists, d)
            farthest = int(np.argmax(dists))
    return out


class TestSquareDistance:
    def test_matches_numpy(self, rng):
        src = rng.normal(size=(2, 5, 3)).astype(np.float32)
        dst = rng.normal(size=(2, 7, 3)).astype(np.float32)
        got = np.asarray(square_distance(jnp.array(src), jnp.array(dst)))
        np.testing.assert_allclose(got, np_square_distance(src, dst), atol=1e-4)

    def test_self_distance_zero_diag(self, rng):
        x = rng.normal(size=(1, 10, 3)).astype(np.float32)
        d = np.asarray(square_distance(jnp.array(x), jnp.array(x)))
        np.testing.assert_allclose(np.diagonal(d[0]), 0.0, atol=1e-4)


class TestKNN:
    def test_matches_bruteforce(self, rng):
        x = rng.normal(size=(3, 32, 4)).astype(np.float32)
        k = 5
        idx = np.asarray(knn_indices(jnp.array(x), k))
        d = np_square_distance(x, x)
        for b in range(3):
            for n in range(32):
                expect = set(np.argsort(d[b, n])[:k].tolist())
                assert set(idx[b, n].tolist()) == expect

    def test_self_is_neighbor(self, rng):
        x = rng.normal(size=(2, 16, 3)).astype(np.float32)
        idx = np.asarray(knn_indices(jnp.array(x), 4))
        for b in range(2):
            for n in range(16):
                assert n in idx[b, n]


class TestIndexPoints:
    def test_rank2(self, rng):
        pts = rng.normal(size=(2, 8, 3)).astype(np.float32)
        idx = rng.integers(0, 8, size=(2, 4))
        got = np.asarray(index_points(jnp.array(pts), jnp.array(idx)))
        for b in range(2):
            np.testing.assert_allclose(got[b], pts[b, idx[b]])

    def test_rank3(self, rng):
        pts = rng.normal(size=(2, 8, 5)).astype(np.float32)
        idx = rng.integers(0, 8, size=(2, 4, 6))
        got = np.asarray(index_points(jnp.array(pts), jnp.array(idx)))
        for b in range(2):
            np.testing.assert_allclose(got[b], pts[b, idx[b]])


class TestFPS:
    def test_matches_oracle(self, rng):
        xyz = rng.normal(size=(4, 64, 3)).astype(np.float32)
        start = np.array([0, 3, 10, 63], dtype=np.int32)
        got = np.asarray(farthest_point_sample(jnp.array(xyz), 16, jnp.array(start)))
        expect = np_fps(xyz, 16, start)
        np.testing.assert_array_equal(got, expect)

    def test_indices_unique(self, rng):
        xyz = rng.normal(size=(2, 128, 3)).astype(np.float32)
        idx = np.asarray(farthest_point_sample(jnp.array(xyz), 32))
        for b in range(2):
            assert len(set(idx[b].tolist())) == 32

    def test_default_start_is_zero(self, rng):
        xyz = rng.normal(size=(1, 16, 3)).astype(np.float32)
        idx = np.asarray(farthest_point_sample(jnp.array(xyz), 4))
        assert idx[0, 0] == 0


class TestQueryBall:
    def test_within_radius(self, rng):
        xyz = rng.uniform(-1, 1, size=(2, 64, 3)).astype(np.float32)
        new_xyz = xyz[:, :8]
        r, ns = 0.5, 16
        idx = np.asarray(query_ball_point(r, ns, jnp.array(xyz), jnp.array(new_xyz)))
        d = np_square_distance(new_xyz, xyz)
        for b in range(2):
            for s in range(8):
                in_ball = np.where(d[b, s] <= r**2)[0]
                for j in idx[b, s]:
                    assert j in in_ball

    def test_pad_with_first(self, rng):
        # one isolated point far away: ball around it only contains itself
        xyz = np.zeros((1, 8, 3), dtype=np.float32)
        xyz[0, :7] = rng.uniform(-0.1, 0.1, size=(7, 3))
        xyz[0, 7] = [100.0, 100.0, 100.0]
        new_xyz = xyz[:, 7:8]
        idx = np.asarray(query_ball_point(0.3, 4, jnp.array(xyz), jnp.array(new_xyz)))
        assert (idx == 7).all()

    def test_ascending_in_ball_index_order(self, rng):
        xyz = rng.uniform(-1, 1, size=(1, 32, 3)).astype(np.float32)
        idx = np.asarray(query_ball_point(0.8, 8, jnp.array(xyz), jnp.array(xyz[:, :4])))
        d = np_square_distance(xyz[:, :4], xyz)
        for s in range(4):
            in_ball = np.where(d[0, s] <= 0.8**2)[0]
            expect = in_ball[:8]
            got_unique = idx[0, s][: len(expect)]
            np.testing.assert_array_equal(np.sort(got_unique), np.sort(expect))

    def test_knn_mode_radius_none(self, rng):
        xyz = rng.normal(size=(1, 32, 3)).astype(np.float32)
        idx = np.asarray(query_ball_point(None, 4, jnp.array(xyz), jnp.array(xyz[:, :4])))
        d = np_square_distance(xyz[:, :4], xyz)
        for s in range(4):
            expect = set(np.argsort(d[0, s])[:4].tolist())
            assert set(idx[0, s].tolist()) == expect


class TestThreeNNInterpolate:
    def test_weights_recover_exact_on_coincident(self, rng):
        xyz_coarse = rng.normal(size=(1, 8, 3)).astype(np.float32)
        feats = rng.normal(size=(1, 8, 4)).astype(np.float32)
        # dense points == coarse points -> interpolation must return feats
        got = np.asarray(
            three_nn_interpolate(jnp.array(xyz_coarse), jnp.array(xyz_coarse), jnp.array(feats))
        )
        np.testing.assert_allclose(got, feats, atol=1e-3)

    def test_convex_combination(self, rng):
        xyz_d = rng.normal(size=(1, 16, 3)).astype(np.float32)
        xyz_c = rng.normal(size=(1, 6, 3)).astype(np.float32)
        feats = np.ones((1, 6, 2), dtype=np.float32)
        got = np.asarray(three_nn_interpolate(jnp.array(xyz_d), jnp.array(xyz_c), jnp.array(feats)))
        np.testing.assert_allclose(got, 1.0, atol=1e-4)

    def test_differentiable(self, rng):
        xyz_d = jnp.array(rng.normal(size=(1, 8, 3)), dtype=jnp.float32)
        xyz_c = jnp.array(rng.normal(size=(1, 4, 3)), dtype=jnp.float32)
        feats = jnp.array(rng.normal(size=(1, 4, 2)), dtype=jnp.float32)
        g = jax.grad(lambda f: jnp.sum(three_nn_interpolate(xyz_d, xyz_c, f)))(feats)
        assert np.isfinite(np.asarray(g)).all()


class TestChamfer:
    def test_zero_on_identical(self, rng):
        pc = rng.normal(size=(3, 64, 3)).astype(np.float32)
        d = np.asarray(chamfer_distance(jnp.array(pc), jnp.array(pc)))
        np.testing.assert_allclose(d, 0.0, atol=1e-4)

    def test_symmetric(self, rng):
        a = rng.normal(size=(2, 32, 3)).astype(np.float32)
        b = rng.normal(size=(2, 32, 3)).astype(np.float32)
        d1 = np.asarray(chamfer_distance(jnp.array(a), jnp.array(b)))
        d2 = np.asarray(chamfer_distance(jnp.array(b), jnp.array(a)))
        np.testing.assert_allclose(d1, d2, rtol=1e-4)

    def test_matches_bruteforce(self, rng):
        a = rng.normal(size=(2, 16, 3)).astype(np.float32)
        b = rng.normal(size=(2, 24, 3)).astype(np.float32)
        d = np_square_distance(a, b)
        expect = d.min(2).mean(1) + d.min(1).mean(1)
        got = np.asarray(chamfer_distance(jnp.array(a), jnp.array(b)))
        np.testing.assert_allclose(got, expect, rtol=1e-3)


class TestGraphFeature:
    def test_shape_and_content(self, rng):
        x = rng.normal(size=(2, 16, 3)).astype(np.float32)
        k = 4
        feat = np.asarray(get_graph_feature(jnp.array(x), k))
        assert feat.shape == (2, 16, 4, 6)
        # last C channels are the center point replicated
        np.testing.assert_allclose(feat[:, :, 0, 3:], x, atol=1e-5)
        # neighbor-minus-center of self row (nearest neighbor = self) is 0 for
        # at least one of the k entries
        diffs = np.abs(feat[..., :3]).sum(-1)  # (B, N, k)
        assert (diffs.min(-1) < 1e-5).all()


class TestSampleAndGroup:
    def test_shapes(self, rng):
        xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
        feats = rng.normal(size=(2, 64, 8)).astype(np.float32)
        new_xyz, new_feats = sample_and_group(16, 0.4, 8, jnp.array(xyz), jnp.array(feats))
        assert new_xyz.shape == (2, 16, 3)
        assert new_feats.shape == (2, 16, 8, 11)

    def test_group_all(self, rng):
        xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
        feats = rng.normal(size=(2, 64, 8)).astype(np.float32)
        new_xyz, new_feats = sample_and_group_all(jnp.array(xyz), jnp.array(feats))
        assert new_xyz.shape == (2, 1, 3)
        assert new_feats.shape == (2, 1, 64, 11)
