"""Pallas kernels vs the XLA reference ops (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sug_tpu.ops.geometry import chamfer_distance, farthest_point_sample
from sug_tpu.ops.pallas_kernels import chamfer_pallas, fps_pallas, _min_dists_tiled


class TestChamferPallas:
    def test_small_n_falls_back(self, rng):
        a = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(chamfer_pallas(a, b)), np.asarray(chamfer_distance(a, b)),
            rtol=1e-5,
        )

    def test_tiled_min_matches_bruteforce(self, rng):
        q = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
        s = jnp.asarray(rng.normal(size=(2, 512, 3)), jnp.float32)
        got = np.asarray(_min_dists_tiled(q, s, tile_q=128, tile_s=128))
        qn, sn = np.asarray(q), np.asarray(s)
        expect = ((qn[:, :, None] - sn[:, None]) ** 2).sum(-1).min(-1)
        np.testing.assert_allclose(got, expect, atol=1e-3)

    def test_large_n_kernel_path(self, rng):
        a = jnp.asarray(rng.normal(size=(1, 4096, 3)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(1, 4096, 3)), jnp.float32)
        got = np.asarray(chamfer_pallas(a, b, tile=512))
        expect = np.asarray(chamfer_distance(a, b))
        np.testing.assert_allclose(got, expect, rtol=1e-3)

    def test_zero_on_identical_large(self, rng):
        a = jnp.asarray(rng.normal(size=(1, 4096, 3)), jnp.float32)
        d = np.asarray(chamfer_pallas(a, a, tile=512))
        np.testing.assert_allclose(d, 0.0, atol=1e-3)


class TestFPSPallas:
    def test_matches_xla_fps(self, rng):
        xyz = jnp.asarray(rng.normal(size=(4, 256, 3)), jnp.float32)
        start = jnp.asarray(rng.integers(0, 256, 4), jnp.int32)
        got = np.asarray(fps_pallas(xyz, 32, start))
        expect = np.asarray(farthest_point_sample(xyz, 32, start))
        np.testing.assert_array_equal(got, expect)

    def test_indices_unique(self, rng):
        xyz = jnp.asarray(rng.normal(size=(2, 512, 3)), jnp.float32)
        idx = np.asarray(fps_pallas(xyz, 64))
        for b in range(2):
            assert len(set(idx[b].tolist())) == 64


class TestBlockwiseKNN:
    def test_matches_full_knn(self, rng):
        from sug_tpu.ops.geometry import knn_blockwise, square_distance
        import jax.numpy as jnp

        x = jnp.asarray(rng.normal(size=(2, 300, 4)), jnp.float32)
        got = np.asarray(knn_blockwise(x, 8, tile=128))
        d = np.asarray(square_distance(x, x))
        for b in range(2):
            for n in range(0, 300, 37):
                expect = set(np.argsort(d[b, n])[:8].tolist())
                assert set(got[b, n].tolist()) == expect

    def test_nonmultiple_tile(self, rng):
        from sug_tpu.ops.geometry import knn_blockwise

        x = jnp.asarray(rng.normal(size=(1, 100, 3)), jnp.float32)
        idx = np.asarray(knn_blockwise(x, 4, tile=64))
        assert idx.shape == (1, 100, 4)
        assert (idx < 100).all() and (idx >= 0).all()

    def test_self_in_neighbors(self, rng):
        from sug_tpu.ops.geometry import knn_blockwise

        x = jnp.asarray(rng.normal(size=(1, 200, 3)), jnp.float32)
        idx = np.asarray(knn_blockwise(x, 4, tile=64))
        for n in range(200):
            assert n in idx[0, n]
