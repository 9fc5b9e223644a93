"""Tests for the MMD/alignment loss library against numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sug_tpu.losses import (
    mix_rbf_mmd2,
    soft_mmd,
    hard_mmd,
    max_hard_mmd,
    linear_mmd2,
    mmd_cal,
    geometric_weights,
    prob_weights_soft,
    distance2weights,
    SIGMA_LIST,
)
from sug_tpu.losses.mmd import one_hot_labels


def np_mix_rbf_mmd2(X, Y, sigmas, biased=True, sample_weights=None):
    m = X.shape[0]
    Z = np.concatenate([X, Y], 0)
    sq = ((Z[:, None, :] - Z[None, :, :]) ** 2).sum(-1)
    K = sum(np.exp(-sq / (2 * s**2)) for s in sigmas)
    K_XX, K_XY, K_YY = K[:m, :m], K[:m, m:], K[m:, m:]
    diag_X, diag_Y = np.diag(K_XX), np.diag(K_YY)
    Kt_XX = K_XX.sum() - diag_X.sum()
    Kt_YY = K_YY.sum() - diag_Y.sum()
    colsums = K_XY.sum(0)
    if sample_weights is not None:
        colsums = colsums * sample_weights
    K_XY_sum = colsums.sum()
    if biased:
        return (
            (Kt_XX + diag_X.sum()) / m**2
            + (Kt_YY + diag_Y.sum()) / m**2
            - 2 * K_XY_sum / m**2
        )
    return Kt_XX / (m * (m - 1)) + Kt_YY / (m * (m - 1)) - 2 * K_XY_sum / m**2


class TestMixRbfMMD2:
    def test_zero_on_identical(self, rng):
        X = rng.normal(size=(16, 8)).astype(np.float32)
        v = float(mix_rbf_mmd2(jnp.array(X), jnp.array(X)))
        assert abs(v) < 1e-5

    def test_matches_numpy(self, rng):
        X = rng.normal(size=(8, 4)).astype(np.float32)
        Y = rng.normal(size=(8, 4)).astype(np.float32) + 0.5
        got = float(mix_rbf_mmd2(jnp.array(X), jnp.array(Y)))
        expect = np_mix_rbf_mmd2(X, Y, SIGMA_LIST)
        np.testing.assert_allclose(got, expect, rtol=1e-4)

    def test_sample_weights(self, rng):
        X = rng.normal(size=(8, 4)).astype(np.float32)
        Y = rng.normal(size=(8, 4)).astype(np.float32)
        w = rng.uniform(0.5, 1.5, size=8).astype(np.float32)
        got = float(mix_rbf_mmd2(jnp.array(X), jnp.array(Y), sample_weights=jnp.array(w)))
        expect = np_mix_rbf_mmd2(X, Y, SIGMA_LIST, sample_weights=w)
        np.testing.assert_allclose(got, expect, rtol=1e-4)

    def test_unbiased(self, rng):
        X = rng.normal(size=(8, 4)).astype(np.float32)
        Y = rng.normal(size=(8, 4)).astype(np.float32)
        got = float(mix_rbf_mmd2(jnp.array(X), jnp.array(Y), biased=False))
        expect = np_mix_rbf_mmd2(X, Y, SIGMA_LIST, biased=False)
        np.testing.assert_allclose(got, expect, rtol=1e-4)

    def test_positive_for_shifted(self, rng):
        X = rng.normal(size=(32, 8)).astype(np.float32)
        Y = X + 2.0
        assert float(mix_rbf_mmd2(jnp.array(X), jnp.array(Y))) > 0.01


class TestSoftMMD:
    def test_equals_concat_mmd(self, rng):
        X = rng.normal(size=(8, 6)).astype(np.float32)
        Y = rng.normal(size=(8, 6)).astype(np.float32)
        ls = rng.integers(0, 10, 8)
        lt = rng.integers(0, 10, 8)
        scale = 5.0
        got = float(soft_mmd(jnp.array(ls), jnp.array(X), jnp.array(lt), jnp.array(Y), scale))
        oh_s = np.eye(10)[ls] * scale
        oh_t = np.eye(10)[lt] * scale
        expect = np_mix_rbf_mmd2(
            np.concatenate([X, oh_s], 1).astype(np.float32),
            np.concatenate([Y, oh_t], 1).astype(np.float32),
            SIGMA_LIST,
        )
        np.testing.assert_allclose(got, expect, rtol=1e-4)


class TestHardMMD:
    def test_equals_subset_mmd(self, rng):
        X = rng.normal(size=(16, 4)).astype(np.float32)
        Y = rng.normal(size=(16, 4)).astype(np.float32)
        ls = rng.integers(0, 3, 16)
        lt = rng.integers(0, 3, 16)
        sel = ls == lt
        assert sel.sum() >= 2  # seeded rng guarantees some matches
        got = float(hard_mmd(jnp.array(ls), jnp.array(X), jnp.array(lt), jnp.array(Y)))
        expect = np_mix_rbf_mmd2(X[sel], Y[sel], SIGMA_LIST)
        np.testing.assert_allclose(got, expect, rtol=1e-4)


class TestMaxHardMMD:
    def test_equals_reference_greedy(self, rng):
        X = rng.normal(size=(16, 4)).astype(np.float32)
        Y = rng.normal(size=(16, 4)).astype(np.float32)
        ls = rng.integers(0, 4, 16)
        lt = rng.integers(0, 4, 16)
        # reference greedy overlap: per class take min count from each side
        sel_s, sel_t = [], []
        for c in range(10):
            ia = np.where(ls == c)[0]
            ib = np.where(lt == c)[0]
            k = min(len(ia), len(ib))
            sel_s.extend(ia[:k])
            sel_t.extend(ib[:k])
        got = float(max_hard_mmd(jnp.array(ls), jnp.array(X), jnp.array(lt), jnp.array(Y)))
        expect = np_mix_rbf_mmd2(X[sel_s], Y[sel_t], SIGMA_LIST)
        np.testing.assert_allclose(got, expect, rtol=1e-4)


class TestWeights:
    def test_mean2one_quirk_zero_when_mean_gt_one(self):
        d = jnp.array([2.0, 3.0, 4.0])
        w = np.asarray(distance2weights(d, "mean2one"))
        np.testing.assert_allclose(w, 0.0)

    def test_mean2one_scales_when_mean_small(self):
        # mean = 0.3 -> 1/mean = 3.33 -> trunc = 3 (away from float32
        # boundary cases like 1/0.2 = 4.9999995)
        d = jnp.array([0.1, 0.2, 0.6])
        w = np.asarray(distance2weights(d, "mean2one"))
        np.testing.assert_allclose(w, np.array([0.1, 0.2, 0.6]) * 3.0, rtol=1e-5)

    def test_naive_inverse_sums_to_one(self, rng):
        d = jnp.array(rng.uniform(0.1, 2.0, 16), dtype=jnp.float32)
        w = np.asarray(distance2weights(d, "naive_inverse"))
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-4)

    def test_hist_descending(self, rng):
        d = jnp.array(np.linspace(0, 1, 20), dtype=jnp.float32)
        w = np.asarray(distance2weights(d, "hist"))
        assert w[0] == pytest.approx(1.0)
        assert (np.diff(w) <= 1e-6).all()

    def test_geometric_weights_shape(self, rng):
        pc1 = jnp.array(rng.normal(size=(4, 32, 3)), dtype=jnp.float32)
        pc2 = jnp.array(rng.normal(size=(4, 32, 3)), dtype=jnp.float32)
        w = geometric_weights(pc1, pc2, "naive_inverse")
        assert w.shape == (4,)

    def test_prob_weights_shape(self, rng):
        ps = jnp.array(rng.normal(size=(8, 10)), dtype=jnp.float32)
        pt = jnp.array(rng.normal(size=(8, 10)), dtype=jnp.float32)
        ls = jnp.array(rng.integers(0, 10, 8))
        lt = jnp.array(rng.integers(0, 10, 8))
        w = prob_weights_soft(ps, pt, ls, lt, 0.5, "mean2one")
        assert w.shape == (8,)
        assert np.isfinite(np.asarray(w)).all()


class TestDispatcher:
    def test_soft_dispatch(self, rng):
        X = jnp.array(rng.normal(size=(8, 4)), dtype=jnp.float32)
        Y = jnp.array(rng.normal(size=(8, 4)), dtype=jnp.float32)
        ls = jnp.array(rng.integers(0, 10, 8))
        lt = jnp.array(rng.integers(0, 10, 8))
        cfg = {"NAME": "SOFT_MMD", "LABEL_SCALE": 5.0}
        v = mmd_cal(ls, X, lt, Y, cfg)
        assert np.isfinite(float(v))

    def test_geo_weighted_dispatch(self, rng):
        X = jnp.array(rng.normal(size=(4, 6)), dtype=jnp.float32)
        Y = jnp.array(rng.normal(size=(4, 6)), dtype=jnp.float32)
        ls = jnp.array(rng.integers(0, 10, 4))
        lt = jnp.array(rng.integers(0, 10, 4))
        pc_s = jnp.array(rng.normal(size=(4, 16, 3)), dtype=jnp.float32)
        pc_t = jnp.array(rng.normal(size=(4, 16, 3)), dtype=jnp.float32)
        cfg = {"NAME": "SOFT_MMD", "LABEL_SCALE": 50.0, "GEO_WEIGHTS": "mean2one"}
        v = mmd_cal(ls, X, lt, Y, cfg, data_s=pc_s, data_t=pc_t)
        assert np.isfinite(float(v))

    def test_jittable(self, rng):
        cfg = {"NAME": "SOFT_MMD", "LABEL_SCALE": 5.0}
        f = jax.jit(lambda ls, X, lt, Y: mmd_cal(ls, X, lt, Y, cfg))
        v = f(
            jnp.array(rng.integers(0, 10, 8)),
            jnp.array(rng.normal(size=(8, 4)), dtype=jnp.float32),
            jnp.array(rng.integers(0, 10, 8)),
            jnp.array(rng.normal(size=(8, 4)), dtype=jnp.float32),
        )
        assert np.isfinite(float(v))


def test_linear_mmd2(rng):
    X = rng.normal(size=(8, 4)).astype(np.float32)
    Y = rng.normal(size=(8, 4)).astype(np.float32)
    delta = X - Y
    expect = np.mean((delta[:-1] * delta[1:]).sum(1))
    got = float(linear_mmd2(jnp.array(X), jnp.array(Y)))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_one_hot(rng):
    lbl = jnp.array([0, 3, 9])
    oh = np.asarray(one_hot_labels(lbl))
    assert oh.shape == (3, 10)
    np.testing.assert_allclose(oh.sum(1), 1.0)
    assert oh[1, 3] == 1.0


def test_poly_mmd2(rng):
    from sug_tpu.losses import poly_mmd2

    X = rng.normal(size=(8, 4)).astype(np.float32)
    Y = rng.normal(size=(8, 4)).astype(np.float32)
    d, alpha, c = 2, 1.0, 2.0
    K_XX = (alpha * (X[:-1] * X[1:]).sum(1) + c) ** d
    K_YY = (alpha * (Y[:-1] * Y[1:]).sum(1) + c) ** d
    K_XY = (alpha * (X[:-1] * Y[1:]).sum(1) + c) ** d
    K_YX = (alpha * (Y[:-1] * X[1:]).sum(1) + c) ** d
    expect = K_XX.mean() + K_YY.mean() - K_XY.mean() - K_YX.mean()
    got = float(poly_mmd2(jnp.array(X), jnp.array(Y)))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_mmd2_and_ratio(rng):
    from sug_tpu.losses import mix_rbf_mmd2_and_ratio, mix_rbf_mmd2

    X = rng.normal(size=(16, 4)).astype(np.float32)
    Y = rng.normal(size=(16, 4)).astype(np.float32) + 1.0
    ratio, mmd2, var = mix_rbf_mmd2_and_ratio(jnp.array(X), jnp.array(Y))
    np.testing.assert_allclose(
        float(mmd2), float(mix_rbf_mmd2(jnp.array(X), jnp.array(Y))), rtol=1e-4
    )
    assert float(var) > 0
    np.testing.assert_allclose(
        float(ratio), float(mmd2) / np.sqrt(max(float(var), 1e-8)), rtol=1e-4
    )
