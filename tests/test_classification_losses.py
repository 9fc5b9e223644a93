"""Tests for focal loss, class weights, discrepancy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sug_tpu.losses import focal_loss, cross_entropy, class_weights, discrepancy


def test_cross_entropy_matches_numpy(rng):
    logits = rng.normal(size=(8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 8)
    p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    expect = -np.log(p[np.arange(8), labels]).mean()
    got = float(cross_entropy(jnp.array(logits), jnp.array(labels)))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_focal_gamma0_uniform_alpha_is_ce_over_C(rng):
    logits = rng.normal(size=(8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 8)
    ce = float(cross_entropy(jnp.array(logits), jnp.array(labels)))
    fl = float(focal_loss(jnp.array(logits), jnp.array(labels), gamma=0.0))
    np.testing.assert_allclose(fl, ce / 10.0, rtol=1e-4)


def test_focal_downweights_easy(rng):
    easy = jnp.array([[10.0] + [0.0] * 9], dtype=jnp.float32)
    hard = jnp.array([[0.0] * 10], dtype=jnp.float32)
    lbl = jnp.array([0])
    fe = float(focal_loss(easy, lbl, gamma=2.0))
    fh = float(focal_loss(hard, lbl, gamma=2.0))
    ce_ratio = float(cross_entropy(easy, lbl)) / float(cross_entropy(hard, lbl))
    assert fe / fh < ce_ratio  # focal suppresses the easy sample harder than CE


def test_focal_alpha_weighting(rng):
    logits = jnp.zeros((2, 10), dtype=jnp.float32)
    labels = jnp.array([0, 1])
    alpha = np.zeros(10, dtype=np.float32)
    alpha[0] = 1.0
    v = float(focal_loss(logits, labels, gamma=0.0, alpha=alpha))
    # only sample 0 contributes: 0.5 * (1.0 * CE_0 + 0.0 * CE_1)
    ce0 = -np.log(0.1)
    np.testing.assert_allclose(v, 0.5 * ce0, rtol=1e-4)


class TestClassWeights:
    def test_number_inverse(self):
        w = class_weights([10, 20, 70], "number_inverse")
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
        assert w[0] > w[1] > w[2]

    def test_dlsa_fixed_q(self):
        w = class_weights([10, 20, 70], "DLSA", q=0.4)
        expect = np.array([10.0, 20.0, 70.0]) ** -0.4
        expect /= expect.sum()
        np.testing.assert_allclose(w, expect, rtol=1e-5)

    def test_dlsa_adaptive_q(self):
        w = class_weights([10, 20, 70], "DLSA", q="adaptive")
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
        assert w[0] > w[2]

    def test_uniform_fallback(self):
        w = class_weights([1, 2, 3], "whatever")
        np.testing.assert_allclose(w, 1 / 3, rtol=1e-5)

    @pytest.mark.parametrize("weighting", ["number_inverse", "exp_inverse", "DLSA"])
    def test_zero_count_class_is_finite(self, weighting):
        # reference bug (data/dataloader.py:296): 1/0 -> inf makes EVERY
        # weight NaN after normalization; here the absent class gets 0 and
        # the rest renormalize.
        with np.errstate(all="raise"):
            w = class_weights([10, 0, 70], weighting, q=0.4)
        assert np.isfinite(w).all()
        assert w[1] == 0.0
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
        assert w[0] > w[2] > 0

    def test_zero_count_dlsa_adaptive(self):
        with np.errstate(over="raise", invalid="raise"):
            w = class_weights([10, 0, 70], "DLSA", q="adaptive")
        assert np.isfinite(w).all() and w[1] == 0.0


def test_discrepancy(rng):
    a = rng.normal(size=(4, 10)).astype(np.float32)
    assert float(discrepancy(jnp.array(a), jnp.array(a))) < 1e-7
    b = rng.normal(size=(4, 10)).astype(np.float32)
    sa = np.exp(a) / np.exp(a).sum(1, keepdims=True)
    sb = np.exp(b) / np.exp(b).sum(1, keepdims=True)
    expect = np.abs(sa - sb).mean()
    got = float(discrepancy(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(got, expect, rtol=1e-4)
