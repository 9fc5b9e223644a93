"""Gradient correctness of the differentiable geometry ops and losses via
finite differences (float64 for the checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_enable_x64", False)  # models run f32; fd tol adapted


def fd_grad(f, x, eps=1e-3):
    """Central finite-difference gradient of scalar f at x (numpy f32)."""
    x = np.asarray(x, dtype=np.float32)
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gf = g.reshape(-1)
    for i in range(flat.size):
        orig = flat[i]
        flat[i] = orig + eps
        fp = float(f(jnp.asarray(x)))
        flat[i] = orig - eps
        fm = float(f(jnp.asarray(x)))
        flat[i] = orig
        gf[i] = (fp - fm) / (2 * eps)
    return g


class TestChamferGrad:
    def test_matches_fd(self, rng):
        from sug_tpu.ops.geometry import chamfer_distance

        a = rng.normal(size=(1, 6, 3)).astype(np.float32)
        b = jnp.asarray(rng.normal(size=(1, 8, 3)), jnp.float32)
        f = lambda x: jnp.sum(chamfer_distance(x, b))
        got = np.asarray(jax.grad(f)(jnp.asarray(a)))
        expect = fd_grad(f, a)
        np.testing.assert_allclose(got, expect, atol=5e-3)


class TestInterpolateGrad:
    def test_feats_grad_matches_fd(self, rng):
        from sug_tpu.ops.geometry import three_nn_interpolate

        xyz_d = jnp.asarray(rng.normal(size=(1, 5, 3)), jnp.float32)
        xyz_c = jnp.asarray(rng.normal(size=(1, 4, 3)), jnp.float32)
        feats = rng.normal(size=(1, 4, 2)).astype(np.float32)
        f = lambda ft: jnp.sum(three_nn_interpolate(xyz_d, xyz_c, ft) ** 2)
        got = np.asarray(jax.grad(f)(jnp.asarray(feats)))
        expect = fd_grad(f, feats)
        np.testing.assert_allclose(got, expect, atol=5e-3)


class TestMMDGrad:
    def test_soft_mmd_grad_matches_fd(self, rng):
        from sug_tpu.losses.mmd import soft_mmd

        X = rng.normal(size=(4, 3)).astype(np.float32)
        Y = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        ls = jnp.asarray([0, 1, 2, 3])
        lt = jnp.asarray([1, 1, 2, 0])
        f = lambda x: soft_mmd(ls, x, lt, Y, 5.0)
        got = np.asarray(jax.grad(f)(jnp.asarray(X)))
        expect = fd_grad(f, X, eps=3e-3)
        np.testing.assert_allclose(got, expect, atol=1e-2)

    def test_grl_reverses_loss_gradient(self, rng):
        from sug_tpu.models.layers import grad_reverse

        x = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
        lam = jnp.asarray(2.0)
        g_plain = jax.grad(lambda a: jnp.sum(a**2))(x)
        g_rev = jax.grad(lambda a: jnp.sum(grad_reverse(a, lam) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_rev), -2.0 * np.asarray(g_plain), rtol=1e-5)


class TestAugmentGrad:
    def test_rotation_passes_gradients(self, rng):
        """Augmentations inside the jitted step must be differentiable wrt
        the cloud (grads flow back through rotation/jitter)."""
        from sug_tpu.ops.augment import augment_batch

        pc = jnp.asarray(rng.normal(size=(2, 8, 3)), jnp.float32)
        g = jax.grad(lambda x: jnp.sum(augment_batch(jax.random.key(0), x) ** 2))(pc)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0
