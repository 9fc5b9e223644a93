"""On-device, jittable point-cloud augmentations.

The reference does per-item numpy augmentation inside DataLoader workers
(data/data_utils.py, data/dataloader.py:302-327). Here augmentation is a pure
function of a ``jax.random`` key over the whole batch, so it lives *inside*
the jitted train step — zero host round-trips, fused into the forward pass.

Parity (distributional, not bitwise — threaded PRNG replaces numpy seeds):
- normal_pc: center + divide by max norm (data/data_utils.py:5-15).
- rotation_point_cloud: uniform z-axis rotation (data/data_utils.py:59-82;
  note the reference rotates about z, the commented variants are y/x).
- jitter_point_cloud: clipped gaussian, sigma 0.01 clip 0.05
  (data/data_utils.py:106-116).
- rotate_shape: fixed-angle axis rotation, used for the -pi/2 x-rotation of
  non-modelnet data under DGCNN (data/dataloader.py:308-310).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_pc(pc: jax.Array) -> jax.Array:
    """Center each cloud and scale by its max point norm.

    Args:
        pc: (..., N, 3)
    Returns:
        normalized clouds, same shape.
    """
    mean = jnp.mean(pc, axis=-2, keepdims=True)
    pc = pc - mean
    max_norm = jnp.max(
        jnp.sqrt(jnp.sum(pc**2, axis=-1, keepdims=True)), axis=-2, keepdims=True
    )
    return pc / jnp.maximum(max_norm, 1e-12)


def _rot_x(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, c, -s], -1),
            jnp.stack([zero, s, c], -1),
        ],
        -2,
    )


def _rot_y(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, zero, s], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-s, zero, c], -1),
        ],
        -2,
    )


def _rot_z(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], -1),
            jnp.stack([s, c, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )


_ROT = {"x": _rot_x, "y": _rot_y, "z": _rot_z}


def rotate_shape(pc: jax.Array, axis: str, angle: float) -> jax.Array:
    """Rotate clouds by a fixed angle about an axis: ``pc @ R``.

    Matches reference ``rotate_shape`` (data/data_utils.py:38-56) which
    right-multiplies by the rotation matrix.
    """
    R = _ROT[axis](jnp.asarray(angle, dtype=pc.dtype))
    return pc @ R


def random_rotate_z(key: jax.Array, pc: jax.Array) -> jax.Array:
    """Per-cloud uniform rotation about the z axis.

    Args:
        key: PRNG key.
        pc: (B, N, 3)
    Reference: data/data_utils.py:59-82 (one angle per cloud, ``pc @ Rz``).
    """
    B = pc.shape[0]
    angles = jax.random.uniform(key, (B,), dtype=pc.dtype) * 2.0 * jnp.pi
    R = _rot_z(angles)  # (B, 3, 3)
    return jnp.einsum("bnc,bcd->bnd", pc, R)


def random_rotate_y(key: jax.Array, pc: jax.Array) -> jax.Array:
    """Per-cloud uniform rotation about the y axis (UDA-style variant)."""
    B = pc.shape[0]
    angles = jax.random.uniform(key, (B,), dtype=pc.dtype) * 2.0 * jnp.pi
    R = _rot_y(angles)
    return jnp.einsum("bnc,bcd->bnd", pc, R)


def jitter_pc(
    key: jax.Array, pc: jax.Array, sigma: float = 0.01, clip: float = 0.05
) -> jax.Array:
    """Clipped gaussian per-point jitter (data/data_utils.py:106-116)."""
    noise = jnp.clip(sigma * jax.random.normal(key, pc.shape, pc.dtype), -clip, clip)
    return pc + noise


def random_scale_pc(
    key: jax.Array, pc: jax.Array, lo: float = 0.8, hi: float = 1.25
) -> jax.Array:
    """Per-cloud uniform scale (data/data_utils.py:132-142; unused by default
    pc_augment in the reference but part of its augmentation library)."""
    B = pc.shape[0]
    scales = jax.random.uniform(key, (B, 1, 1), pc.dtype, lo, hi)
    return pc * scales


def random_shift_pc(key: jax.Array, pc: jax.Array, rng: float = 0.1) -> jax.Array:
    """Per-cloud xyz shift (data/data_utils.py:119-129)."""
    B = pc.shape[0]
    shifts = jax.random.uniform(key, (B, 1, 3), pc.dtype, -rng, rng)
    return pc + shifts


def random_subsample(key: jax.Array, pc: jax.Array, num_points: int) -> jax.Array:
    """Randomly subsample each cloud to num_points (without replacement).

    Args:
        pc: (B, N, 3) with N >= num_points.
    Reference: data/dataloader.py:322-325 (per-item shuffled index take).
    """
    B, N, _ = pc.shape
    if N == num_points:
        return pc
    keys = jax.random.split(key, B)
    perm = jax.vmap(lambda k: jax.random.permutation(k, N)[:num_points])(keys)
    return jnp.take_along_axis(pc, perm[..., None], axis=1)


def augment_batch(
    key: jax.Array,
    pc: jax.Array,
    rotate: bool = True,
    jitter: bool = True,
    scale: bool = False,
    shift: bool = False,
) -> jax.Array:
    """Standard SUG train-time augmentation: z-rotation + jitter.

    Matches ``pc_augment`` (data/data_utils.py:169-175) / the per-item
    ``__getitem__`` augmentation of UnifiedPointDG (data/dataloader.py:312-314).
    """
    k_rot, k_jit, k_scale, k_shift = jax.random.split(key, 4)
    if rotate:
        pc = random_rotate_z(k_rot, pc)
    if jitter:
        pc = jitter_pc(k_jit, pc)
    if scale:
        pc = random_scale_pc(k_scale, pc)
    if shift:
        pc = random_shift_pc(k_shift, pc)
    return pc
