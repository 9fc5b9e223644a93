"""Property-based tests (hypothesis) for geometry ops and losses."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

from sug_tpu.losses.mmd import mix_rbf_mmd2
from sug_tpu.ops.augment import normalize_pc
from sug_tpu.ops.geometry import (
    chamfer_distance,
    farthest_point_sample,
    query_ball_point,
)

SETTINGS = dict(max_examples=10, deadline=None)

clouds = hnp.arrays(
    np.float32,
    st.tuples(st.integers(1, 3), st.integers(8, 24), st.just(3)),
    elements=st.floats(-2, 2, width=32),
)


@settings(**SETTINGS)
@given(clouds, st.integers(2, 8))
def test_fps_indices_valid_and_first_is_start(pc, npoint):
    idx = np.asarray(farthest_point_sample(jnp.asarray(pc), npoint))
    B, N, _ = pc.shape
    assert idx.shape == (B, npoint)
    assert (idx >= 0).all() and (idx < N).all()
    assert (idx[:, 0] == 0).all()


@settings(**SETTINGS)
@given(clouds, st.floats(0.2, 1.5), st.integers(2, 8))
def test_ball_query_in_radius_or_padded(pc, radius, nsample):
    x = jnp.asarray(pc)
    idx = np.asarray(query_ball_point(float(radius), nsample, x, x[:, :4]))
    d = ((pc[:, :4, None] - pc[:, None]) ** 2).sum(-1)
    B = pc.shape[0]
    for b in range(B):
        for s in range(min(4, pc.shape[1])):
            first = idx[b, s, 0]
            for j in idx[b, s]:
                # every index is in-ball, or a pad copy of the first entry
                assert d[b, s, j] <= radius**2 + 1e-4 or j == first


@settings(**SETTINGS)
@given(clouds, st.floats(0.5, 4.0))
def test_chamfer_scales_quadratically(pc, scale):
    a = jnp.asarray(pc)
    b = jnp.asarray(pc[:, ::-1] + 0.1)
    base = np.asarray(chamfer_distance(a, b))
    scaled = np.asarray(chamfer_distance(a * scale, b * scale))
    np.testing.assert_allclose(scaled, base * scale**2, rtol=2e-2, atol=1e-5)


@settings(**SETTINGS)
@given(clouds, st.floats(0.5, 5.0), st.floats(-3, 3))
def test_normalize_invariant_to_similarity_transform(pc, scale, shift):
    # near-degenerate clouds lose the spread to float32 cancellation against
    # the shift; the property only holds for well-conditioned inputs
    if np.abs(pc - pc.mean(1, keepdims=True)).max() < 0.05:
        return
    a = np.asarray(normalize_pc(jnp.asarray(pc)))
    b = np.asarray(normalize_pc(jnp.asarray(pc * scale + shift)))
    np.testing.assert_allclose(a, b, atol=2e-2)


@settings(**SETTINGS)
@given(
    hnp.arrays(np.float32, st.tuples(st.integers(3, 8), st.just(4)),
               elements=st.floats(-2, 2, width=32)),
    hnp.arrays(np.float32, st.tuples(st.integers(3, 8), st.just(4)),
               elements=st.floats(-2, 2, width=32)),
)
def test_mmd_symmetric_and_nonneg(X, Y):
    n = min(len(X), len(Y))
    if n < 2:
        return
    X, Y = jnp.asarray(X[:n]), jnp.asarray(Y[:n])
    xy = float(mix_rbf_mmd2(X, Y))
    yx = float(mix_rbf_mmd2(Y, X))
    np.testing.assert_allclose(xy, yx, atol=1e-5)
    assert xy >= -1e-5  # biased estimator is nonnegative
