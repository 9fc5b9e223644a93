"""Fused EdgeConv kernel (sug_tpu/ops/edgeconv_pallas.py): correctness of the
Pallas kernel (interpret mode on CPU) and equivalence of the restructured
_EdgeConvBlock against the reference formulation
(get_graph_feature -> Dense -> BatchNorm -> leaky_relu -> max over k,
reference model/Model.py:54-121)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sug_tpu.ops.edgeconv_pallas import (
    edgeconv_reduce_reference,
    fused_edgeconv_reduce,
)


def _data(b=2, n=256, c=8, f=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
    return x, u, v


class TestFusedKernelInterpret:
    """Pallas kernel in interpret mode vs the pure-XLA reference."""

    def test_forward_outputs(self):
        x, u, v = _data()
        ref = edgeconv_reduce_reference(x, u, v, 5)
        got = fused_edgeconv_reduce(x, u, v, 5, True)
        for name, r, g in zip(("amax", "amin", "s1", "s2"), ref[:4], got[:4]):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-5, err_msg=name
            )
        np.testing.assert_array_equal(
            np.sort(np.asarray(got[4]), -1), np.sort(np.asarray(ref[4]), -1)
        )

    def test_gradients(self):
        x, u, v = _data(seed=1)

        def loss(fn):
            def inner(u, v):
                amax, amin, s1, s2, _ = fn(u, v)
                return jnp.sum(1.3 * amax - 0.7 * amin + 0.01 * s1 + 0.001 * s2)

            return inner

        gf = jax.grad(
            loss(lambda u, v: fused_edgeconv_reduce(x, u, v, 5, True)), argnums=(0, 1)
        )(u, v)
        gr = jax.grad(
            loss(lambda u, v: edgeconv_reduce_reference(x, u, v, 5)), argnums=(0, 1)
        )(u, v)
        for name, a, b in zip(("du", "dv"), gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
            )

    def test_duplicate_points_tie_break(self):
        """Exact-duplicate points create distance ties; the kernel must pick
        the lowest index, matching lax.top_k."""
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 128, 4)).astype(np.float32)
        x[0, 64] = x[0, 0]  # duplicate
        x[0, 65] = x[0, 0]
        x = jnp.asarray(x)
        u = jnp.asarray(rng.normal(size=(1, 128, 16)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, 128, 16)), jnp.float32)
        ref = edgeconv_reduce_reference(x, u, v, 4)
        got = fused_edgeconv_reduce(x, u, v, 4, True)
        np.testing.assert_array_equal(np.asarray(got[4]), np.asarray(ref[4]))


class TestForwardModes:
    """Both forward kernels (SUG_EDGECONV_FWD_MODE=loop|batched) must produce
    identical outputs AND identical neighbor indices (the batched kernel runs
    the same sequential selection chain); window=2 with k=5 forces a 2+2+1
    window split."""

    @pytest.mark.parametrize(
        "mode,window",
        [("loop", None), ("batched", "2"), ("batched", "8"), ("auto", None)],
    )
    def test_mode_matches_reference(self, monkeypatch, mode, window):
        monkeypatch.setenv("SUG_EDGECONV_FWD_MODE", mode)
        if window is not None:
            monkeypatch.setenv("SUG_EDGECONV_FWD_WINDOW", window)
        x, u, v = _data(seed=9)
        ref = edgeconv_reduce_reference(x, u, v, 5)
        got = fused_edgeconv_reduce(x, u, v, 5, True)
        for name, r, g in zip(("amax", "amin", "s1", "s2"), ref[:4], got[:4]):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-5, err_msg=name
            )
        np.testing.assert_array_equal(
            np.sort(np.asarray(got[4]), -1), np.sort(np.asarray(ref[4]), -1)
        )


class TestBackwardModes:
    """Both backward kernels (SUG_EDGECONV_BWD_MODE=loop|batched) must produce
    reference gradients; window=3 with k=5 forces a 3+2 window split in the
    batched kernel (exercises cross-window first-hit max/min carry)."""

    @pytest.mark.parametrize(
        "mode,window", [("loop", None), ("batched", "3"), ("batched", "8")]
    )
    def test_mode_gradients_match_reference(self, monkeypatch, mode, window):
        monkeypatch.setenv("SUG_EDGECONV_BWD_MODE", mode)
        if window is not None:
            monkeypatch.setenv("SUG_EDGECONV_BWD_WINDOW", window)
        x, u, v = _data(seed=7)

        def loss(fn):
            def inner(u, v):
                amax, amin, s1, s2, _ = fn(u, v)
                return jnp.sum(0.9 * amax - 1.1 * amin + 0.02 * s1 + 0.003 * s2)

            return inner

        gf = jax.grad(
            loss(lambda u, v: fused_edgeconv_reduce(x, u, v, 5, True)), argnums=(0, 1)
        )(u, v)
        gr = jax.grad(
            loss(lambda u, v: edgeconv_reduce_reference(x, u, v, 5)), argnums=(0, 1)
        )(u, v)
        for name, a, b in zip(("du", "dv"), gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
            )


class TestEdgeConvBlockEquivalence:
    """_EdgeConvBlock (fused formulation) == reference computation."""

    def _reference_block(self, params, batch_stats, x, k, train):
        """get_graph_feature -> e @ W -> flax-BN -> leaky_relu -> max."""
        from sug_tpu.ops.geometry import get_graph_feature

        W = params["conv_dense"]["kernel"]  # (2C, F)
        e = get_graph_feature(x, k=k)  # (B, N, k, 2C)
        a = jnp.einsum("bnkc,cf->bnkf", e, W)
        if train:
            mean = jnp.mean(a, axis=(0, 1, 2))
            var = jnp.mean(a * a, axis=(0, 1, 2)) - mean**2
        else:
            mean, var = batch_stats["bn_mean"], batch_stats["bn_var"]
        y = (a - mean) * jax.lax.rsqrt(var + 1e-5) * params["bn_scale"] + params[
            "bn_bias"
        ]
        y = jax.nn.leaky_relu(y, negative_slope=0.01)
        return jnp.max(y, axis=2), mean, var

    @pytest.mark.parametrize("train", [True, False])
    def test_block_matches_reference(self, train):
        from sug_tpu.models.dgcnn import K_NEIGHBORS, _EdgeConvBlock

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 128, 8)), jnp.float32)
        block = _EdgeConvBlock(32)
        variables = block.init(jax.random.key(0), x, True)
        params = variables["params"]
        stats = jax.tree.map(
            lambda a: jnp.asarray(np.abs(rng.normal(size=a.shape)) + 0.5, a.dtype),
            variables["batch_stats"],
        )
        # random scale incl. NEGATIVE channels (exercises the min branch)
        params = dict(params)
        params["bn_scale"] = jnp.asarray(rng.normal(size=(32,)), jnp.float32)

        if train:
            got, mut = block.apply(
                {"params": params, "batch_stats": stats}, x, True,
                mutable=["batch_stats"],
            )
        else:
            got = block.apply({"params": params, "batch_stats": stats}, x, False)
        want, mean, var = self._reference_block(params, stats, x, K_NEIGHBORS, train)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )
        if train:
            # running stats follow flax BN's momentum-0.9 update
            np.testing.assert_allclose(
                np.asarray(mut["batch_stats"]["bn_mean"]),
                np.asarray(0.9 * stats["bn_mean"] + 0.1 * mean),
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(mut["batch_stats"]["bn_var"]),
                np.asarray(0.9 * stats["bn_var"] + 0.1 * var),
                rtol=1e-4, atol=1e-5,
            )

    def test_block_gradients_match_reference(self):
        from sug_tpu.models.dgcnn import K_NEIGHBORS, _EdgeConvBlock

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 128, 8)), jnp.float32)
        block = _EdgeConvBlock(32)
        variables = block.init(jax.random.key(0), x, True)
        params = dict(variables["params"])
        params["bn_scale"] = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
        stats = variables["batch_stats"]

        def loss_block(params):
            y, _ = block.apply(
                {"params": params, "batch_stats": stats}, x, True,
                mutable=["batch_stats"],
            )
            return jnp.sum(jnp.tanh(y))

        def loss_ref(params):
            y, _, _ = self._reference_block(params, stats, x, K_NEIGHBORS, True)
            return jnp.sum(jnp.tanh(y))

        gb = jax.grad(loss_block)(params)
        gr = jax.grad(loss_ref)(params)
        for path in (("conv_dense", "kernel"), ("bn_scale",), ("bn_bias",)):
            a, b = gb, gr
            for p in path:
                a, b = a[p], b[p]
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4,
                err_msg="/".join(path),
            )


class TestFusedCross:
    """fused_cross_edgeconv_reduce (query set != key set) in interpret mode
    vs the plain-XLA reference: kNN sets, reductions, and gradients."""

    def _reference(self, q, kv, u, v, k):
        from sug_tpu.ops.geometry import index_points, square_distance

        d = square_distance(q, kv)
        _, idx = jax.lax.top_k(-d, k)
        a = index_points(u, idx) + v[:, :, None, :]
        return jnp.max(a, 2), jnp.min(a, 2), jnp.sum(a, 2), jnp.sum(a * a, 2), idx

    def test_cross_matches_reference(self, rng):
        from sug_tpu.ops.edgeconv_pallas import fused_cross_edgeconv_reduce

        B, S, N, F, k = 2, 64, 128, 64, 16  # S < TILE: exercises row padding
        q = jnp.asarray(rng.normal(size=(B, S, 3)), jnp.float32)
        kv = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        u = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, F)), jnp.float32)
        got = fused_cross_edgeconv_reduce(q, kv, u, v, k, interpret=True)
        want = self._reference(q, kv, u, v, k)
        np.testing.assert_array_equal(
            np.sort(np.asarray(got[4]), -1), np.sort(np.asarray(want[4]), -1)
        )
        for g, w in zip(got[:4], want[:4]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5)

    def test_cross_gradients_match_reference(self, rng):
        from sug_tpu.ops.edgeconv_pallas import fused_cross_edgeconv_reduce

        B, S, N, F, k = 1, 32, 128, 8, 4
        q = jnp.asarray(rng.normal(size=(B, S, 3)), jnp.float32)
        kv = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        u = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, F)), jnp.float32)

        def loss_fused(u, v):
            amax, amin, s1, s2, _ = fused_cross_edgeconv_reduce(
                q, kv, u, v, k, interpret=True
            )
            return jnp.sum(amax * amin) + jnp.sum(s1 * 0.5) + jnp.sum(s2 * 0.1)

        def loss_ref(u, v):
            amax, amin, s1, s2, _ = self._reference(q, kv, u, v, k)
            return jnp.sum(amax * amin) + jnp.sum(s1 * 0.5) + jnp.sum(s2 * 0.1)

        gu_f, gv_f = jax.grad(loss_fused, argnums=(0, 1))(u, v)
        gu_r, gv_r = jax.grad(loss_ref, argnums=(0, 1))(u, v)
        np.testing.assert_allclose(np.asarray(gu_f), np.asarray(gu_r), atol=3e-5)
        np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_r), atol=3e-5)

    def test_values_bf16_same_neighbors_close_values(self, rng):
        """PRECISION bf16 kernel mode: neighbor sets must be IDENTICAL to the
        f32 kernel (selection path untouched); values within bf16 rounding."""
        from sug_tpu.ops.edgeconv_pallas import fused_cross_edgeconv_reduce

        B, S, N, F, k = 2, 64, 128, 64, 8
        q = jnp.asarray(rng.normal(size=(B, S, 3)), jnp.float32)
        kv = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        u = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, F)), jnp.float32)
        f32 = fused_cross_edgeconv_reduce(q, kv, u, v, k, interpret=True)
        b16 = fused_cross_edgeconv_reduce(
            q, kv, u, v, k, interpret=True, values_bf16=True
        )
        np.testing.assert_array_equal(np.asarray(f32[4]), np.asarray(b16[4]))
        for a, b in zip(f32[:4], b16[:4]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=0.03, rtol=0.02
            )

    def test_values_bf16_gradients_finite_and_close(self, rng):
        from sug_tpu.ops.edgeconv_pallas import fused_cross_edgeconv_reduce

        B, S, N, F, k = 1, 32, 128, 8, 4
        q = jnp.asarray(rng.normal(size=(B, S, 3)), jnp.float32)
        kv = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        u = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, F)), jnp.float32)

        def loss(u, v, vb):
            amax, _, s1, _, _ = fused_cross_edgeconv_reduce(
                q, kv, u, v, k, interpret=True, values_bf16=vb
            )
            return jnp.sum(amax) + 0.1 * jnp.sum(s1)

        gu32, gv32 = jax.grad(loss, argnums=(0, 1))(u, v, False)
        gu16, gv16 = jax.grad(loss, argnums=(0, 1))(u, v, True)
        assert np.isfinite(np.asarray(gu16)).all()
        # bf16-rounded values may flip a near-tied max between two nearly
        # equal neighbors, rerouting that cotangent — allow a small fraction
        # of such flips; everything else must match to bf16 tolerance
        diff = np.abs(np.asarray(gu16) - np.asarray(gu32))
        assert (diff > 0.05).mean() < 0.01, f"{(diff > 0.05).mean():.3%} flipped"
        # dv sums da over k — max-routing flips cancel there
        np.testing.assert_allclose(np.asarray(gv16), np.asarray(gv32), atol=0.05)
