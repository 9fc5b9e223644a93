"""Fused vector-attention kernel (sug_tpu/ops/vector_attention_pallas.py):
interpret-mode correctness vs the pure-XLA reference of the PTran
TransformerBlock math (reference model/Ptran_transformer.py:9-46)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sug_tpu.ops.vector_attention_pallas import (
    _fwd_pallas,
    fused_vector_attention,
    vector_attention_reference,
)


def _data(b=2, n=128, c=3, d=128, seed=0):
    rng = np.random.default_rng(seed)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)  # noqa: E731
    xyz = f32(b, n, c)
    q, key, val = f32(b, n, d), f32(b, n, d), f32(b, n, d)
    # MLP weights scaled like lecun-normal inits
    wd1 = f32(c, d) / np.sqrt(c)
    wd2 = f32(d, d) / np.sqrt(d)
    wg1 = f32(d, d) / np.sqrt(d)
    wg2 = f32(d, d) / np.sqrt(d)
    bd1, bd2, bg1, bg2 = f32(d) * 0.1, f32(d) * 0.1, f32(d) * 0.1, f32(d) * 0.1
    return xyz, q, key, val, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2


def _rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


class TestFusedVectorAttentionInterpret:
    @pytest.mark.parametrize("n,k", [(128, 5), (256, 16)])
    def test_forward(self, n, k):
        args = _data(n=n, seed=n + k)
        ref = vector_attention_reference(*args, k, bf16_mm=True)
        got = fused_vector_attention(*args, k, interpret=True)
        assert got.shape == ref.shape == args[1].shape
        # identical bf16 matmul precision on both sides; only the online
        # softmax and the hi/lo xyz gather (~2^-17) differ
        assert _rel_l2(got, ref) < 2e-3
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
        )

    def test_neighbor_sets_match_topk(self):
        from sug_tpu.ops.geometry import knn_indices

        args = _data(n=256, seed=7)
        xyz = args[0]
        k = 16
        xyzp = jnp.pad(xyz, ((0, 0), (0, 0), (0, 125)))
        wd1 = jnp.pad(args[4], ((0, 125), (0, 0)))
        bias = jnp.pad(jnp.stack([args[5], args[7], args[9], args[11]]),
                       ((0, 4), (0, 0)))
        _, _, _, idx_t = _fwd_pallas(
            xyzp, args[1], args[2], args[3], wd1, args[6], args[8], args[10],
            bias, k, interpret=True,
        )
        idx = np.swapaxes(np.asarray(idx_t), 1, 2)  # (B, N, k)
        ref = np.asarray(knn_indices(xyz, k))
        # the kernel's distance path is a 3-pass bf16 split (~2^-16 rel);
        # slots may flip ONLY between neighbors that are numerically tied at
        # the k-th-neighbor boundary — assert every disagreement is such a
        # near-tie, and that they are rare
        pts = np.asarray(xyz, np.float64)
        n_flip = 0
        for b in range(idx.shape[0]):
            d2 = ((pts[b][:, None, :] - pts[b][None, :, :]) ** 2).sum(-1)
            for n in range(idx.shape[1]):
                a, r = set(idx[b, n].tolist()), set(ref[b, n].tolist())
                if a == r:
                    continue
                n_flip += len(a - r)
                kth = np.sort(d2[n])[k - 1]
                for j in (a ^ r):
                    assert abs(d2[n, j] - kth) < 1e-4 + 1e-4 * kth, (
                        f"non-tie neighbor flip at ({b},{n},{j})"
                    )
        assert n_flip <= idx.size * 0.005, f"{n_flip} flips in {idx.size} slots"

    def test_gradients(self):
        args = _data(n=128, seed=3)
        k = 8
        cot = jnp.asarray(
            np.random.default_rng(9).normal(size=args[1].shape), jnp.float32
        )

        def loss(fn):
            def inner(*diff_args):
                out = fn(args[0], *diff_args, k)
                return jnp.sum(out * cot)

            return inner

        diff = args[1:]
        gf = jax.grad(
            loss(lambda *a: fused_vector_attention(*a, interpret=True)),
            argnums=tuple(range(len(diff))),
        )(*diff)
        gr = jax.grad(
            loss(lambda *a: vector_attention_reference(*a, bf16_mm=True)),
            argnums=tuple(range(len(diff))),
        )(*diff)
        g32 = jax.grad(
            loss(lambda *a: vector_attention_reference(*a, bf16_mm=False)),
            argnums=tuple(range(len(diff))),
        )(*diff)
        names = ("dq", "dkey", "dval", "dwd1", "dbd1", "dwd2", "dbd2",
                 "dwg1", "dbg1", "dwg2", "dbg2")
        scale = max(float(jnp.linalg.norm(g)) for g in g32)
        for name, a, b, c in zip(names, gf, gr, g32):
            if name == "dbg2":
                # softmax is invariant to a per-channel constant logit
                # shift, so the TRUE dbg2 is zero — every implementation
                # returns cancellation noise; assert it is noise-sized
                assert float(jnp.linalg.norm(a)) < 1e-3 * scale, name
                continue
            # the kernel's deviation from the bf16-matmul reference must be
            # within the bf16 policy's own noise floor: bounded by the
            # bf16-vs-f32 reference disagreement (ReLU-mask flips near zero
            # dominate both), not structurally larger
            noise = _rel_l2(b, c)
            err = _rel_l2(a, b)
            assert err < 2.0 * noise + 5e-3, (
                f"{name}: fused-vs-bf16ref {err:.4f}, noise floor {noise:.4f}"
            )

    def test_xyz_zero_cotangent(self):
        args = _data(n=128, seed=5)
        k = 4

        def f(xyz):
            return jnp.sum(fused_vector_attention(xyz, *args[1:], k, interpret=True))

        g = jax.grad(f)(args[0])
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_duplicate_points_tie_break(self):
        rng = np.random.default_rng(2)
        xyz = rng.normal(size=(1, 128, 3)).astype(np.float32)
        xyz[0, 64] = xyz[0, 0]
        xyz[0, 65] = xyz[0, 0]
        args = (jnp.asarray(xyz),) + _data(b=1, n=128, seed=11)[1:]
        ref = vector_attention_reference(*args, 4, bf16_mm=True)
        got = fused_vector_attention(*args, 4, interpret=True)
        assert _rel_l2(got, ref) < 2e-3


class TestFusedVectorAttentionPrecise:
    """f32-faithful mode: exact hi/lo key/val gathers + f32 accumulation.

    With SUG_VECATTN_F32_MM=3pass the MLP matmuls are ~f32 too, so the
    kernel must track the PURE-f32 reference tightly; in the default 1-pass
    mode it matches at the bf16-matmul noise floor (that mode's contract is
    'same semantics as XLA's DEFAULT f32 dot on TPU', which single-passes
    bf16 — tools/precision_probe.py)."""

    def test_forward_precise_3pass(self, monkeypatch):
        monkeypatch.setenv("SUG_VECATTN_F32_MM", "3pass")
        args = _data(n=128, seed=21)
        ref = vector_attention_reference(*args, 8, bf16_mm=False)
        got = fused_vector_attention(*args, 8, interpret=True, precise=True)
        assert _rel_l2(got, ref) < 5e-5

    def test_forward_precise_1pass(self):
        args = _data(n=128, seed=22)
        ref = vector_attention_reference(*args, 8, bf16_mm=False)
        got = fused_vector_attention(*args, 8, interpret=True, precise=True)
        # 1-pass MLP matmuls: bf16-level deviation from the pure-f32 math,
        # but NO bf16 truncation of key/val (the bf16 mode's extra error)
        bf16_mode = fused_vector_attention(*args, 8, interpret=True)
        assert _rel_l2(got, ref) < 3e-3
        assert _rel_l2(got, ref) <= _rel_l2(bf16_mode, ref)

    def test_gradients_precise_3pass(self, monkeypatch):
        monkeypatch.setenv("SUG_VECATTN_F32_MM", "3pass")
        args = _data(n=128, seed=23)
        k = 8
        cot = jnp.asarray(
            np.random.default_rng(13).normal(size=args[1].shape), jnp.float32
        )

        def loss(fn):
            def inner(*diff_args):
                out = fn(args[0], *diff_args, k)
                return jnp.sum(out * cot)

            return inner

        diff = args[1:]
        gf = jax.grad(
            loss(lambda *a: fused_vector_attention(
                *a, interpret=True, precise=True)),
            argnums=tuple(range(len(diff))),
        )(*diff)
        g32 = jax.grad(
            loss(lambda *a: vector_attention_reference(*a, bf16_mm=False)),
            argnums=tuple(range(len(diff))),
        )(*diff)
        names = ("dq", "dkey", "dval", "dwd1", "dbd1", "dwd2", "dbd2",
                 "dwg1", "dbg1", "dwg2", "dbg2")
        scale = max(float(jnp.linalg.norm(g)) for g in g32)
        for name, a, c in zip(names, gf, g32):
            if name == "dbg2":
                assert float(jnp.linalg.norm(a)) < 1e-3 * scale, name
                continue
            assert _rel_l2(a, c) < 2e-3, f"{name}: {_rel_l2(a, c):.5f}"


class TestBlockEquivalence:
    """VectorAttentionBlock fused path == its XLA path, same params."""

    def test_fused_vs_unfused_block(self, monkeypatch):
        from sug_tpu.models.ptran import VectorAttentionBlock

        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(2, 128, 32)), jnp.float32)
        blk = VectorAttentionBlock(32, 128, 8)

        monkeypatch.setenv("SUG_FUSED_VECATTN", "0")
        params = blk.init(jax.random.PRNGKey(0), xyz, feats)
        ref = blk.apply(params, xyz, feats)

        monkeypatch.setenv("SUG_FUSED_VECATTN", "interpret")
        params_f = blk.init(jax.random.PRNGKey(0), xyz, feats)
        assert jax.tree_util.tree_structure(params_f) == jax.tree_util.tree_structure(params)
        got = blk.apply(params, xyz, feats)

        # f32 XLA path vs bf16-matmul kernel: policy-level tolerance
        assert _rel_l2(got, ref) < 2e-2
