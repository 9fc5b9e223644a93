"""Point Transformer (Hengshuang) backbone.

Reference: model/Ptran_transformer.py:9-46 (vector self-attention over
kNN-16), model/Ptran_model.py (Backbone/PointTransformerCls), PTran_utils
SA-with-kNN TransitionDown, and the DG generator PTran_g
(model/Model.py:295-347).

Vector attention: per-neighbor, per-CHANNEL attention logits
``gamma(q - k + pos)`` softmaxed over the neighbor axis, aggregated against
``v + pos`` — all Dense ops over channels-last tensors (MXU-friendly), the
softmax/gather tail fused by XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sug_tpu.models.layers import ConvBN
from sug_tpu.ops.geometry import (
    farthest_point_sample,
    index_points,
    knn_indices,
    square_distance,
)


class _DenseParams(nn.Module):
    """Declares exactly the params an nn.Dense would (same names, shapes,
    inits -> identical param tree and identical init values), but returns
    the raw (kernel, bias) for the fused vector-attention kernel, which
    consumes weights directly (the per-edge MLPs run inside the kernel)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        from flax.linen.linear import default_kernel_init

        kernel = self.param(
            "kernel", default_kernel_init, (self.in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _vecattn_mode(n: int, d_model: int):
    """('fused' | 'interpret' | 'xla', precise) for a given attention level.

    SUG_FUSED_VECATTN: 1 force-fused, 0 force-XLA, interpret = fused kernel
    in interpret mode (CPU tests), auto (default) = fused on TPU whenever
    the level's shapes tile. Under the bf16 policy the kernel runs its
    single-pass-bf16 mode (the policy's Dense precision); under f32 it runs
    the f32-faithful mode (exact hi/lo key/val gathers + f32 accumulation;
    the MLP matmuls already match XLA's DEFAULT f32 dot, which single-passes
    bf16 on TPU — tools/precision_probe.py)."""
    import os

    from sug_tpu.models.precision import compute_dtype

    precise = compute_dtype() != jnp.bfloat16
    mode = os.environ.get("SUG_FUSED_VECATTN", "auto")
    shapes_ok = n % 128 == 0 and d_model % 128 == 0
    if mode == "0":
        return "xla", precise
    if mode == "interpret":
        return ("interpret" if shapes_ok else "xla"), precise
    if mode == "1":
        return ("fused" if shapes_ok else "xla"), precise
    # auto + f32: the "matches the XLA f32 path" contract holds because
    # XLA's DEFAULT f32 dot is single-pass bf16 on this TPU (measured,
    # tools/precision_probe.py) — if the session raised
    # jax_default_matmul_precision, the XLA reference path upgrades while
    # the fused kernel would not, so fall back to XLA rather than silently
    # diverge. (SUG_FUSED_VECATTN=1 + SUG_VECATTN_F32_MM=3pass force-fuses
    # with ~f32 matmuls if wanted.)
    if precise:
        dmp = jax.config.jax_default_matmul_precision
        if dmp is not None and str(dmp).lower() not in ("default", "bfloat16"):
            return "xla", precise
    return (
        "fused"
        if shapes_ok and jax.default_backend() == "tpu"
        else "xla"
    ), precise


class VectorAttentionBlock(nn.Module):
    """TransformerBlock (model/Ptran_transformer.py:9-46): d_points <->
    d_model projections around vector attention with relative-position
    encodings.

    On TPU under the bf16 policy the whole attention body (kNN, neighbor
    gathers, both per-edge MLPs, per-channel softmax, weighted sum) runs in
    one fused Pallas kernel (ops/vector_attention_pallas.py) that never
    materializes the (B, N, k, d_model) edge tensors; elsewhere the XLA
    formulation below is used. Param trees are identical in both modes."""

    d_points: int
    d_model: int = 512
    k: int = 16

    @nn.compact
    def __call__(self, xyz: jax.Array, features: jax.Array) -> jax.Array:
        from sug_tpu.models.precision import compute_dtype

        dt = compute_dtype()
        pre = features
        x = nn.Dense(self.d_model, name="fc1", dtype=dt)(features)
        q = nn.Dense(self.d_model, use_bias=False, name="w_qs", dtype=dt)(x)
        key_full = nn.Dense(self.d_model, use_bias=False, name="w_ks", dtype=dt)(x)
        val_full = nn.Dense(self.d_model, use_bias=False, name="w_vs", dtype=dt)(x)

        mode, precise = _vecattn_mode(xyz.shape[1], self.d_model)
        if mode in ("fused", "interpret"):
            from sug_tpu.ops.vector_attention_pallas import fused_vector_attention

            C = xyz.shape[-1]
            wd1, bd1 = _DenseParams(self.d_model, C, name="fc_delta1")()
            wd2, bd2 = _DenseParams(self.d_model, self.d_model, name="fc_delta2")()
            wg1, bg1 = _DenseParams(self.d_model, self.d_model, name="fc_gamma1")()
            wg2, bg2 = _DenseParams(self.d_model, self.d_model, name="fc_gamma2")()
            res = fused_vector_attention(
                xyz, q, key_full, val_full, wd1, bd1, wd2, bd2, wg1, bg1,
                wg2, bg2, min(self.k, xyz.shape[1]),
                interpret=(mode == "interpret"), precise=precise,
            )
            return nn.Dense(self.d_points, name="fc2")(res) + pre

        # neighbor selection on raw f32 xyz — unaffected by the bf16 policy
        knn_idx = knn_indices(xyz, min(self.k, xyz.shape[1]))  # (B, N, k)
        knn_xyz = index_points(xyz, knn_idx)  # (B, N, k, 3)

        k = index_points(key_full, knn_idx)
        v = index_points(val_full, knn_idx)

        delta = xyz[:, :, None, :] - knn_xyz  # (B, N, k, 3)
        if dt is not None:
            delta = delta.astype(dt)
        # the two per-edge (B, N, k, d_model) MLP chains below are where
        # PTran's FLOPs live (~2/3 of the step at N=1024) — exactly what the
        # bf16 MXU path accelerates
        pos = nn.Dense(self.d_model, name="fc_delta1", dtype=dt)(delta)
        pos = nn.Dense(self.d_model, name="fc_delta2", dtype=dt)(nn.relu(pos))

        attn = q[:, :, None, :] - k + pos
        attn = nn.Dense(self.d_model, name="fc_gamma1", dtype=dt)(attn)
        attn = nn.Dense(self.d_model, name="fc_gamma2", dtype=dt)(nn.relu(attn))
        # softmax in f32: bf16's 8-bit mantissa visibly skews the per-channel
        # neighbor weighting
        attn = jax.nn.softmax(
            attn.astype(jnp.float32) / jnp.sqrt(float(self.d_model)), axis=-2
        )

        res = jnp.einsum(
            "bnkf,bnkf->bnf", attn, (v + pos).astype(jnp.float32)
        )
        return nn.Dense(self.d_points, name="fc2")(res) + pre


class TransitionDown(nn.Module):
    """FPS to ``npoint`` + kNN grouping + shared MLP + neighborhood max
    (PTran_utils SA with knn=True; model/Ptran_model.py:9-15)."""

    npoint: int
    nneighbor: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        feats: jax.Array,
        train: bool,
        fps_start: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        fps_idx = farthest_point_sample(xyz, self.npoint, fps_start)
        new_xyz = index_points(xyz, fps_idx)
        dists = square_distance(new_xyz, xyz)
        _, idx = jax.lax.top_k(-dists, min(self.nneighbor, xyz.shape[1]))
        grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
        grouped = jnp.concatenate([grouped_xyz, index_points(feats, idx)], axis=-1)
        for i, width in enumerate(self.mlp):
            grouped = ConvBN(width, name=f"mlp{i}")(grouped, train)
        return new_xyz, jnp.max(grouped, axis=2)


class PointTransformerBackbone(nn.Module):
    """fc(3->32) -> transformer -> 4 x (TransitionDown /4 pts, ch x2 +
    transformer). Returns (final feats (B, N/256, 512), per-level list)."""

    nblocks: int = 4
    nneighbor: int = 16
    transformer_dim: int = 512

    @nn.compact
    def __call__(
        self,
        pc: jax.Array,
        train: bool,
        fps_start: Optional[jax.Array] = None,
    ):
        # Rematerialization policy for the attention blocks. Each block
        # materializes several (B, N, k, d_model) per-edge tensors; whether
        # to SAVE them for backward (fast, HBM-hungry) or RECOMPUTE them
        # (remat) depends on whether they fit. Measured at B=32+32 on v5e:
        # full-remat 467 ms f32 / 349 bf16, no-remat 352 f32 / 256 bf16 —
        # no-remat is ~35% faster whenever it fits. "auto" (default) picks
        # no-remat when the estimated saved-activation footprint stays under
        # ~11GB of the chip's 16GB HBM, else full remat; SUG_PTRAN_REMAT
        # in {none, dots, full} overrides.
        import os

        mode = os.environ.get("SUG_PTRAN_REMAT", "auto")
        if mode == "auto":
            from sug_tpu.models.precision import compute_dtype

            B, N = pc.shape[0], pc.shape[1]
            bytes_per = 2 if compute_dtype() is not None else 4
            # ~7 live (B, N_l, k, d_model) per-edge tensors per attention
            # level — but levels served by the fused Pallas kernel never
            # materialize them (the kernel saves only (B, N_l, D) rows), so
            # only XLA-path levels count toward the footprint.
            n_unfused = sum(
                nl
                for nl in (max(N // 4**i, 1) for i in range(self.nblocks + 1))
                if _vecattn_mode(nl, self.transformer_dim)[0] == "xla"
            )
            est = 7 * B * n_unfused * self.nneighbor * self.transformer_dim * bytes_per
            mode = "none" if est < 11e9 else "full"
        if mode == "none":
            AttnBlock = VectorAttentionBlock
        elif mode == "dots":
            AttnBlock = nn.remat(
                VectorAttentionBlock,
                policy=jax.checkpoint_policies.dots_saveable,
            )
        else:
            AttnBlock = nn.remat(VectorAttentionBlock)
        N = pc.shape[1]
        xyz = pc
        x = nn.Dense(32, name="fc1a")(pc)
        x = nn.Dense(32, name="fc1b")(nn.relu(x))
        points = AttnBlock(32, self.transformer_dim, self.nneighbor,
                           name="transformer1")(xyz, x)
        levels = [(xyz, points)]
        for i in range(self.nblocks):
            channel = 32 * 2 ** (i + 1)
            xyz, points = TransitionDown(
                max(N // 4 ** (i + 1), 1), self.nneighbor, (channel, channel),
                name=f"td{i}",
            )(xyz, points, train, fps_start if i == 0 else None)
            points = AttnBlock(
                channel, self.transformer_dim, self.nneighbor, name=f"transformer{i + 2}"
            )(xyz, points)
            levels.append((xyz, points))
        return points, levels


class PointTransformerGenerator(nn.Module):
    """DG generator (model/Model.py:295-347): global = mean over the final
    4 points (512-d); node features from level 2 ((B, 64, 128)) reduced to
    (B, 64, 64) by the reference's stride-2 point-mixing Conv1d — that torch
    Conv1d treats the 64 POINTS as channels and strides over the 128 feature
    dims (model/Model.py:314,331), reproduced here as a feature-stride + a
    Dense over the point axis."""

    @nn.compact
    def __call__(
        self,
        pc: jax.Array,
        train: bool,
        fps_start: Optional[jax.Array] = None,
    ):
        points, levels = PointTransformerBackbone(name="backbone")(pc, train, fps_start)
        node_128 = levels[2][1]  # (B, N/16, 128) -> (B, 64, 128) at N=1024
        strided = node_128[:, :, ::2]  # (B, 64, 64): stride 2 over features
        mixed = jnp.swapaxes(strided, 1, 2)  # (B, 64feat, 64pts)
        node_fea = nn.Dense(64, name="point_mix")(mixed)  # Dense over points
        global_feat = jnp.mean(points, axis=1)  # (B, 512)
        return global_feat, node_fea, None


class PointTransformerClassifier(nn.Module):
    """Standalone classifier (model/Ptran_model.py:94-117): backbone ->
    mean-pool -> 256 -> 64 -> num_class; mid feature = the 256-d activation."""

    num_class: int = 10

    @nn.compact
    def __call__(self, pc: jax.Array, train: bool):
        points, _ = PointTransformerBackbone(name="backbone")(pc, train)
        x = jnp.mean(points, axis=1)
        x = nn.Dense(256, name="fc2a")(x)
        mid_feature = x
        x = nn.relu(x)
        x = nn.relu(nn.Dense(64, name="fc2b")(x))
        logits = nn.Dense(self.num_class, name="fc2c")(x)
        return logits, mid_feature
