"""DGCNN backbone: EdgeConv stack with the SA-node module spliced in.

Reference: DG generator ``DGCNN`` (model/Model.py:54-121) and standalone
classifier ``DGCNN`` (model/model_pointnet.py:93-161).

Each EdgeConv = kNN-20 graph feature (concat(nbr - x, x)) -> Dense+BN+
leakyrelu -> max over neighbors. The 4 block outputs (64, 64, 128, 256) are
concatenated, projected to 512, then global max+avg pooled into a 1024-d
descriptor. The DG variant inserts the SA-node module after block 2 with a
1024-point interpolation and a Dense(128->64) re-projection
(model/Model.py:100-101).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sug_tpu.models.adapt_node import SelfAdaptiveNodeModule
from sug_tpu.models.heads import ClassifierHead
from sug_tpu.models.bn import batch_norm
from sug_tpu.models.layers import ConvBN
from sug_tpu.ops.geometry import get_graph_feature

K_NEIGHBORS = 20


class _EdgeConvBlock(nn.Module):
    """One EdgeConv block: kNN graph feature -> Dense+BN+leakyrelu -> max over k.

    Computation is the fused formulation (sug_tpu/ops/edgeconv_pallas.py):
    with the Dense kernel split into neighbor/center halves W1/W2, the edge
    activation is ``a_k = u[nbr_k] + v`` where ``u = x @ W1`` and
    ``v = x @ (W2 - W1)``; the kernel returns per-(b,n,f) max/min/sum/sumsq
    over k, and because BN's per-channel affine and leaky_relu are monotone,
    ``max_k lrelu(BN(a))`` equals ``lrelu(BN(max_k a))`` when the BN scale is
    >= 0 and ``lrelu(BN(min_k a))`` otherwise. The (B, N, k, 2C) edge tensor
    of the reference (model/model_utils.py:187-209) is never materialized.
    On TPU the reductions run in one Pallas kernel (kNN included); elsewhere
    (or with SUG_FUSED_EDGECONV=0) an equivalent XLA path is used.
    """

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        import os

        from sug_tpu.ops.edgeconv_pallas import (
            TILE,
            edgeconv_reduce_reference,
            fused_edgeconv_reduce,
        )

        B, N, C = x.shape
        F = self.features
        dense = nn.Dense(F, use_bias=False, name="conv_dense")
        u = dense(jnp.concatenate([x, jnp.zeros_like(x)], -1))  # x @ W1
        v = dense(jnp.concatenate([-x, x], -1))  # x @ (W2 - W1)

        use_fused = (
            jax.default_backend() == "tpu"
            and os.environ.get("SUG_FUSED_EDGECONV", "1") == "1"
            and N % TILE == 0
        )
        if use_fused:
            from sug_tpu.models.precision import compute_dtype

            # PRECISION bf16: single-pass bf16 VALUE gathers inside the
            # kernel (neighbor selection stays f32 — docs/PERF.md)
            amax, amin, s1, s2, _ = fused_edgeconv_reduce(
                x, u.astype(jnp.float32), v.astype(jnp.float32), K_NEIGHBORS,
                values_bf16=compute_dtype() == jnp.bfloat16,
            )
        else:
            amax, amin, s1, s2, _ = edgeconv_reduce_reference(x, u, v, K_NEIGHBORS)

        # BatchNorm with flax semantics (momentum 0.9, eps 1e-5, biased var)
        # computed from the kernel's sums — gradients through mean/var reach
        # every edge via the kernel's ds1/ds2 cotangents.
        scale = self.param("bn_scale", nn.initializers.ones, (F,))
        bias = self.param("bn_bias", nn.initializers.zeros, (F,))
        ra_mean = self.variable(
            "batch_stats", "bn_mean", lambda: jnp.zeros((F,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "bn_var", lambda: jnp.ones((F,), jnp.float32)
        )
        from sug_tpu.models.bn import bn_groups

        g = bn_groups() if train else 1
        if train:
            # per-replica BN (BN_SEMANTICS: per_replica): statistics over
            # each of g contiguous batch groups — same math as the grouped
            # BatchNorm in models/bn.py, fed by the kernel's s1/s2 sums.
            if B % g != 0:
                raise ValueError(
                    f"batch {B} not divisible by {g} BN replica groups"
                )
            M = (B // g) * N * K_NEIGHBORS
            s1g = jnp.sum(s1.reshape(g, B // g, N, F), axis=(1, 2))  # (g, F)
            s2g = jnp.sum(s2.reshape(g, B // g, N, F), axis=(1, 2))
            mean = s1g / M
            var = jnp.maximum(s2g / M - mean * mean, 0.0)
            if not self.is_initializing():
                from sug_tpu.models.bn import bn_momentum_mode

                if bn_momentum_mode() == "sequential":
                    # stacked-forward regime: one momentum update per group
                    # in order — the sequential source-then-target stats
                    rm, rv = ra_mean.value, ra_var.value
                    for i in range(g):
                        rm = 0.9 * rm + 0.1 * jax.lax.stop_gradient(mean[i])
                        rv = 0.9 * rv + 0.1 * jax.lax.stop_gradient(var[i])
                    ra_mean.value, ra_var.value = rm, rv
                else:
                    ra_mean.value = 0.9 * ra_mean.value + 0.1 * jax.lax.stop_gradient(
                        jnp.mean(mean, axis=0)
                    )
                    ra_var.value = 0.9 * ra_var.value + 0.1 * jax.lax.stop_gradient(
                        jnp.mean(var, axis=0)
                    )
        else:
            mean, var = ra_mean.value[None], ra_var.value[None]  # (1, F)

        inv = scale * jax.lax.rsqrt(var + 1e-5)  # (g, F) signed slopes
        off = bias - mean * inv  # (g, F)
        if train and g > 1:
            # expand per-group rows to their batch rows: (g, F) -> (B, 1, F)
            rows = jnp.repeat(inv, B // g, axis=0)[:, None, :]
            off_rows = jnp.repeat(off, B // g, axis=0)[:, None, :]
        else:
            rows = inv.reshape(1, 1, F)
            off_rows = off.reshape(1, 1, F)
        sel = jnp.where(rows >= 0, amax, amin)
        y = sel * rows + off_rows
        return nn.leaky_relu(y, negative_slope=0.01)


class DGCNNGenerator(nn.Module):
    """DG generator. Returns (global_feat (B,1024), node_fea (B,64,64),
    node_offset)."""

    @nn.compact
    def __call__(
        self,
        pc: jax.Array,
        train: bool,
        fps_start: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        xyz = pc  # (B, N, 3)
        x1 = _EdgeConvBlock(64, name="block1")(pc, train)
        x2 = _EdgeConvBlock(64, name="block2")(x1, train)

        # SA-node module after block 2 (model/Model.py:100-101): upsampled
        # 128-ch features re-projected to 64 with a plain Dense (the
        # reference Conv1d has no BN/activation).
        x_up, node_fea, node_off = SelfAdaptiveNodeModule(name="sa_node")(
            x2, xyz, train, fps_start
        )
        x2 = nn.Dense(64, name="reproject")(x_up)

        x3 = _EdgeConvBlock(128, name="block3")(x2, train)
        x4 = _EdgeConvBlock(256, name="block4")(x3, train)

        x_cat = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # (B, N, 512)
        x5 = nn.Dense(512, use_bias=False, name="conv5")(x_cat)
        x5 = batch_norm(train, name="bn5")(x5)
        x5 = nn.leaky_relu(x5, negative_slope=0.2)
        gmax = jnp.max(x5, axis=1)
        gavg = jnp.mean(x5, axis=1)
        return jnp.concatenate([gmax, gavg], axis=-1), node_fea, node_off


class DGCNNClassifier(nn.Module):
    """Standalone DGCNN classifier (no SA-node module,
    model/model_pointnet.py:93-161): 4 EdgeConvs -> 512 proj -> max+avg pool
    -> PointNet head with dgcnn activations."""

    num_class: int = 10

    @nn.compact
    def __call__(self, pc: jax.Array, train: bool) -> Tuple[jax.Array, jax.Array]:
        x1 = _EdgeConvBlock(64, name="block1")(pc, train)
        x2 = _EdgeConvBlock(64, name="block2")(x1, train)
        x3 = _EdgeConvBlock(128, name="block3")(x2, train)
        x4 = _EdgeConvBlock(256, name="block4")(x3, train)
        x_cat = jnp.concatenate([x1, x2, x3, x4], axis=-1)
        x5 = nn.Dense(512, use_bias=False, name="conv5")(x_cat)
        x5 = batch_norm(train, name="bn5")(x5)
        x5 = nn.leaky_relu(x5, negative_slope=0.2)
        gmax = jnp.max(x5, axis=1)
        gavg = jnp.mean(x5, axis=1)
        x = jnp.concatenate([gmax, gavg], axis=-1)
        logits, mid = ClassifierHead(self.num_class, dgcnn=True, name="classifier")(
            x, train
        )
        return logits, mid
