"""PointNet++ backbone: SSG set-abstraction stack + MSG/FP variants.

Reference: ``PointNetSetAbstraction`` (model/pointnet2_utils.py:158-207),
``Pointnet2_g`` (model/Model.py:123-161), ``Pointnet2_cls``
(model/model_pointnet.py:58-90), and the MSG/feature-propagation modules
backing the (unreachable in the reference) ``Ponintnet2MSG_g``
(model/Model.py:172-232, model/pointnet2/pointnet2_modules.py).

The reference's CUDA extension (ball_query/group/gather/FPS/three_nn
kernels, model/pointnet2/src/) is replaced by the XLA ops in sug_tpu.ops —
same semantics, fixed shapes, fully fused by the compiler.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn

from sug_tpu.models.bn import batch_norm
import jax
import jax.numpy as jnp

from sug_tpu.models.layers import ConvBN, maxpool1d_strided
from sug_tpu.ops.geometry import (
    index_points,
    query_ball_point,
    sample_and_group,
    sample_and_group_all,
    three_nn_interpolate,
)


class SetAbstraction(nn.Module):
    """Single-scale grouping SA layer.

    (xyz (B,N,3), feats (B,N,D)) -> (new_xyz (B,S,3), new_feats (B,S,mlp[-1])).
    ``adapt`` captures the activation after the second MLP layer, max-pooled
    over the neighborhood — the reference's node-feature tap
    (model/pointnet2_utils.py:196-207).
    """

    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    group_all: bool = False

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        feats: Optional[jax.Array],
        train: bool,
        adapt: bool = False,
        fps_start: Optional[jax.Array] = None,
    ):
        if self.group_all:
            new_xyz, new_feats = sample_and_group_all(xyz, feats)
        else:
            new_xyz, new_feats = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, feats, fps_start
            )
        node_fea = None
        for i, width in enumerate(self.mlp):
            new_feats = ConvBN(width, name=f"mlp{i}")(new_feats, train)
            if adapt and i == 1:
                node_fea = jnp.max(new_feats, axis=2)  # (B, S, width)
        new_feats = jnp.max(new_feats, axis=2)  # max over neighborhood
        if adapt:
            return new_xyz, new_feats, node_fea
        return new_xyz, new_feats


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping SA layer (model/pointnet2_utils.py MSG variant /
    the CUDA PointnetSAModuleMSG): one FPS, several (radius, nsample, mlp)
    branches concatenated on the channel axis."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        feats: Optional[jax.Array],
        train: bool,
        fps_start: Optional[jax.Array] = None,
    ):
        from sug_tpu.ops.geometry import farthest_point_sample

        fps_idx = farthest_point_sample(xyz, self.npoint, fps_start)
        new_xyz = index_points(xyz, fps_idx)
        outs = []
        for b, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            group_idx = query_ball_point(radius, nsample, xyz, new_xyz)
            grouped_xyz = index_points(xyz, group_idx) - new_xyz[:, :, None, :]
            if feats is not None:
                grouped = jnp.concatenate(
                    [grouped_xyz, index_points(feats, group_idx)], axis=-1
                )
            else:
                grouped = grouped_xyz
            for i, width in enumerate(mlp):
                grouped = ConvBN(width, name=f"branch{b}_mlp{i}")(grouped, train)
            outs.append(jnp.max(grouped, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """FP upsampling layer (model/pointnet2_utils.py:270-320 / CUDA
    three_interpolate): 3-NN inverse-distance interpolate coarse features to
    dense positions, concat skip features, shared MLP."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self,
        xyz_dense: jax.Array,
        xyz_coarse: jax.Array,
        feats_dense: Optional[jax.Array],
        feats_coarse: jax.Array,
        train: bool,
    ) -> jax.Array:
        if xyz_coarse.shape[1] == 1:
            interpolated = jnp.broadcast_to(
                feats_coarse,
                (feats_coarse.shape[0], xyz_dense.shape[1], feats_coarse.shape[-1]),
            )
        else:
            interpolated = three_nn_interpolate(xyz_dense, xyz_coarse, feats_coarse)
        if feats_dense is not None:
            x = jnp.concatenate([feats_dense, interpolated], axis=-1)
        else:
            x = interpolated
        for i, width in enumerate(self.mlp):
            x = ConvBN(width, name=f"mlp{i}")(x, train)
        return x


class PointNet2Generator(nn.Module):
    """SSG generator for the DG model (model/Model.py:123-161):
    SA(512, r0.2, 32, [64,64,128]) with node tap -> SA(128, r0.4, 64,
    [128,128,256]) -> SA(group_all, [256,512,1024]). Node features: the
    (B, 512, 64) tap strided-max-pooled (k=3, s=8) to (B, 64, 64)."""

    @nn.compact
    def __call__(
        self,
        pc: jax.Array,
        train: bool,
        fps_start: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
        B = pc.shape[0]
        l1_xyz, l1_feats, node_tap = SetAbstraction(
            512, 0.2, 32, (64, 64, 128), name="sa1"
        )(pc, None, train, adapt=True, fps_start=fps_start)
        l2_xyz, l2_feats = SetAbstraction(128, 0.4, 64, (128, 128, 256), name="sa2")(
            l1_xyz, l1_feats, train
        )
        _, l3_feats = SetAbstraction(
            None, None, None, (256, 512, 1024), group_all=True, name="sa3"
        )(l2_xyz, l2_feats, train)
        global_feat = l3_feats.reshape(B, 1024)
        node_fea = maxpool1d_strided(node_tap, kernel=3, stride=8)  # (B, 64, 64)
        return global_feat, node_fea, None


class PointNet2MSGSegmenter(nn.Module):
    """MSG encoder + FP decoder emitting per-point features — the
    reference's ``Ponintnet2MSG_g`` [sic] (model/Model.py:172-232; unreachable
    from Net_MDA there, provided for API completeness). Returns (B, N, 256)
    per-point features."""

    @nn.compact
    def __call__(self, pc: jax.Array, train: bool) -> jax.Array:
        xyz0 = pc
        l1_xyz, l1_f = SetAbstractionMSG(512, (0.2,), (32,), ((64, 64, 128),), name="sa1")(
            xyz0, None, train
        )
        l2_xyz, l2_f = SetAbstractionMSG(
            128, (0.4,), (64,), ((128, 128, 256),), name="sa2"
        )(l1_xyz, l1_f, train)
        _, l3_f = SetAbstraction(
            None, None, None, (256, 512, 1024), group_all=True, name="sa3"
        )(l2_xyz, l2_f, train)
        l3_xyz = jnp.zeros((pc.shape[0], 1, 3), dtype=pc.dtype)
        d2 = FeaturePropagation((1024, 1024), name="fp2")(
            l2_xyz, l3_xyz, l2_f, l3_f, train
        )
        d1 = FeaturePropagation((1024, 1024), name="fp1")(
            l1_xyz, l2_xyz, l1_f, d2, train
        )
        d0 = FeaturePropagation((256, 256), name="fp0")(xyz0, l1_xyz, None, d1, train)
        return d0


class PointNet2Classifier(nn.Module):
    """Standalone PointNet++ SSG classifier (model/model_pointnet.py:58-90):
    3 SA layers -> FC 512 (BN, dropout .4) -> FC 256 (BN, dropout .4) ->
    num_class."""

    num_class: int = 10
    dropout_rate: float = 0.4

    @nn.compact
    def __call__(self, pc: jax.Array, train: bool) -> Tuple[jax.Array, jax.Array]:
        B = pc.shape[0]
        l1_xyz, l1_feats = SetAbstraction(512, 0.2, 32, (64, 64, 128), name="sa1")(
            pc, None, train
        )
        l2_xyz, l2_feats = SetAbstraction(128, 0.4, 64, (128, 128, 256), name="sa2")(
            l1_xyz, l1_feats, train
        )
        _, l3_feats = SetAbstraction(
            None, None, None, (256, 512, 1024), group_all=True, name="sa3"
        )(l2_xyz, l2_feats, train)
        x = l3_feats.reshape(B, 1024)
        mid_feature = x
        x = nn.Dense(512, name="fc1")(x)
        x = batch_norm(train)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(256, name="fc2")(x)
        x = batch_norm(train)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_class, name="fc3")(x)
        return logits, mid_feature
