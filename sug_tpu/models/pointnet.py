"""PointNet backbone: DG generator and standalone classifier.

Reference: ``Pointnet_g`` (model/Model.py:235-283) and ``Pointnet_cls``
(model/model_pointnet.py:5-55). Channels-last (B, N, C); every shared MLP is
a Dense over the channel axis (one MXU matmul per layer over B*N rows).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sug_tpu.models.adapt_node import SelfAdaptiveNodeModule
from sug_tpu.models.layers import ConvBN, FCLayer, TransformNet


class PointNetGenerator(nn.Module):
    """T-Net(3) -> MLP 64,64 -> T-Net(64) -> SA-node (64->128) -> MLP
    128,1024 -> max over points -> BatchNorm. Returns (global_feat (B,1024),
    node_fea (B,64,64), node_offset (B,64,3))."""

    @nn.compact
    def __call__(
        self,
        pc: jax.Array,
        train: bool,
        fps_start: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        xyz = pc  # (B, N, 3)
        t1 = TransformNet(3, name="trans_net1")(pc, train)
        x = jnp.einsum("bnc,bcd->bnd", pc, t1)
        x = ConvBN(64, name="conv1")(x, train)
        x = ConvBN(64, name="conv2")(x, train)
        t2 = TransformNet(64, name="trans_net2")(x, train)
        x = jnp.einsum("bnc,bcd->bnd", x, t2)
        x, node_fea, node_off = SelfAdaptiveNodeModule(name="sa_node")(
            x, xyz, train, fps_start
        )
        x = ConvBN(128, name="conv4")(x, train)
        x = ConvBN(1024, name="conv5")(x, train)
        x = jnp.max(x, axis=1)  # (B, 1024)
        from sug_tpu.models.bn import batch_norm

        x = batch_norm(train, name="bn1")(x)
        return x, node_fea, node_off


class PointNetClassifier(nn.Module):
    """Standalone PointNet classifier (source-only baseline + the feature
    extractor the offline dataset splitter uses, model/model_pointnet.py:5-55,
    dataset_splitter.py:121-148). ``__call__`` returns (logits, mid_feature)
    where mid_feature is the 1024-d global descriptor."""

    num_class: int = 10
    dropout_rate: float = 0.7

    @nn.compact
    def __call__(self, pc: jax.Array, train: bool) -> Tuple[jax.Array, jax.Array]:
        t1 = TransformNet(3, name="trans_net1")(pc, train)
        x = jnp.einsum("bnc,bcd->bnd", pc, t1)
        x = ConvBN(64, name="conv1")(x, train)
        x = ConvBN(64, name="conv2")(x, train)
        t2 = TransformNet(64, name="trans_net2")(x, train)
        x = jnp.einsum("bnc,bcd->bnd", x, t2)
        x = ConvBN(64, name="conv3")(x, train)
        x = ConvBN(128, name="conv4")(x, train)
        x = ConvBN(1024, name="conv5")(x, train)
        x = jnp.max(x, axis=1)  # (B, 1024)
        mid_feature = x
        x = FCLayer(512, name="mlp1")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = FCLayer(256, name="mlp2")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_class, name="mlp3")(x)
        return logits, mid_feature
