"""Classifier heads shared by all backbones.

Reference: ``Pointnet_c`` (model/Model.py:412-449) and ``KPConv_c``
(model/Model.py:389-409). ``adapt=True`` behavior (expose the 256-d mid
feature for the semantic MMD) is always-on here — the head returns
(logits, mid_feature) and callers drop what they don't need; under jit the
unused output is dead-code-eliminated.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax

from sug_tpu.models.layers import FCLayer


class ClassifierHead(nn.Module):
    """PointNet-style head: 1024 -> 512 -> 256 -> num_class.

    - dgcnn variant: leakyrelu activations + biased first FC
      (model/Model.py:418-423).
    - ptran variant: skips the first FC (the PTran generator emits 512-d
      globals, model/Model.py:437-439).
    - mid feature: the 256-d pre-dropout activation (model/Model.py:441-443).
    - dropout: reference uses torch Dropout2d(0.4) on a 2-D tensor, which is
      plain elementwise dropout in effect; implemented as standard Dropout.
    """

    num_class: int = 10
    dgcnn: bool = False
    ptran: bool = False
    dropout_rate: float = 0.4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> Tuple[jax.Array, jax.Array]:
        act = "leakyrelu" if self.dgcnn else "relu"
        if not self.ptran:
            x = FCLayer(512, act=act, use_bias=self.dgcnn, name="mlp1")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = FCLayer(256, act=act, use_bias=True, name="mlp2")(x)
        mid_feature = x
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_class, name="mlp3")(x)
        return logits, mid_feature


class KPConvHead(nn.Module):
    """Plain MLP head for KPConv: 1024 -> 256 -> 64 -> num_class; mid
    feature is the 256-d pre-ReLU activation (model/Model.py:398-409)."""

    num_class: int = 10

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> Tuple[jax.Array, jax.Array]:
        x = nn.Dense(256, name="mlp1")(x)
        mid_feature = x
        x = nn.relu(x)
        x = nn.relu(nn.Dense(64, name="mlp2")(x))
        logits = nn.Dense(self.num_class, name="mlp3")(x)
        return logits, mid_feature
