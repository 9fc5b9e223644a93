"""Shared building blocks: point-MLP (1x1-conv equivalent), FC stacks, T-Net.

The reference's ``conv_2d`` / ``fc_layer`` / ``transform_net``
(model/model_utils.py:8-89) become Dense-over-channels-last modules — a 1x1
Conv2d on (B, C, N, K) is exactly a Dense on (B, N, K, C), which XLA maps
straight onto the MXU as one batched matmul.

BatchNorm parity: torch defaults eps=1e-5, momentum=0.1 (== flax momentum
0.9). fc_layer uses LayerNorm (the BatchNorm1d is commented out in the
reference, model/model_utils.py:43-48).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sug_tpu.models.precision import compute_dtype


def activation(x: jax.Array, name: str, negative_slope: float = 0.01) -> jax.Array:
    if name == "relu":
        return nn.relu(x)
    if name == "leakyrelu":
        return nn.leaky_relu(x, negative_slope=negative_slope)
    if name == "tanh":
        return nn.tanh(x)
    raise ValueError(f"unknown activation {name}")


class ConvBN(nn.Module):
    """Dense + BatchNorm + activation over the last axis.

    Equivalent of reference ``conv_2d`` (model/model_utils.py:8-32): torch
    LeakyReLU default slope 0.01 there, so that's the default here too.
    """

    features: int
    act: str = "relu"
    use_bias: bool = True
    negative_slope: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        from sug_tpu.models.bn import batch_norm

        dt = compute_dtype()
        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=dt)(x)
        # flax BatchNorm computes batch statistics in f32 regardless of dtype
        x = batch_norm(train, dtype=dt)(x)
        return activation(x, self.act, self.negative_slope)


class FCLayer(nn.Module):
    """Dense + LayerNorm + activation.

    Equivalent of reference ``fc_layer`` (model/model_utils.py:35-57);
    leakyrelu there uses slope 0.2.
    """

    features: int
    act: str = "leakyrelu"
    use_bias: bool = False
    use_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = compute_dtype()
        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=dt)(x)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=dt)(x)  # torch LayerNorm eps
        return activation(x, self.act, negative_slope=0.2)


class TransformNet(nn.Module):
    """Spatial/feature transform T-Net predicting a K x K alignment matrix.

    Reference: model/model_utils.py:60-89. Input (B, N, C) (or (B, N, k, C)
    with ``reduce_neighbors`` for the DGCNN edge-feature variant, which maxes
    over the neighbor axis before the 1024-wide conv). Output: (B, K, K),
    biased toward identity.
    """

    K: int
    reduce_neighbors: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = ConvBN(64)(x, train)
        x = ConvBN(128)(x, train)
        if self.reduce_neighbors:
            x = jnp.max(x, axis=2)  # (B, N, k, C) -> (B, N, C)
        x = ConvBN(1024)(x, train)
        x = jnp.max(x, axis=1)  # max over points -> (B, 1024)
        x = FCLayer(512)(x)
        x = FCLayer(256)(x)
        x = nn.Dense(self.K * self.K)(x)
        x = x.reshape(-1, self.K, self.K)
        return x + jnp.eye(self.K, dtype=x.dtype)


@jax.custom_vjp
def grad_reverse(x: jax.Array, lambd: jax.Array) -> jax.Array:
    """Gradient reversal layer for adversarial adaptation.

    The reference's GradReverse (model/Model.py:37-50) misuses the autograd
    API and is effectively an identity in both passes; configs ship with
    ``GRL: False``. This is the *working* version (forward identity,
    backward ``-lambd * g``) so the GRL config path actually does what it
    says when enabled.
    """
    return x


def _grad_reverse_fwd(x, lambd):
    return x, lambd


def _grad_reverse_bwd(lambd, g):
    return (-lambd * g, jnp.zeros_like(lambd))


grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)


class CALayer(nn.Module):
    """Squeeze-excite channel attention over flattened node features.

    Reference: model/Model.py:16-34 — Dense down/up (reduction 8) + sigmoid
    gate, residual ``x*y + x``, then BatchNorm over the 4096 features.
    Input/output: (B, D) with D = num_nodes * node_channels (4096).
    """

    reduction: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        d = x.shape[-1]
        dt = compute_dtype()
        y = nn.Dense(d // self.reduction, use_bias=True, dtype=dt)(x)
        y = nn.relu(y)
        y = nn.Dense(d, use_bias=True, dtype=dt)(y)
        y = nn.sigmoid(y.astype(jnp.float32))  # gate in f32
        out = x * y + x
        # BN left at default dtype: f32 params promote the output back to f32
        # — the attended node features feed the MMD Grams, which stay f32.
        from sug_tpu.models.bn import batch_norm

        return batch_norm(train)(out)


def maxpool1d_strided(x: jax.Array, kernel: int, stride: int) -> jax.Array:
    """1-D max pooling along axis 1 of (B, L, C) — reference ``dim_redu``
    MaxPool1d equivalents (model/Model.py:72,136)."""
    B, L, C = x.shape
    out_len = (L - kernel) // stride + 1
    starts = jnp.arange(out_len) * stride
    windows = starts[:, None] + jnp.arange(kernel)[None, :]  # (out_len, kernel)
    gathered = x[:, windows, :]  # (B, out_len, kernel, C)
    return jnp.max(gathered, axis=2)
