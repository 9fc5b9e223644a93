"""Self-adaptive node module (SA-node) — source of the "geometric" node
features aligned by the geo-MMD.

Reference: ``adapt_layer_off`` (model/model_utils.py:92-128):
FPS 64 nodes -> ball-query(r=0.3, 64) group -> learned tanh offsets on the
centered group features -> re-query (kNN) at the offset node locations ->
max-pool node features -> 3-NN inverse-distance upsample back to all points,
concatenated with the input features.

TPU notes: all gathers are static-shape ``take_along_axis``; FPS is the
fori_loop kernel from sug_tpu.ops. The reference also defines an unused
``self.trans`` conv (dead parameter) — not carried over.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sug_tpu.models.layers import ConvBN
from sug_tpu.ops.geometry import (
    farthest_point_sample,
    index_points,
    query_ball_point,
    three_nn_interpolate,
)


class SelfAdaptiveNodeModule(nn.Module):
    """SA-node module: (B, N, C) features + (B, N, 3) coords ->
    (B, N, C + fc_dim) upsampled features, (B, num_node, fc_dim) node
    features, (B, num_node, 3) learned node offsets."""

    num_node: int = 64
    nsample: int = 64
    radius: float = 0.3
    fc_dim: int = 64

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,
        xyz: jax.Array,
        train: bool,
        fps_start: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        # -- initialize nodes via FPS (reference model/model_utils.py:105-107)
        fps_idx = farthest_point_sample(xyz, self.num_node, fps_start)
        fpoint_loc = index_points(xyz, fps_idx)  # (B, S, 3)
        group_idx = query_ball_point(self.radius, self.nsample, xyz, fpoint_loc)

        # -- learn node offsets (model/model_utils.py:112-117)
        # pred_offset: 1x1 conv + tanh, no bias; EXCLUDED from the generator
        # optimizer group (train_dg_single_gpu.py:191) — the param name
        # 'pred_offset' is the contract the optimizer masking keys on.
        #
        # Project-before-gather (OFF by default): with no bias the conv is
        # linear, so ``(feats[idx] - feats[fps]) @ W == P[idx] - P[fps]`` with
        # ``P = feats @ W`` computed once per point — nominally ~20x less
        # gather traffic. MEASURED SLOWER on TPU v5e (81.7 vs 75.8 ms
        # PointNet DG step): a 3-channel gather still moves full 128-lane
        # tiles, so narrow gathers save nothing, and the wide gather fuses
        # into the Dense. Kept behind SUG_SANODE_PROJ_FIRST=1 for
        # lane-flexible backends; same math up to f32 reassociation.
        import os as _os

        if _os.environ.get("SUG_SANODE_PROJ_FIRST", "0") == "1":
            proj = nn.Dense(3, use_bias=False, name="pred_offset")(feats)  # (B, N, 3)
            p_node = index_points(proj, fps_idx)  # (B, S, 3)
            p_group = index_points(proj, group_idx)  # (B, S, ns, 3)
            seman_trans = nn.tanh(p_group - p_node[:, :, None, :])  # (B, S, ns, 3)
        else:  # gather-then-project (the pre-optimization order, for A/B)
            fpoint_fea = index_points(feats, fps_idx)
            group_fea = index_points(feats, group_idx) - fpoint_fea[:, :, None, :]
            seman_trans = nn.tanh(
                nn.Dense(3, use_bias=False, name="pred_offset")(group_fea)
            )
        group_loc = index_points(xyz, group_idx) - fpoint_loc[:, :, None, :]
        node_offset = jnp.mean(seman_trans * group_loc, axis=2)  # (B, S, 3)

        # -- re-query at offset nodes, max-pool node features
        # (model/model_utils.py:119-123; second query uses radius=None = kNN)
        node_loc = fpoint_loc + node_offset
        residual_fea = ConvBN(self.fc_dim, name="residual")(feats, train)
        import os

        use_fused = (
            jax.default_backend() == "tpu"
            and os.environ.get("SUG_FUSED_SANODE", "1") == "1"
            and xyz.shape[1] % 128 == 0
        )
        if use_fused:
            # one Pallas program: kNN of the offset nodes against the cloud +
            # max over the k neighbors' residual features — replaces the
            # (B, S, ns, fc) gather + its scatter-add backward (the largest
            # fusions in the PointNet step trace, docs/PERF.md)
            from sug_tpu.models.precision import compute_dtype
            from sug_tpu.ops.edgeconv_pallas import fused_cross_edgeconv_reduce

            zeros_v = jnp.zeros(
                node_loc.shape[:2] + (self.fc_dim,), jnp.float32
            )
            node_fea, _, _, _, _ = fused_cross_edgeconv_reduce(
                node_loc, xyz, residual_fea.astype(jnp.float32), zeros_v,
                min(self.nsample, xyz.shape[1]),
                values_bf16=compute_dtype() == jnp.bfloat16,
            )
        else:
            group_idx2 = query_ball_point(None, self.nsample, xyz, node_loc)
            group_fea2 = index_points(residual_fea, group_idx2)  # (B, S, ns, fc)
            node_fea = jnp.max(group_fea2, axis=2)  # (B, S, fc_dim)

        # -- 3-NN inverse-distance upsample + skip concat
        # (model/model_utils.py:126, model/point_utils.py:134-165)
        interpolated = three_nn_interpolate(xyz, node_loc, node_fea, k=3)
        output_fea = jnp.concatenate([feats, interpolated], axis=-1)
        return output_fea, node_fea, node_offset
