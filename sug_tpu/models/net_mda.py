"""Net_MDA: the composite DG model — generator + twin heads + per-domain
channel attention.

Reference: model/Model.py:452-520. The reference's six forward modes
(plain / semantic_adaption / node_adaptation_s / node_adaptation_t /
mid_feat / node_vis) require 3 generator passes per domain per train step.
Here ONE forward computes everything the step needs — logits of both heads,
256-d semantic features, and the attended node features — and jit dead-code
eliminates whatever a particular caller drops. That alone removes 2/3 of the
backbone FLOPs per step relative to the reference choreography.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sug_tpu.models.dgcnn import DGCNNGenerator
from sug_tpu.models.heads import ClassifierHead, KPConvHead
from sug_tpu.models.layers import CALayer, grad_reverse
from sug_tpu.models.pointnet import PointNetGenerator
from sug_tpu.models.pointnet2 import PointNet2Generator

GENERATOR_REGISTRY = {}


def register_generator(name):
    def deco(cls):
        GENERATOR_REGISTRY[name] = cls
        return cls

    return deco


register_generator("Pointnet")(PointNetGenerator)
register_generator("Pointnet2")(PointNet2Generator)
register_generator("DGCNN")(DGCNNGenerator)


def _make_generator(model_name: str, model_cfg=None) -> nn.Module:
    # PTran / KPConv are registered lazily to keep import cost down
    if model_name == "PTran":
        from sug_tpu.models.ptran import PointTransformerGenerator

        return PointTransformerGenerator(name="g")
    if model_name == "KPConv":
        from sug_tpu.models.kpconv import KPConvGenerator

        return KPConvGenerator(cfg=model_cfg, name="g")
    if model_name not in GENERATOR_REGISTRY:
        raise NotImplementedError(f"Unsupported model name {model_name}")
    return GENERATOR_REGISTRY[model_name](name="g")


class NetMDA(nn.Module):
    """Composite DG model.

    __call__ returns a dict:
        logits1, logits2: (B, num_class) from the twin heads
        sem1, sem2:       (B, 256) semantic mid features
        node_flat:        (B, 4096) flattened raw node features
        node_attn:        (B, 4096) domain-attended node features (CALayer),
                          present when ``domain`` is 'source'/'target'/'both'
        node_offset:      learned SA-node offsets (backbone-dependent)

    ``grl_constant``: when > 0, applies the (working) gradient-reversal layer
    to the global feature before the heads (reference ``adaptation`` mode,
    model/Model.py:510-511).
    """

    model_name: str = "Pointnet"
    num_class: int = 10
    # backbone-specific config overrides (YAML MODEL_CFG), e.g. KPConv's
    # kp_method / kp_random_init / first_subsampling_dl
    model_cfg: Optional[dict] = None

    def setup(self):
        self.g = _make_generator(self.model_name, self.model_cfg)
        dgcnn = self.model_name == "DGCNN"
        ptran = self.model_name == "PTran"
        if self.model_name == "KPConv":
            self.c1 = KPConvHead(self.num_class)
            self.c2 = KPConvHead(self.num_class)
        else:
            self.c1 = ClassifierHead(self.num_class, dgcnn=dgcnn, ptran=ptran)
            self.c2 = ClassifierHead(self.num_class, dgcnn=dgcnn, ptran=ptran)
        self.attention_s = CALayer()
        self.attention_t = CALayer()

    def __call__(
        self,
        pc: jax.Array,
        train: bool = True,
        domain: Optional[str] = None,
        grl_constant: Optional[jax.Array] = None,
        fps_start: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        if domain == "stacked":
            return self._stacked(pc, train, grl_constant, fps_start)
        feat, node_fea, node_off = self.g(pc, train, fps_start)
        B = feat.shape[0]
        node_flat = node_fea.reshape(B, -1)

        out: Dict[str, Any] = {"node_flat": node_flat, "node_offset": node_off}
        if domain in ("source", "both"):
            out["node_attn"] = self.attention_s(node_flat, train)
        if domain in ("target", "both"):
            attn_t = self.attention_t(node_flat, train)
            out["node_attn_t" if domain == "both" else "node_attn"] = attn_t

        # GRL gating is static (None = off); the constant itself may be a
        # traced per-epoch scalar (the sin ramp)
        if grl_constant is not None:
            feat = grad_reverse(feat, jnp.asarray(grl_constant, feat.dtype))

        logits1, sem1 = self.c1(feat, train)
        logits2, sem2 = self.c2(feat, train)
        out.update(
            logits1=logits1, logits2=logits2, sem1=sem1, sem2=sem2, global_feat=feat
        )
        return out

    def _stacked(self, pc, train, grl_constant, fps_start):
        """One generator pass over concat(source, target) along the batch.

        Valid ONLY for batch-decoupled generators (KPConv: InstanceNorm +
        norm/dropout-free heads — no module mixes information across batch
        rows), where it is numerically identical to the sequential
        source-then-target choreography while halving the number of
        launched ops: KPConv's step is dominated by thousands of tiny
        per-level fusions whose cost is per-OP, not per-byte
        (docs/PERF.md round-5 profile), so 2x the rows per op is nearly
        free. The per-domain CALayers and their BN batch statistics still
        see exactly their own half. Output: the sequential contract's two
        dicts, keyed '_s'/'_t' by the caller (engine/dg_trainer.py).
        """
        from sug_tpu.models import bn as _bn

        # generator BN (if any) runs in the 2-group sequential-momentum
        # regime: each domain half normalized by its own statistics, running
        # stats updated source-then-target — bit-faithful to the sequential
        # choreography. Scoped to the generator: flax traces python-
        # sequentially, so the CALayers/heads below see plain BN again.
        _bn.set_stacked_bn(True)
        try:
            feat, node_fea, node_off = self.g(pc, train, fps_start)
        finally:
            _bn.set_stacked_bn(False)
        B = feat.shape[0] // 2
        node_flat = node_fea.reshape(2 * B, -1)
        attn_s = self.attention_s(node_flat[:B], train)
        attn_t = self.attention_t(node_flat[B:], train)
        if grl_constant is not None:
            # reference applies GRL on the TARGET forward only
            feat = jnp.concatenate(
                [feat[:B], grad_reverse(feat[B:], jnp.asarray(grl_constant, feat.dtype))]
            )
        logits1, sem1 = self.c1(feat, train)
        logits2, sem2 = self.c2(feat, train)
        return {
            "node_flat": node_flat,
            "node_offset": node_off,
            "node_attn": attn_s,
            "node_attn_t": attn_t,
            "logits1": logits1,
            "logits2": logits2,
            "sem1": sem1,
            "sem2": sem2,
            "global_feat": feat,
        }
