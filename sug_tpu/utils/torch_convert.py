"""Convert reference (SiyuanHuang95/SUG) PyTorch checkpoints to NetMDA params.

The reference trains ``Net_MDA`` (model/Model.py:452-520); its ``state_dict``
maps 1:1 onto :class:`sug_tpu.models.net_mda.NetMDA` variables — same layer
widths, same math — with three systematic transforms:

- torch ``Conv2d/Conv1d`` 1x1 kernels ``(out, in, 1[, 1])`` and ``Linear``
  weights ``(out, in)`` become channels-last Dense kernels ``(in, out)``;
- torch BatchNorm ``weight/bias/running_mean/running_var`` become flax
  ``params.{scale,bias}`` + ``batch_stats.{mean,var}``;
- the reference flattens node features channel-major ``(C, node)``
  (model/Model.py:500-507 ``feat_ori.view(B, -1)`` on a (B, C, S) tensor)
  while NetMDA flattens node-major ``(node, C)``, so every weight touching
  the 4096-d flattened node vector (both CALayers, model/Model.py:16-34) is
  permuted accordingly.

Dead reference parameters are dropped: ``adapt_layer_off.trans``
(model/model_utils.py:97 — defined, never called), DGCNN's
``input_transform_net`` (model/Model.py:59 — forward use commented out) and
Pointnet2's ``channel_redu`` (model/Model.py:135).

Everything here operates on a plain ``{name: np.ndarray}`` dict so the module
imports without torch; :func:`state_dict_to_numpy` converts a live torch
state_dict.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

Array = np.ndarray
SD = Dict[str, Array]

NUM_NODE = 64
NODE_CH = 64

# mine_flat[j] (node-major, j = n*C + c) == ref_flat[NODE_PERM[j]] (channel
# major, i = c*S + n)
NODE_PERM = np.arange(NUM_NODE * NODE_CH).reshape(NUM_NODE, NODE_CH).T.ravel()


def state_dict_to_numpy(state_dict) -> SD:
    """torch state_dict -> {name: np.float32 array} (detached, on host)."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _dense_kernel(w: Array) -> Array:
    """(out, in[, 1[, 1]]) conv/linear weight -> (in, out) Dense kernel."""
    w = np.asarray(w, np.float32)
    return w.reshape(w.shape[0], w.shape[1]).T


def _dense(sd: SD, prefix: str) -> Dict[str, Array]:
    p = {"kernel": _dense_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return p


def _bn(sd: SD, prefix: str) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }
    return params, stats


def _layernorm(sd: SD, prefix: str) -> Dict[str, Array]:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }


def _conv_bn(sd: SD, prefix: str):
    """Reference ``conv_2d`` (model/model_utils.py:8-32: .conv.0 conv,
    .conv.1 BN) -> flax ConvBN {Dense_0, BatchNorm_0}."""
    bn_p, bn_s = _bn(sd, f"{prefix}.conv.1")
    params = {"Dense_0": _dense(sd, f"{prefix}.conv.0"), "BatchNorm_0": bn_p}
    stats = {"BatchNorm_0": bn_s}
    return params, stats


def _fc_layer(sd: SD, prefix: str) -> Dict[str, Array]:
    """Reference ``fc_layer`` (model/model_utils.py:35-57: .fc.0 Linear,
    .fc.1 LayerNorm) -> flax FCLayer {Dense_0, LayerNorm_0}."""
    return {
        "Dense_0": _dense(sd, f"{prefix}.fc.0"),
        "LayerNorm_0": _layernorm(sd, f"{prefix}.fc.1"),
    }


def _transform_net(sd: SD, prefix: str):
    """Reference ``transform_net`` (model/model_utils.py:60-89)."""
    params, stats = {}, {}
    for i in range(3):
        p, s = _conv_bn(sd, f"{prefix}.conv2d{i + 1}")
        params[f"ConvBN_{i}"] = p
        stats[f"ConvBN_{i}"] = s
    params["FCLayer_0"] = _fc_layer(sd, f"{prefix}.fc1")
    params["FCLayer_1"] = _fc_layer(sd, f"{prefix}.fc2")
    params["Dense_0"] = _dense(sd, f"{prefix}.fc3")
    return params, stats


def _adapt_layer(sd: SD, prefix: str):
    """Reference ``adapt_layer_off`` (model/model_utils.py:92-128) ->
    SelfAdaptiveNodeModule {pred_offset, residual}. ``.trans`` is dead."""
    res_p, res_s = _conv_bn(sd, f"{prefix}.residual")
    params = {
        "pred_offset": {"kernel": _dense_kernel(sd[f"{prefix}.pred_offset.0.weight"])},
        "residual": res_p,
    }
    return params, {"residual": res_s}


def _ca_layer(sd: SD, prefix: str):
    """Reference ``CALayer`` (model/Model.py:16-34) with the node-ordering
    permutation folded into every weight touching the 4096-d input."""
    p = NODE_PERM
    w0 = _dense_kernel(sd[f"{prefix}.conv_du.0.weight"])  # (4096, 512)
    b0 = np.asarray(sd[f"{prefix}.conv_du.0.bias"], np.float32)
    w1 = _dense_kernel(sd[f"{prefix}.conv_du.2.weight"])  # (512, 4096)
    b1 = np.asarray(sd[f"{prefix}.conv_du.2.bias"], np.float32)
    bn_p, bn_s = _bn(sd, f"{prefix}.bn")
    params = {
        "Dense_0": {"kernel": w0[p, :], "bias": b0},
        "Dense_1": {"kernel": w1[:, p], "bias": b1[p]},
        "BatchNorm_0": {k: v[p] for k, v in bn_p.items()},
    }
    stats = {"BatchNorm_0": {k: v[p] for k, v in bn_s.items()}}
    return params, stats


def _classifier_head(sd: SD, prefix: str, ptran: bool = False):
    """Reference ``Pointnet_c`` (model/Model.py:412-449)."""
    params = {
        "mlp2": _fc_layer(sd, f"{prefix}.mlp2"),
        "mlp3": _dense(sd, f"{prefix}.mlp3"),
    }
    if not ptran:
        params["mlp1"] = _fc_layer(sd, f"{prefix}.mlp1")
    return params, {}


def _kpconv_head(sd: SD, prefix: str):
    """Reference ``KPConv_c`` (model/Model.py:389-409)."""
    return {f"mlp{i}": _dense(sd, f"{prefix}.mlp{i}") for i in (1, 2, 3)}, {}


def _edgeconv_block(sd: SD, prefix: str):
    """Reference DGCNN ``conv_2d`` EdgeConv stage -> fused _EdgeConvBlock
    (conv_dense kernel + bn_scale/bn_bias params, bn_mean/bn_var stats)."""
    bn_p, bn_s = _bn(sd, f"{prefix}.conv.1")
    params = {
        "conv_dense": {"kernel": _dense_kernel(sd[f"{prefix}.conv.0.weight"])},
        "bn_scale": bn_p["scale"],
        "bn_bias": bn_p["bias"],
    }
    stats = {"bn_mean": bn_s["mean"], "bn_var": bn_s["var"]}
    return params, stats


def _pointnet_generator(sd: SD):
    """Reference ``Pointnet_g`` (model/Model.py:235-283)."""
    params, stats = {}, {}
    for src, dst in (("trans_net1", "trans_net1"), ("trans_net2", "trans_net2")):
        params[dst], stats[dst] = _transform_net(sd, f"g.{src}")
    for src, dst in (("conv1", "conv1"), ("conv2", "conv2"), ("conv4", "conv4"),
                     ("conv5", "conv5")):
        params[dst], stats[dst] = _conv_bn(sd, f"g.{src}")
    params["sa_node"], stats["sa_node"] = _adapt_layer(sd, "g.conv3")
    params["bn1"], stats["bn1"] = _bn(sd, "g.bn1")
    return params, stats


def _dgcnn_generator(sd: SD):
    """Reference ``DGCNN`` generator (model/Model.py:54-121).
    ``input_transform_net`` is dead (forward use commented out, :83-84)."""
    params, stats = {}, {}
    for i in range(1, 5):
        params[f"block{i}"], stats[f"block{i}"] = _edgeconv_block(sd, f"g.conv{i}")
    params["sa_node"], stats["sa_node"] = _adapt_layer(sd, "g.node_fea_adapt")
    params["reproject"] = _dense(sd, "g.conv1d")
    params["conv5"] = _dense(sd, "g.conv5")
    params["bn5"], stats["bn5"] = _bn(sd, "g.bn5")
    return params, stats


def _pointnet2_generator(sd: SD):
    """Reference ``Pointnet2_g`` (model/Model.py:123-161). ``channel_redu``
    is dead (never called in forward)."""
    params, stats = {}, {}
    for sa in ("sa1", "sa2", "sa3"):
        sa_p, sa_s = {}, {}
        for i in range(3):
            bn_p, bn_s = _bn(sd, f"g.{sa}.mlp_bns.{i}")
            sa_p[f"mlp{i}"] = {
                "Dense_0": _dense(sd, f"g.{sa}.mlp_convs.{i}"),
                "BatchNorm_0": bn_p,
            }
            sa_s[f"mlp{i}"] = {"BatchNorm_0": bn_s}
        params[sa], stats[sa] = sa_p, sa_s
    return params, stats


def _vecattn_block(sd: SD, prefix: str) -> Dict[str, Array]:
    """Reference ``TransformerBlock`` (model/Ptran_transformer.py:9-46) ->
    VectorAttentionBlock. Param names match BOTH the XLA path (nn.Dense
    modules) and the fused-kernel path (_DenseParams) — the trees are
    identical by construction (models/ptran.py)."""
    p = {
        "fc1": _dense(sd, f"{prefix}.fc1"),
        "fc2": _dense(sd, f"{prefix}.fc2"),
        "fc_delta1": _dense(sd, f"{prefix}.fc_delta.0"),
        "fc_delta2": _dense(sd, f"{prefix}.fc_delta.2"),
        "fc_gamma1": _dense(sd, f"{prefix}.fc_gamma.0"),
        "fc_gamma2": _dense(sd, f"{prefix}.fc_gamma.2"),
    }
    for w in ("w_qs", "w_ks", "w_vs"):  # bias-free projections
        p[w] = {"kernel": _dense_kernel(sd[f"{prefix}.{w}.weight"])}
    return p


def _ptran_transition_down(sd: SD, prefix: str):
    """Reference ``TransitionDown`` -> SA with knn=True
    (model/Model.py:289-293, PTran_utils.PointNetSetAbstraction): two
    Conv2d+BN2d mlp stages -> two ConvBN {Dense_0, BatchNorm_0} modules."""
    params, stats = {}, {}
    for i in range(2):
        bn_p, bn_s = _bn(sd, f"{prefix}.sa.mlp_bns.{i}")
        params[f"mlp{i}"] = {
            "Dense_0": _dense(sd, f"{prefix}.sa.mlp_convs.{i}"),
            "BatchNorm_0": bn_p,
        }
        stats[f"mlp{i}"] = {"BatchNorm_0": bn_s}
    return params, stats


def _ptran_generator(sd: SD):
    """Reference ``PTran_g`` (model/Model.py:295-347): fc1 Sequential
    (Linear/ReLU/Linear) -> fc1a/fc1b; transformer1 + 4 x (TransitionDown +
    transformer); the stride-2 point-mixing ``conv1d`` (model/Model.py:314,
    331) -> the ``point_mix`` Dense over the point axis (its (64, 64, 1)
    torch kernel transposes to (in=points, out) like any 1x1 conv — the
    feat/point flatten-order difference is absorbed by the CALayer
    NODE_PERM, exactly as for the other backbones)."""
    bk, stats_bk = {}, {}
    bk["fc1a"] = _dense(sd, "g.fc1.0")
    bk["fc1b"] = _dense(sd, "g.fc1.2")
    bk["transformer1"] = _vecattn_block(sd, "g.transformer1")
    for i in range(4):
        bk[f"td{i}"], stats_bk[f"td{i}"] = _ptran_transition_down(
            sd, f"g.transition_downs.{i}"
        )
        bk[f"transformer{i + 2}"] = _vecattn_block(sd, f"g.transformers.{i}")
    params = {"backbone": bk, "point_mix": _dense(sd, "g.conv1d")}
    return params, {"backbone": stats_bk}


_GENERATOR_CONVERTERS = {
    "Pointnet": _pointnet_generator,
    "DGCNN": _dgcnn_generator,
    "Pointnet2": _pointnet2_generator,
    "PTran": _ptran_generator,
}


def convert_net_mda(sd: SD, model_name: str = "Pointnet") -> Dict[str, dict]:
    """Reference ``Net_MDA`` state_dict (as numpy) -> NetMDA variables.

    Returns ``{"params": ..., "batch_stats": ...}`` ready for
    ``NetMDA(model_name=...).apply(variables, pc, train=False, ...)``.
    """
    if model_name not in _GENERATOR_CONVERTERS:
        if model_name == "KPConv":
            raise NotImplementedError(
                "KPConv full-model transplant is unsupported BY DESIGN: the "
                "TPU pyramid is a fixed-capacity redesign of the reference's "
                "dynamic stacked-rows preprocessing, so whole-model weights "
                "are not drop-in comparable. Op/block-level numerical parity "
                "(incl. deformable + regularizer) is enforced instead — see "
                "tests/test_weight_transplant.py::test_kpconv_block_*."
            )
        raise NotImplementedError(
            f"no converter for model_name={model_name!r} "
            f"(have {sorted(_GENERATOR_CONVERTERS)})"
        )
    params, stats = {}, {}
    params["g"], stats["g"] = _GENERATOR_CONVERTERS[model_name](sd)
    for att in ("attention_s", "attention_t"):
        params[att], stats[att] = _ca_layer(sd, att)
    ptran = model_name == "PTran"
    for head in ("c1", "c2"):
        params[head], _ = _classifier_head(sd, head, ptran=ptran)
    return {"params": params, "batch_stats": _prune_empty(stats)}


def _prune_empty(tree):
    if not isinstance(tree, dict):
        return tree
    out = {k: _prune_empty(v) for k, v in tree.items()}
    return {k: v for k, v in out.items() if not (isinstance(v, dict) and not v)}


def load_reference_checkpoint(path: str, model_name: str = "Pointnet",
                              key: Optional[str] = None) -> Dict[str, dict]:
    """Load a reference ``.pth`` checkpoint file and convert it.

    ``key`` selects a sub-dict (the reference saves raw state_dicts via
    ``torch.save(model.state_dict(), ...)``, train_dg_single_gpu.py; some
    forks wrap them under 'model_state'/'state_dict')."""
    import torch

    blob = torch.load(path, map_location="cpu")
    if key is not None:
        blob = blob[key]
    elif isinstance(blob, dict) and not any(hasattr(v, "detach") for v in blob.values()):
        for guess in ("model_state", "state_dict", "model"):
            if guess in blob:
                blob = blob[guess]
                break
    sd = state_dict_to_numpy(blob)
    # DataParallel checkpoints prefix every key with 'module.'
    if all(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}
    return convert_net_mda(sd, model_name)
