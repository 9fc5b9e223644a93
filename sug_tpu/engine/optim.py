"""The SUG three-group optimizer choreography, as one fused update.

Reference semantics (train_dg_single_gpu.py:191-203, 329-335): three Adam
optimizers over OVERLAPPING param groups, stepped back-to-back from one
backward pass —

  - optimizer_g:   generator params EXCLUDING 'pred_offset', lr = LR cosine
  - optimizer_c:   both classifier heads, lr = LR cosine
  - optimizer_dis: generator + attention_s + attention_t, lr = LR*scaler with
                   the manual step decay (utils/train_utils.py:39-48)

Because a torch Adam step depends only on the gradient and its own moment
state (not the current param value), stepping three optimizers sequentially
equals applying the SUM of their three deltas — so here the whole
choreography compiles into one jitted update. Generator params deliberately
receive TWO Adam deltas with independent moment states (the reference's
double-update quirk, SURVEY.md §2.6). The only divergence is second-order:
torch's L2-into-grad weight decay on the later steps sees a param already
moved by ~lr, an O(lr^2 * wd) difference.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


def _path_names(path) -> tuple:
    names = []
    for p in path:
        name = getattr(p, "key", None)
        if name is None:
            name = getattr(p, "name", None)
        if name is None:
            name = str(p)
        names.append(str(name))
    return tuple(names)


def param_group_masks(params) -> Dict[str, Any]:
    """Boolean-leaf pytrees selecting each optimizer group.

    Group contract (param path name based):
      g:   under 'g' but not under a 'pred_offset' module
           (train_dg_single_gpu.py:191)
      c:   under 'c1' or 'c2'
      dis: under 'g', 'attention_s' or 'attention_t'
    """

    def make(pred):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: pred(_path_names(path)), params
        )

    return {
        "g": make(lambda n: "g" in n[:1] and "pred_offset" not in n),
        "c": make(lambda n: n[0] in ("c1", "c2")),
        "dis": make(lambda n: n[0] in ("g", "attention_s", "attention_t")),
    }


class ThreeGroupState(NamedTuple):
    g: Any
    c: Any
    dis: Any


class ThreeGroupOptimizer:
    """Fused three-group Adam with torch-style L2 weight decay.

    Learning rates are traced scalars passed per step (they follow
    per-epoch schedules computed host-side), so one compiled step serves
    every epoch.
    """

    def __init__(self, params, weight_decay: float):
        self.masks = param_group_masks(params)
        # torch Adam: moments of (grad + wd * param), then -lr * mhat/(sqrt(vhat)+eps)
        self._tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )

    def init(self, params) -> ThreeGroupState:
        return ThreeGroupState(
            g=self._tx.init(params), c=self._tx.init(params), dis=self._tx.init(params)
        )

    def update(self, grads, state: ThreeGroupState, params, lr_g, lr_c, lr_dis):
        """Returns (new_params, new_state). All three groups consume the same
        gradients; masked-out leaves contribute zero delta."""

        def group_delta(opt_state, mask, lr):
            updates, new_state = self._tx.update(grads, opt_state, params)
            deltas = jax.tree.map(
                lambda u, m: (-lr * u) if m else jnp.zeros_like(u), updates, mask
            )
            return deltas, new_state

        d_g, s_g = group_delta(state.g, self.masks["g"], lr_g)
        d_c, s_c = group_delta(state.c, self.masks["c"], lr_c)
        d_dis, s_dis = group_delta(state.dis, self.masks["dis"], lr_dis)

        total = jax.tree.map(lambda a, b, c: a + b + c, d_g, d_c, d_dis)
        new_params = optax.apply_updates(params, total)
        return new_params, ThreeGroupState(g=s_g, c=s_c, dis=s_dis)


def cosine_lr(base_lr: float, epoch: int, max_epochs: int) -> float:
    """torch CosineAnnealingLR with eta_min=0, stepped per epoch
    (train_dg_single_gpu.py:194-198)."""
    return base_lr * (1.0 + math.cos(math.pi * epoch / max_epochs)) / 2.0


def dis_lr_schedule(base_lr: float, scaler: float, epoch: int) -> float:
    """Manual dis-optimizer decay: halve every 5 epochs up to 30, then every
    10 (utils/train_utils.py:39-48; epoch 0 keeps the initial LR*scaler)."""
    if epoch <= 0:
        return base_lr * scaler
    if epoch <= 30:
        return base_lr * scaler * (0.5 ** (epoch // 5))
    return base_lr * scaler * (0.5 ** (epoch // 10))
