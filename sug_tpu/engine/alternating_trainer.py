"""Alternating two-phase trainers: PointDAN-style UDA and naive-MMD DG.

Reference: train_uda.py:139-178 and train_dg_naive_mmd.py:216-257 — per batch,
phase A (classification + adversarial two-head loss) steps optimizer_g +
optimizer_c, then phase B re-runs the node forward on the UPDATED params and
steps optimizer_dis on a node-feature MMD. Here both phases compile into ONE
jitted step that applies the two masked updates sequentially (phase B's
forward uses phase A's updated params, like the torch ordering).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from sug_tpu.engine.optim import param_group_masks
from sug_tpu.losses.classification import cross_entropy, discrepancy
from sug_tpu.losses.mmd import mix_rbf_mmd2, mmd_cal
from sug_tpu.models.net_mda import NetMDA
from sug_tpu.ops.augment import augment_batch


@flax.struct.dataclass
class AltTrainState:
    params: Any
    batch_stats: Any
    opt_g: Any
    opt_c: Any
    opt_dis: Any
    step: jax.Array


class AlternatingTrainer:
    """mode='uda': loss_A = weight*(ce_s1 + ce_s2) - discrepancy(t1, t2),
    GRL on the target forward with the sin ramp constant; loss_B = plain
    multi-kernel MMD on attended node features (train_uda.py:148-175).

    mode='naive': loss_A = 0.5*SRC_W*(0.5 ce_s1 + 0.5 ce_s2) - disc +
    0.5*TARGET_LOSS*target CE; loss_B = mmd_cal with the CLASS_MMD config
    (train_dg_naive_mmd.py:224-257). Target CE uses the target split's own
    labels (the reference passes the source labels — same pairing bug as the
    main trainer; enable METHODS.TARGET_LOSS_USES_SOURCE_LABELS for parity).
    """

    def __init__(
        self,
        model_name: str = "Pointnet",
        num_class: int = 10,
        mode: str = "uda",
        cfg: Optional[dict] = None,
        criterion=None,
        weight_decay: float = 5e-4,
        src_weight: float = 1.0,
        augment: bool = True,
        use_grl: bool = True,
    ):
        self.model = NetMDA(model_name=model_name, num_class=num_class)
        self.model_name = model_name
        self.num_class = num_class
        self.mode = mode
        self.cfg = cfg or {}
        from sug_tpu.models.precision import configure_from_cfg

        configure_from_cfg(self.cfg)
        from sug_tpu.models import bn as _bn

        # snapshot + re-assert pattern: see models/bn.py docstring
        self._bn_groups = _bn.configure_from_cfg(self.cfg, 1)
        self.criterion = criterion or cross_entropy
        self.src_weight = src_weight
        self.augment = augment
        self.use_grl = use_grl
        self._tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )
        self.masks = None
        from sug_tpu.utils.sanitize import checkify_jit

        self._train_step = checkify_jit(self._step)

    def init_state(self, seed: int, batch_size: int, num_points: int) -> AltTrainState:
        from sug_tpu.models import bn as _bn

        _bn.set_bn_groups(self._bn_groups)
        dummy = jnp.zeros((batch_size, num_points, 3), dtype=jnp.float32)
        variables = self.model.init(
            {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
            dummy, True, domain="both",
        )
        params = variables["params"]
        self.masks = param_group_masks(params)
        return AltTrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_g=self._tx.init(params),
            opt_c=self._tx.init(params),
            opt_dis=self._tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _masked_update(self, grads, opt_state, params, mask, lr):
        updates, new_state = self._tx.update(grads, opt_state, params)
        deltas = jax.tree.map(
            lambda u, m: (-lr * u) if m else jnp.zeros_like(u), updates, mask
        )
        return optax.apply_updates(params, deltas), new_state

    def _apply(self, params, batch_stats, data, key, domain, grl=None, fps=None):
        out, mut = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            data, True, domain=domain, grl_constant=grl, fps_start=fps,
            rngs={"dropout": key}, mutable=["batch_stats", "regularizers"],
        )
        return out, mut["batch_stats"]

    def _step(self, state: AltTrainState, batch, key, scalars):
        data_s, label_s, data_t, label_t = batch
        lr_g, lr_c, lr_dis, cons = scalars

        if self.augment:
            k1, k2, key = jax.random.split(key, 3)
            data_s = augment_batch(k1, data_s)
            data_t = augment_batch(k2, data_t)
        k_s, k_t, k_s2, k_t2, k_fps = jax.random.split(key, 5)
        B, N = data_s.shape[0], data_s.shape[1]
        fps = jax.random.randint(k_fps, (B,), 0, N)

        methods = self.cfg.get("METHODS", {})

        # ---- phase A: classification + adversarial ----------------------
        def loss_a(params):
            out_s, stats = self._apply(params, state.batch_stats, data_s, k_s, None)
            out_t, stats = self._apply(
                params, stats, data_t, k_t, None,
                grl=cons if self.use_grl else None,
            )
            ce1 = self.criterion(out_s["logits1"], label_s)
            ce2 = self.criterion(out_s["logits2"], label_s)
            loss_adv = -1.0 * discrepancy(out_t["logits1"], out_t["logits2"])
            if self.mode == "uda":
                loss = self.src_weight * (ce1 + ce2) + loss_adv
            else:
                loss_s = 0.5 * ce1 + 0.5 * ce2
                tl = float(methods.get("TARGET_LOSS", 0.0))
                src_w = float(methods.get("SRC_LOSS_WEIGHT", 1.0))
                if tl > 0:
                    t_labels = (
                        label_s
                        if methods.get("TARGET_LOSS_USES_SOURCE_LABELS", False)
                        else label_t
                    )
                    loss_t = 0.5 * self.criterion(
                        out_t["logits1"], t_labels
                    ) + 0.5 * self.criterion(out_t["logits2"], t_labels)
                    loss = 0.5 * src_w * loss_s + loss_adv + 0.5 * tl * loss_t
                else:
                    loss = src_w * loss_s + loss_adv
            return loss, (stats, {"loss_s": 0.5 * ce1 + 0.5 * ce2, "loss_adv": loss_adv})

        (loss_a_val, (stats, metrics)), grads = jax.value_and_grad(
            loss_a, has_aux=True
        )(state.params)
        params, opt_g = self._masked_update(
            grads, state.opt_g, state.params, self.masks["g"], lr_g
        )
        params, opt_c = self._masked_update(
            grads, state.opt_c, params, self.masks["c"], lr_c
        )

        # ---- phase B: node-feature MMD on the updated params -------------
        def loss_b(params):
            out_s, stats2 = self._apply(params, stats, data_s, k_s2, "source", fps=fps)
            out_t, stats2 = self._apply(params, stats2, data_t, k_t2, "target", fps=fps)
            if self.mode == "uda":
                loss_node = mix_rbf_mmd2(out_s["node_attn"], out_t["node_attn"])
            else:
                mmd_cfg = dict(methods["CLASS_MMD"][0])
                loss_node = mmd_cal(
                    label_s, out_s["node_attn"], label_t, out_t["node_attn"],
                    mmd_cfg, num_class=self.num_class,
                )
            return loss_node, stats2

        (loss_b_val, stats), grads_b = jax.value_and_grad(loss_b, has_aux=True)(params)
        params, opt_dis = self._masked_update(
            grads_b, state.opt_dis, params, self.masks["dis"], lr_dis
        )

        metrics = dict(metrics, loss_node=loss_b_val)
        return (
            AltTrainState(params, stats, opt_g, opt_c, opt_dis, state.step + 1),
            metrics,
        )

    def train_step(
        self, state, data_s, label_s, data_t, label_t, key,
        lr_g: float, lr_c: float, lr_dis: float, cons: float = 0.0,
    ) -> Tuple[AltTrainState, Dict[str, jax.Array]]:
        batch = (
            jnp.asarray(data_s),
            jnp.asarray(label_s, dtype=jnp.int32),
            jnp.asarray(data_t),
            jnp.asarray(label_t, dtype=jnp.int32),
        )
        scalars = (
            jnp.asarray(lr_g, jnp.float32),
            jnp.asarray(lr_c, jnp.float32),
            jnp.asarray(lr_dis, jnp.float32),
            jnp.asarray(cons, jnp.float32),
        )
        from sug_tpu.models import bn as _bn

        _bn.set_bn_groups(self._bn_groups)  # trace-time mailbox (bn.py)
        return self._train_step(state, batch, key, scalars)

    def eval_apply(self, params, batch_stats, data):
        out = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, data, False
        )
        return (out["logits1"] + out["logits2"]) / 2.0
