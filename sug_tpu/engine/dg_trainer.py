"""The SUG DG trainer: one jitted step containing augmentation, both domain
forwards, every loss, and the fused three-group optimizer update.

Reference choreography (train_dg_single_gpu.py:207-398): per batch it runs
model(data) + model(data_t) for semantics, then model(data, node_adaptation_s)
+ model(data_t, node_adaptation_t) for node features — four backbone passes —
then backward + 3 optimizer steps. Here the composite model emits everything
in ONE pass per domain and the whole step is a single XLA program.

Loss semantics (with the reference's bugs fixed, not replicated):
- cls: 0.5*CE(head1) + 0.5*CE(head2), focal / class-weighted variants
- adv: -ADV_WEIGHT * discrepancy(target head outputs), added AFTER the head
  average (the reference references loss_s before assignment when
  ADV_WEIGHT > 0, train_dg_single_gpu.py:274-279 — an UnboundLocalError in
  practice; this is the intended ordering)
- target split CE uses the TARGET split's labels (the reference passes the
  source batch's labels at train_dg_single_gpu.py:285-286, which pairs
  unrelated labels since the two loaders shuffle independently; set
  ``METHODS.TARGET_LOSS_USES_SOURCE_LABELS: True`` for bug-parity)
- geo MMD on CALayer-attended 4096-d node features with chamfer SDA weights
- sem MMD on the two heads' 256-d mid features with KL SDA weights
- PURE_CLS_EPOCH gating compiles two step variants (cls-only / full)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp

from sug_tpu.engine.optim import ThreeGroupOptimizer, ThreeGroupState
from sug_tpu.losses.classification import cross_entropy, discrepancy, focal_loss
from sug_tpu.losses.mmd import mmd_cal
from sug_tpu.models.net_mda import NetMDA
from sug_tpu.ops.augment import augment_batch
from sug_tpu.parallel.mesh import batch_sharding, replicated_sharding


# BatchNorm backbones whose stacked both-domains forward is the default:
# requires BOTH a transfer-neutrality A/B (docs/VALIDATION.md "Stacked
# both-domains forward") AND a measured step-speed win (docs/PERF.md).
# Pointnet/PTran stay sequential until they get their own transfer A/B.
_STACKED_DEFAULT_ON: tuple = ()


@flax.struct.dataclass
class DGTrainState:
    params: Any
    batch_stats: Any
    opt_state: ThreeGroupState
    step: jax.Array


def make_criterion(opt_cfg, source_dataset=None, num_class: int = 10):
    """Build the classification loss from OPTIMIZATION config — FocalLoss /
    ClassWeighting (gamma=0 focal) / plain CE
    (reference train_dg_single_gpu.py:163-181)."""
    name = opt_cfg.get("CLS_LOSS", "CrossEntropyLoss")
    if name == "FocalLoss":
        alpha = None
        if opt_cfg.get("CLS_WEIGHT", None) and source_dataset is not None:
            alpha = source_dataset.cls_wights(weighting=opt_cfg["CLS_WEIGHT"])
        gamma = float(opt_cfg["FOCAL_GAMMA"])
        alpha_arr = None if alpha is None else jnp.asarray(alpha)
        return functools.partial(
            focal_loss, gamma=gamma, alpha=alpha_arr, num_classes=num_class
        )
    if name == "ClassWeighting":
        if not opt_cfg.get("CLS_WEIGHT", None):
            raise RuntimeError("When setting ClassWeighting, CLS_WEIGHT should be provided")
        alpha = source_dataset.cls_wights(
            weighting=opt_cfg["CLS_WEIGHT"], q_=opt_cfg.get("DLSA_Q", None)
        )
        return functools.partial(
            focal_loss, gamma=0.0, alpha=jnp.asarray(alpha), num_classes=num_class
        )
    return cross_entropy


class DGTrainer:
    """Owns the NetMDA model, the fused optimizer, and the compiled steps.

    ``mesh``: optional 1-D data mesh — when given, batches are sharded over
    it and params replicated; GSPMD inserts the gradient all-reduce.
    """

    def __init__(
        self,
        cfg,
        model_name: str = "Pointnet",
        num_class: int = 10,
        criterion=None,
        mesh=None,
        augment: bool = True,
        donate: bool = False,
    ):
        self.cfg = cfg
        # PRECISION: bf16 switches backbone compute to bf16 (params, BN
        # stats, neighbor selection, losses stay f32 — models/precision.py)
        from sug_tpu.models.precision import configure_from_cfg

        configure_from_cfg(cfg)
        # BN_SEMANTICS: per_replica reproduces the reference's unsynced
        # DDP BatchNorm as grouped stats (models/bn.py); default global.
        from sug_tpu.models import bn as _bn

        # snapshot the effective group count: train_step/init_state re-assert
        # it before tracing, so another trainer configured in between cannot
        # leak its BN semantics into this trainer's trace (bn.py docstring)
        self._bn_groups = _bn.configure_from_cfg(
            cfg, int(mesh.devices.size) if mesh is not None else 1
        )
        model_cfg = cfg.get("MODEL_CFG", None)
        self.model = NetMDA(
            model_name=model_name, num_class=num_class,
            model_cfg=dict(model_cfg) if model_cfg else None,
        )
        self.model_name = model_name
        self.num_class = num_class
        self.criterion = criterion or cross_entropy
        self.mesh = mesh
        self.augment = augment
        self.optimizer: Optional[ThreeGroupOptimizer] = None

        methods = cfg["METHODS"]
        self._grl = bool(methods.get("GRL", False))
        # donate=True aliases the train state's buffers into the step's
        # outputs (XLA reuses params/opt-state HBM in place). The training
        # loops enable it; callers that reuse an old state (tests, bench
        # fixed-state probes) must leave it off.
        self._donate = {"donate_argnums": (0,)} if donate else {}
        self._jit_kwargs = {}
        if mesh is not None:
            rep = replicated_sharding(mesh)
            bsh = batch_sharding(mesh)
            self._jit_kwargs = dict(
                in_shardings=(rep, (bsh, bsh, bsh, bsh), rep, rep),
                out_shardings=rep,
            )
        # checkify_jit == jax.jit unless SUG_DETECT_ANOMALY=1 (the sanitizer
        # analog of the reference's set_detect_anomaly, train_dg.py:266)
        from sug_tpu.utils.sanitize import checkify_jit

        self._train_step_cls = checkify_jit(
            functools.partial(self._train_step, mmd_on=False),
            **self._jit_kwargs, **self._donate,
        )
        self._train_step_full = checkify_jit(
            functools.partial(self._train_step, mmd_on=True),
            **self._jit_kwargs, **self._donate,
        )

    # ------------------------------------------------------------------
    def init_state(self, seed: int, batch_size: int, num_points: int) -> DGTrainState:
        from sug_tpu.models import bn as _bn

        _bn.set_bn_groups(self._bn_groups)
        dummy = jnp.zeros((batch_size, num_points, 3), dtype=jnp.float32)
        variables = self.model.init(
            {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
            dummy,
            True,
            domain="both",
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        wd = float(self.cfg["OPTIMIZATION"]["WEIGHT_DECAY"])
        self.optimizer = ThreeGroupOptimizer(params, wd)
        state = DGTrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), dtype=jnp.int32),
        )
        if self.mesh is not None:
            state = jax.device_put(state, replicated_sharding(self.mesh))
        return state

    # ------------------------------------------------------------------
    def _forward_both(
        self, params, batch_stats, data_s, data_t, key, grl_const, train: bool = True
    ):
        """Source then target forward, threading BN stats like the
        reference's sequential model() calls. ``train=False`` (used by the
        loss-parity tests) makes the pass deterministic: FPS starts at index
        0, dropout off, BN running stats."""
        k_fps_s, k_fps_t, k_do_s, k_do_t = jax.random.split(key, 4)
        B, N = data_s.shape[0], data_s.shape[1]
        fps_s = jax.random.randint(k_fps_s, (B,), 0, N) if train else None
        fps_t = jax.random.randint(k_fps_t, (B,), 0, N) if train else None

        # KPConv's generator is batch-decoupled (InstanceNorm only) and its
        # heads are norm/dropout-free, so both domains run as ONE stacked
        # generator pass — numerically identical, ~half the tiny-op count
        # (NetMDA._stacked). SUG_KPCONV_STACKED=0 restores the sequential
        # choreography. For the BatchNorm backbones the same transform keeps
        # train-time normalization exactly per-domain (2-group BN) with the
        # sequential-momentum running-stat update (models/bn.py); the ONLY
        # train-math delta is head DROPOUT drawing one mask over 2B rows
        # instead of two over B — distributionally identical, and proven
        # transfer-neutral for DGCNN/Pointnet2 (docs/VALIDATION.md "Stacked
        # both-domains forward"), so those two default ON where the measured
        # step is faster (docs/PERF.md round-5 sweep). SUG_STACKED_FORWARD=1
        # forces it on (any backbone), =0 forces the sequential choreography.
        import os

        env = os.environ.get("SUG_STACKED_FORWARD")
        if self.model_name == "KPConv":
            stacked = (
                os.environ.get("SUG_KPCONV_STACKED", "1") != "0" or env == "1"
            )
        elif env in ("0", "1"):
            stacked = env == "1"
        else:
            stacked = self.model_name in _STACKED_DEFAULT_ON
        if stacked and self._bn_groups == 1:
            return self._forward_stacked(
                params, batch_stats, data_s, data_t, fps_s, fps_t,
                k_do_s, grl_const, train,
            )

        # KPConv's deformable layers sow fitting/repulsion terms into a
        # 'regularizers' collection (reference p2p_fitting_regularizer added
        # to the loss at train_dg_single_gpu.py:280-282)
        mutable = ["batch_stats", "regularizers"]
        variables = {"params": params, "batch_stats": batch_stats}
        out_s, mut = self.model.apply(
            variables,
            data_s,
            train,
            domain="source",
            fps_start=fps_s,
            rngs={"dropout": k_do_s},
            mutable=mutable,
        )
        reg_s = mut.get("regularizers", {})
        variables = {"params": params, "batch_stats": mut.get("batch_stats", batch_stats)}
        out_t, mut = self.model.apply(
            variables,
            data_t,
            train,
            domain="target",
            grl_constant=grl_const if self._grl else None,
            fps_start=fps_t,
            rngs={"dropout": k_do_t},
            mutable=mutable,
        )
        return out_s, out_t, mut.get("batch_stats", batch_stats), reg_s

    def _forward_stacked(
        self, params, batch_stats, data_s, data_t, fps_s, fps_t, k_do,
        grl_const, train: bool,
    ):
        """Both domains through ONE stacked generator pass (KPConv only —
        see NetMDA._stacked for the legality argument). Splits the stacked
        outputs back into the sequential contract's (out_s, out_t)."""
        B = data_s.shape[0]
        pc = jnp.concatenate([data_s, data_t], axis=0)
        fps = (
            jnp.concatenate([fps_s, fps_t]) if fps_s is not None else None
        )
        out, mut = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            pc,
            train,
            domain="stacked",
            grl_constant=grl_const if self._grl else None,
            fps_start=fps,
            rngs={"dropout": k_do},
            mutable=["batch_stats", "regularizers"],
        )
        # sequential contract: only the SOURCE forward's regularizers feed
        # the loss — slice each sown leaf to the source half
        reg_s = jax.tree.map(lambda v: v[:B], mut.get("regularizers", {}))

        def half(i):
            sl = slice(0, B) if i == 0 else slice(B, 2 * B)
            d = {
                k: out[k][sl]
                for k in ("logits1", "logits2", "sem1", "sem2", "node_flat",
                          "global_feat")
            }
            d["node_offset"] = (
                out["node_offset"][sl] if out["node_offset"] is not None else None
            )
            d["node_attn"] = out["node_attn"] if i == 0 else out["node_attn_t"]
            return d

        return half(0), half(1), mut.get("batch_stats", batch_stats), reg_s

    def _loss(
        self, params, batch_stats, data_s, label_s, data_t, label_t, key, grl_const,
        mmd_on, *, train: bool = True
    ):
        methods = self.cfg["METHODS"]
        out_s, out_t, new_stats, reg_sown = self._forward_both(
            params, batch_stats, data_s, data_t, key, grl_const, train=train
        )

        loss_s1 = self.criterion(out_s["logits1"], label_s)
        loss_s2 = self.criterion(out_s["logits2"], label_s)
        loss_s = 0.5 * loss_s1 + 0.5 * loss_s2

        if self.model_name == "KPConv" and reg_sown:
            from sug_tpu.models.kpconv import p2p_fitting_regularizer

            loss_s = loss_s + p2p_fitting_regularizer(reg_sown)

        adv_weight = float(methods.get("ADV_WEIGHT", 0.0))
        loss_adv = jnp.zeros(())
        if adv_weight > 0:
            loss_adv = -adv_weight * discrepancy(out_t["logits1"], out_t["logits2"])
            loss_s = loss_s + loss_adv

        if float(methods.get("TARGET_LOSS", 0.0)) > 0:
            t_labels = (
                label_s
                if methods.get("TARGET_LOSS_USES_SOURCE_LABELS", False)
                else label_t
            )
            loss_t1 = self.criterion(out_t["logits1"], t_labels)
            loss_t2 = self.criterion(out_t["logits2"], t_labels)
            loss = 0.5 * loss_s + 0.5 * (0.5 * loss_t1 + 0.5 * loss_t2)
        else:
            loss = float(methods.get("SRC_LOSS_WEIGHT", 1.0)) * loss_s

        loss_cls = float(methods.get("CLS_WEIGHT", 1.0)) * loss
        metrics = {"loss_cls": loss_cls, "loss_adv": loss_adv}

        total = loss_cls
        if mmd_on:
            mmd_weight = float(methods["MMD_WEIGHT"])
            geo_cfg = dict(methods["GEO_MMD"][0])
            if geo_cfg["NAME"] == "CL":
                # contrastive alternative (reference builds a
                # CosineEmbeddingLoss criterion, train_dg_single_gpu.py:236-242)
                from sug_tpu.losses.mmd import contrastive_loss_weighted

                geo_align = contrastive_loss_weighted(
                    label_s, out_s["node_attn"], label_t, out_t["node_attn"]
                )
            else:
                geo_align = mmd_cal(
                    label_s,
                    out_s["node_attn"],
                    label_t,
                    out_t["node_attn"],
                    geo_cfg,
                    data_s=data_s,
                    data_t=data_t,
                    num_class=self.num_class,
                )
            loss_geo = mmd_weight * float(geo_cfg.get("GEO_SCALE", 1.0)) * geo_align
            total = total + loss_geo
            metrics["loss_geo"] = loss_geo

            sem_cfg = dict(methods["SEM_MMD"][0])
            if float(sem_cfg.get("SEM_SCALE", 1.0)) > 0:
                sem_scale = float(sem_cfg.get("SEM_SCALE", 1.0))
                if sem_cfg["NAME"] == "CL":
                    from sug_tpu.losses.mmd import contrastive_loss_weighted

                    l1 = sem_scale * contrastive_loss_weighted(
                        label_s, out_s["sem1"], label_t, out_t["sem1"]
                    )
                    l2 = sem_scale * contrastive_loss_weighted(
                        label_s, out_s["sem2"], label_t, out_t["sem2"]
                    )
                else:
                    l1 = sem_scale * mmd_cal(
                        label_s, out_s["sem1"], label_t, out_t["sem1"], sem_cfg,
                        data_s=out_s["logits1"], data_t=out_t["logits1"],
                        num_class=self.num_class,
                    )
                    l2 = sem_scale * mmd_cal(
                        label_s, out_s["sem2"], label_t, out_t["sem2"], sem_cfg,
                        data_s=out_s["logits2"], data_t=out_t["logits2"],
                        num_class=self.num_class,
                    )
                loss_sem = mmd_weight * (0.5 * l1 + 0.5 * l2)
                total = total + loss_sem
                metrics["loss_sem"] = loss_sem

        metrics["loss_total"] = total
        return total, (new_stats, metrics)

    def _train_step(self, state: DGTrainState, batch, key, scalars, mmd_on: bool):
        """One fused step. ``batch`` = (data_s, label_s, data_t, label_t);
        ``scalars`` = (lr_g, lr_c, lr_dis, grl_const)."""
        data_s, label_s, data_t, label_t = batch
        lr_g, lr_c, lr_dis, grl_const = scalars

        if self.augment:
            k_aug_s, k_aug_t, key = jax.random.split(key, 3)
            data_s = augment_batch(k_aug_s, data_s)
            data_t = augment_batch(k_aug_t, data_t)

        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params,
            state.batch_stats,
            data_s,
            label_s,
            data_t,
            label_t,
            key,
            grl_const,
            mmd_on,
        )
        new_params, new_opt = self.optimizer.update(
            grads, state.opt_state, state.params, lr_g, lr_c, lr_dis
        )
        new_state = DGTrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def train_step(
        self,
        state: DGTrainState,
        data_s,
        label_s,
        data_t,
        label_t,
        key,
        lr_g: float,
        lr_c: float,
        lr_dis: float,
        grl_const: float = 0.0,
        mmd_on: bool = True,
    ) -> Tuple[DGTrainState, Dict[str, jax.Array]]:
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
            jnp.asarray(grl_const, jnp.float32),
        )
        from sug_tpu.models import bn as _bn

        _bn.set_bn_groups(self._bn_groups)  # trace-time mailbox (bn.py)
        fn = self._train_step_full if mmd_on else self._train_step_cls
        return fn(state, batch, key, scalars)
