"""Source-only baseline trainer: single classifier, Adam + cosine, CE.

Reference: train_source.py — standalone backbone selected by ``cfg.Model``
(:74-83), plain CrossEntropy, Adam(LR, wd) with CosineAnnealingLR, zero-shot
eval on the two unseen datasets each epoch. Source dataset uses the
training-time augmentation (z-rotation + jitter), which here runs on-device
inside the jitted step.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from sug_tpu.losses.classification import cross_entropy
from sug_tpu.models import make_classifier
from sug_tpu.ops.augment import augment_batch
from sug_tpu.parallel.mesh import batch_sharding, replicated_sharding


@flax.struct.dataclass
class SourceTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


class SourceTrainer:
    def __init__(
        self,
        model_name: str = "Pointnet",
        num_class: int = 10,
        weight_decay: float = 5e-4,
        criterion=None,
        mesh=None,
        augment: bool = True,
        donate: bool = False,
    ):
        self.model = make_classifier(model_name, num_class)
        # snapshot whatever BN semantics the caller configured (source_loop
        # runs bn.configure_from_cfg before constructing the trainer);
        # init_state/train_step re-assert it around tracing (bn.py docstring)
        from sug_tpu.models import bn as _bn

        self._bn_groups = _bn.bn_groups()
        self.model_name = model_name
        self.num_class = num_class
        self.criterion = criterion or cross_entropy
        self.mesh = mesh
        self.augment = augment
        # torch-style Adam with L2-into-grad weight decay; LR is a traced
        # per-step scalar following the host-side cosine schedule.
        self._tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )
        jit_kwargs = {}
        if mesh is not None:
            rep = replicated_sharding(mesh)
            bsh = batch_sharding(mesh)
            jit_kwargs = dict(
                in_shardings=(rep, bsh, bsh, rep, rep), out_shardings=rep
            )
        if donate:
            # alias the state buffers into the step outputs (HBM headroom)
            jit_kwargs["donate_argnums"] = (0,)
        from sug_tpu.utils.sanitize import checkify_jit

        self._train_step = checkify_jit(self._step, **jit_kwargs)

    def init_state(self, seed: int, batch_size: int, num_points: int) -> SourceTrainState:
        from sug_tpu.models import bn as _bn

        _bn.set_bn_groups(self._bn_groups)
        dummy = jnp.zeros((batch_size, num_points, 3), dtype=jnp.float32)
        variables = self.model.init(
            {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
            dummy,
            True,
        )
        params = variables["params"]
        state = SourceTrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self._tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            state = jax.device_put(state, replicated_sharding(self.mesh))
        return state

    def _step(self, state: SourceTrainState, data, label, key, lr):
        if self.augment:
            k_aug, key = jax.random.split(key)
            data = augment_batch(k_aug, data)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (logits, _), mut = self.model.apply(
                variables,
                data,
                True,
                rngs={"dropout": key},
                mutable=["batch_stats", "regularizers"],
            )
            loss = self.criterion(logits, label)
            if self.model_name == "KPConv" and mut.get("regularizers"):
                # deformable KPConv fitting/repulsion terms
                # (reference train_source.py:122-124)
                from sug_tpu.models.kpconv import p2p_fitting_regularizer

                loss = loss + p2p_fitting_regularizer(mut["regularizers"])
            return loss, (mut["batch_stats"], logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = self._tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == label).astype(jnp.float32))
        return (
            SourceTrainState(new_params, new_stats, new_opt, state.step + 1),
            {"loss": loss, "acc": acc},
        )

    def train_step(
        self, state, data, label, key, lr: float
    ) -> Tuple[SourceTrainState, Dict[str, jax.Array]]:
        from sug_tpu.models import bn as _bn

        _bn.set_bn_groups(self._bn_groups)  # trace-time mailbox (bn.py)
        return self._train_step(
            state,
            jnp.asarray(data),
            jnp.asarray(label, dtype=jnp.int32),
            key,
            jnp.asarray(lr, jnp.float32),
        )

    def eval_apply(self, params, batch_stats, data):
        """Eval-mode logits for the Evaluator (no ensemble — single head)."""
        logits, _ = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, data, False
        )
        return logits
