"""Evaluation: jitted batch metrics + host aggregation.

Reference: utils/eval_utils.py:5-88 — DG models are evaluated with the
two-head ensemble ``(pred1 + pred2) / 2`` (:43-44), overall + per-class
accuracy, best-accuracy tracking across epochs.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sug_tpu.losses.classification import cross_entropy


class Evaluator:
    """Compiled eval step over a model apply function.

    ``apply_fn(params, batch_stats, data) -> logits`` must already ensemble
    heads if applicable.
    """

    def __init__(
        self, apply_fn: Callable, num_class: int = 10, criterion=None, sharding=None
    ):
        self.num_class = num_class
        # The eval loss is the CONFIGURED criterion's loss (the reference logs
        # criterion(pred, label) at utils/eval_utils.py:46 — focal loss when
        # FocalLoss is configured, not plain CE). Pad masking is kept exact by
        # evaluating the criterion per sample (vmap over singleton batches;
        # every supported criterion is a mean of per-sample terms).
        self.criterion = criterion or cross_entropy
        # multi-host: eval batches are identical on every process; placing
        # them with a replicated sharding makes the eval step a global
        # computation compatible with globally-sharded params
        self.sharding = sharding
        self._step = jax.jit(functools.partial(self._eval_step, apply_fn))

    def _eval_step(self, apply_fn, params, batch_stats, data, label, valid):
        """``valid`` masks pad rows — the final batch is zero-padded to the
        loader's batch size so every eval batch compiles to ONE program
        instead of one per tail size."""
        logits = apply_fn(params, batch_stats, data)
        per_sample = jax.vmap(
            lambda lg, lb: self.criterion(lg[None], lb[None])
        )(logits, label)
        loss_sum = jnp.sum(per_sample * valid)
        pred = jnp.argmax(logits, axis=-1)
        correct = (pred == label).astype(jnp.float32) * valid
        onehot = jax.nn.one_hot(label, self.num_class) * valid[:, None]
        cls_correct = jnp.sum(onehot * correct[:, None], axis=0)
        cls_count = jnp.sum(onehot, axis=0)
        return {
            "loss_sum": loss_sum,
            "correct": jnp.sum(correct),
            "count": jnp.sum(valid),
            "cls_correct": cls_correct,
            "cls_count": cls_count,
        }

    def run(self, params, batch_stats, batches) -> Dict[str, float]:
        pending = []
        pad_to = None
        for data, label in batches:
            data = np.asarray(data)
            label = np.asarray(label)
            if pad_to is None:
                pad_to = data.shape[0]
            n = data.shape[0]
            valid = np.ones(pad_to, dtype=np.float32)
            if n < pad_to:
                pad = pad_to - n
                data = np.concatenate([data, np.zeros((pad,) + data.shape[1:], data.dtype)])
                label = np.concatenate([label, np.zeros(pad, label.dtype)])
                valid[n:] = 0.0
            arrs = (data, label.astype(np.int32), valid)
            if self.sharding is not None:
                arrs = tuple(jax.device_put(a, self.sharding) for a in arrs)
            else:
                arrs = tuple(jnp.asarray(a) for a in arrs)
            pending.append(self._step(params, batch_stats, *arrs))
        if not pending:
            raise ValueError("empty eval loader")
        totals = None
        for m in jax.device_get(pending):  # one batched host transfer
            totals = m if totals is None else jax.tree.map(np.add, totals, m)
        acc = float(totals["correct"] / totals["count"])
        cls_acc = totals["cls_correct"] / np.maximum(totals["cls_count"], 1.0)
        return {
            "overall_acc": acc,
            "avg_loss": float(totals["loss_sum"] / totals["count"]),
            "class_acc": cls_acc,
            "mean_class_acc": float(cls_acc[totals["cls_count"] > 0].mean()),
        }


def eval_worker(eval_dict: Dict, logger) -> Dict:
    """Reference-parity eval worker (utils/eval_utils.py:5-88): evaluates one
    test loader, updates the best-accuracy tracker, logs per-class accuracy
    when ``cls_eval``."""
    evaluator: Evaluator = eval_dict["evaluator"]
    result = evaluator.run(
        eval_dict["params"], eval_dict["batch_stats"], eval_dict["dataloader"]
    )
    dataset = eval_dict["dataset"]
    epoch = eval_dict["epoch"]
    best_target_acc = eval_dict["best_target_acc"]
    best_target_acc_epoch = eval_dict["best_target_acc_epoch"]

    logger.info(f"Current eval on: {dataset} {eval_dict['dataset_name']}")
    pred_acc = result["overall_acc"]
    if pred_acc > best_target_acc:
        best_target_acc = pred_acc
        best_target_acc_epoch = epoch
    logger.info(
        f"On dataset {dataset} :{epoch} [overall_acc: {pred_acc} Best Tar Acc: "
        f"{best_target_acc} on Source Train Epoch {best_target_acc_epoch}]"
    )
    if eval_dict.get("cls_eval", False):
        logger.info(f"Cls-wise eval: {result['class_acc']}")
        logger.info(
            f"compared eval: {pred_acc} and avg: {result['mean_class_acc']}"
        )
    return {
        "dataset": dataset,
        "epoch": epoch,
        "best_target_acc": best_target_acc,
        "best_target_acc_epoch": best_target_acc_epoch,
        "cur_target_acc": pred_acc,
    }
