"""Classification losses: focal / class-weighted CE, discrepancy.

Reference: model/model_utils.py:131-176 (focal_loss), data/dataloader.py:272-300
(class weights incl. DLSA), utils/train_utils.py:51-54 (discrepancy).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross entropy with integer labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    gamma: float = 2.0,
    alpha: Optional[jax.Array] = None,
    num_classes: int = 10,
    size_average: bool = True,
) -> jax.Array:
    """Focal loss: ``-alpha_y * (1 - p_y)^gamma * log p_y``.

    gamma=0 degrades to class re-weighting; default alpha is uniform 1/C
    (reference model/model_utils.py:131-176 — note the reference *always*
    multiplies by alpha, so the plain-CE limit carries a 1/C factor).
    """
    if alpha is None:
        alpha = jnp.full((num_classes,), 1.0 / num_classes, dtype=jnp.float32)
    else:
        alpha = jnp.asarray(alpha, dtype=jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    logp_y = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    p_y = jnp.exp(logp_y)
    a_y = alpha[labels]
    loss = -a_y * (1.0 - p_y) ** gamma * logp_y
    return jnp.mean(loss) if size_average else jnp.sum(loss)


def class_weights(
    cls_counts: Sequence[int],
    weighting: str = "number_inverse",
    q: Optional[float] = None,
    adaptive_q: bool = False,
) -> np.ndarray:
    """Per-class alpha weights from training-set class counts (host-side).

    Reference: UnifiedPointDG.cls_wights (data/dataloader.py:272-300).
    - number_inverse: normalized 1/n_c.
    - exp_inverse: normalized exp(-n_c / total).
    - DLSA: normalized n_c^(-q); q from config, or adaptive from the sym-KL
      between the class distribution and uniform.

    Classes with a ZERO training count get weight 0 (and the remaining
    weights renormalize over the present classes). The reference divides by
    the raw count (data/dataloader.py:296), so an absent class yields
    inf -> NaN for EVERY class after normalization — a genuine bug that
    detonates the moment a transfer/eval set contains the missing class.
    Fixed here rather than kept for parity; during training the absent
    class never appears in labels, so the two behave identically wherever
    the reference doesn't NaN.
    """
    counts = np.asarray(cls_counts, dtype=np.float64)
    present = counts > 0
    total = counts.sum()
    C = len(counts)
    safe = np.where(present, counts, 1.0)  # placeholder; masked to 0 below

    def _norm(w: np.ndarray) -> np.ndarray:
        w = np.where(present, w, 0.0)
        return (w / w.sum()).astype(np.float32)

    if weighting == "number_inverse":
        return _norm(1.0 / safe)
    if weighting == "exp_inverse":
        return _norm(np.exp(-counts / total))
    if weighting == "DLSA":
        if adaptive_q or (isinstance(q, str)):
            # sym-KL restricted to present classes (it is infinite otherwise)
            Cp = int(present.sum())
            uni = np.full(Cp, 1.0 / Cp)
            cur = counts[present] / total
            # scipy kl_div semantics incl. the x=0 -> y convention
            kl = lambda x, y: np.where(x > 0, x * np.log(np.where(x > 0, x, 1.0) / y) - x + y, y)
            q_val = float(np.sum(0.5 * kl(cur, uni) + 0.5 * kl(uni, cur)))
        else:
            q_val = 0.4 if q is None else float(q)
        return _norm(safe ** (-q_val))
    return np.full(C, 1.0 / C, dtype=np.float32)


def discrepancy(out1: jax.Array, out2: jax.Array) -> jax.Array:
    """Mean |softmax(out1) - softmax(out2)| — the adversarial two-head term.

    Reference: utils/train_utils.py:51-54.
    """
    return jnp.mean(
        jnp.abs(jax.nn.softmax(out1, axis=-1) - jax.nn.softmax(out2, axis=-1))
    )
