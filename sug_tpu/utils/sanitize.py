"""Anomaly detection for jitted training steps (opt-in sanitizer layer).

The reference enables ``torch.autograd.set_detect_anomaly(True)`` in its DDP
trainer (train_dg.py:266): every backward op is checked for NaN and the
failing op's forward stack is reported. The XLA equivalent here is
``jax.experimental.checkify`` with ``float_checks``: with
``SUG_DETECT_ANOMALY=1`` every NaN/inf produced by any primitive inside a
checkified step raises ``JaxRuntimeError`` naming the offending primitive and
its source line — forward AND backward, since the whole DG step (augment,
both domain forwards, losses, gradients, optimizer) is one traced program.

Like torch's detect-anomaly, this is a DEBUG mode: the step recompiles with
error plumbing and runs slower. ``user_checks`` are included so library code
can add ``checkify.check`` predicates (shape/finiteness invariants) that are
free when the sanitizer is off.

Notes:
- divide-by-zero masking patterns (``where(c, x/y, 0)``) that INTENTIONALLY
  produce transient non-finite lanes will trip float_checks; run with the
  fused Pallas kernels disabled (``SUG_FUSED_EDGECONV=0``) when checkifying
  on TPU — checkify does not see inside ``pallas_call``.
"""

from __future__ import annotations

import functools
import os

import jax

__all__ = ["detect_anomaly_enabled", "checkify_jit"]


def detect_anomaly_enabled() -> bool:
    """True when SUG_DETECT_ANOMALY=1 — read per call so tests can flip it."""
    return os.environ.get("SUG_DETECT_ANOMALY", "0") == "1"


def checkify_jit(fn, **jit_kwargs):
    """``jax.jit`` a step function, checkified when the sanitizer is on.

    Drop-in for ``jax.jit(fn, **jit_kwargs)`` at step-construction sites.
    When ``SUG_DETECT_ANOMALY=1`` the returned callable raises
    ``jax.experimental.checkify.JaxRuntimeError`` (via ``err.throw()``) on
    the first NaN/inf any primitive in the step produces, naming the
    primitive and source line; otherwise it is exactly ``jax.jit(fn)``.

    ``donate_argnums``/``in_shardings`` pass through unchanged (they index
    inputs). A tree-prefix ``out_shardings`` would not match the checkified
    ``(err, out)`` output structure, so a single broadcastable sharding is
    kept and anything else is dropped for the debug mode.
    """
    if not detect_anomaly_enabled():
        return jax.jit(fn, **jit_kwargs)

    from jax.experimental import checkify

    checked = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.user_checks
    )
    out_sh = jit_kwargs.get("out_shardings")
    if out_sh is not None and isinstance(out_sh, (tuple, list, dict)):
        jit_kwargs = {k: v for k, v in jit_kwargs.items() if k != "out_shardings"}
    jfn = jax.jit(checked, **jit_kwargs)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = jfn(*args, **kwargs)
        err.throw()
        return out

    wrapper._checkified = True
    return wrapper
