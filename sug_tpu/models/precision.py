"""Mixed-precision policy for the model compute path.

``PRECISION: bf16`` in the config (or ``SUG_PRECISION=bf16``) switches the
backbone Dense/attention compute to bfloat16 — the v5e MXU's native dtype,
2x HBM bandwidth — while keeping everything precision-critical in float32:

- parameters, gradients, optimizer state (flax ``param_dtype`` stays f32);
- BatchNorm/LayerNorm statistics (flax computes norm stats in f32);
- every neighbor-selection distance computation (kNN / ball query / FPS —
  all consume raw f32 xyz; bf16 distances measurably reorder neighbor sets,
  docs/PERF.md "tried and rejected");
- DGCNN EdgeConv feature-space kNN: the fused kernel's bf16-split passes
  already emulate f32 there, and its block activations stay f32 so the
  next block's neighbor graph is built from unquantized features;
- softmax logits and losses (attention softmax upcast to f32);
- the final classifier logits.

Policy state is process-global and read at TRACE time, so set it before the
first jit of a model (the trainers do this from the config at construction).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

_STATE = {"dtype": None}

_NAMES = {
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "f32": None,
    "fp32": None,
    "float32": None,
    "none": None,
}


def set_compute_dtype(name: Optional[str]) -> None:
    """Set the global activation compute dtype ('bf16' or 'f32'/None)."""
    if name is None:
        _STATE["dtype"] = None
        return
    key = str(name).lower()
    if key not in _NAMES:
        raise ValueError(f"unknown PRECISION {name!r} (use 'bf16' or 'f32')")
    _STATE["dtype"] = _NAMES[key]


def compute_dtype():
    """Current activation dtype for flax modules' ``dtype=``; None = f32.

    Honors the ``SUG_PRECISION`` env override when no explicit policy is set.
    """
    if _STATE["dtype"] is None:
        env = os.environ.get("SUG_PRECISION", "").lower()
        if env in ("bf16", "bfloat16"):
            return jnp.bfloat16
    return _STATE["dtype"]


def configure_from_cfg(cfg) -> None:
    """Read ``PRECISION`` from a config mapping (top level or OPTIMIZATION)."""
    if cfg is None:
        return
    prec = None
    try:
        prec = cfg.get("PRECISION", None)
        if prec is None and "OPTIMIZATION" in cfg:
            prec = cfg["OPTIMIZATION"].get("PRECISION", None)
    except AttributeError:
        return
    if prec is not None:
        set_compute_dtype(prec)
