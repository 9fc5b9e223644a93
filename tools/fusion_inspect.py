#!/usr/bin/env python
"""Map profiled fusion.N names to their HLO bodies for one DG train step.

The device trace (tools/profile_step.py) reports anonymous 'fusion.N' ops;
this AOT-compiles the same step and prints each requested fusion's root
expression + operand shapes, so the hot fusions can be attributed to model
code. Compile-only: cheap on the TPU.

Usage: python tools/fusion_inspect.py KPConv 16 fusion.16 fusion.17 ...
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    model = sys.argv[1]
    batch = int(sys.argv[2])
    wanted = set(sys.argv[3:])

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _make_cfg
    from sug_tpu.engine.dg_trainer import DGTrainer

    trainer = DGTrainer(_make_cfg(), model_name=model, augment=True)
    state = trainer.init_state(seed=0, batch_size=batch, num_points=1024)
    rng = np.random.default_rng(0)
    data = tuple(
        jnp.asarray(rng.normal(size=(batch, 1024, 3)), jnp.float32)
        for _ in range(2)
    )
    labels = tuple(
        jnp.asarray(rng.integers(0, 10, batch), jnp.int32) for _ in range(2)
    )
    batch_tuple = (data[0], labels[0], data[1], labels[1])
    scalars = tuple(jnp.asarray(v, jnp.float32) for v in (1e-3, 1e-3, 1e-3, 0.0))
    key = jax.random.key(0)

    compiled = (
        jax.jit(trainer._train_step_full)
        .lower(state, batch_tuple, key, scalars)
        .compile()
    )
    txt = compiled.as_text()
    # fusion bodies: `%fused_computation.N` called by `%fusion.N = ... fusion(...)`
    calls = {}
    for m in re.finditer(r"%?(fusion(?:\.\d+)?) = ([^\n]+)", txt):
        calls[m.group(1)] = m.group(2)
    for name in sorted(wanted):
        line = calls.get(name)
        print(f"\n### {name}:\n  {line[:400] if line else 'NOT FOUND'}")
        if not line:
            continue
        m = re.search(r"calls=%?([\w.\-]+)", line)
        if m:
            body = re.search(
                r"%" + re.escape(m.group(1)) + r" \((.*?)\n}\n", txt, re.S
            )
            if body:
                lines = body.group(1).split("\n")
                print("  body tail:")
                for ln in lines[-12:]:
                    print("   ", ln.strip()[:200])


if __name__ == "__main__":
    main()
