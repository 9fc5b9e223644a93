#!/usr/bin/env python
"""A/B the EdgeConv forward kernel modes (SUG_EDGECONV_FWD_MODE=loop|batched)
on fused-block fwd+bwd at flagship shapes — the fast way to decide the
default without a full bench.py run.

The mode is read at TRACE time inside _fwd_pallas, so each (mode, shape)
pair jits a FRESH closure (distinct cache key) after setting the env var.

Run: PYTHONPATH=/root/.axon_site:. python tools/fwd_mode_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sug_tpu.ops.edgeconv_pallas import fused_edgeconv_reduce
    from tools.op_microbench import B, N, timed_scan

    rng = np.random.default_rng(0)
    results = {}
    for F, vb in ((64, False), (256, False), (256, True)):
        xF = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
        uF = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
        vF = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
        for mode in ("loop", "batched"):
            os.environ["SUG_EDGECONV_FWD_MODE"] = mode

            def mk_block(xF=xF, uF=uF, vF=vF, vb=vb):
                def loss(u, v, eps):
                    amax, amin, s1, s2, _ = fused_edgeconv_reduce(
                        xF + eps, u, v, 20, values_bf16=vb
                    )
                    return (
                        jnp.sum(amax - amin)
                        + jnp.sum(s1) * 0.1
                        + jnp.sum(s2) * 0.01
                    )

                g = jax.grad(loss, argnums=(0, 1))

                def body(c, t):
                    du, dv = g(uF + c * 0, vF, t * 1e-7)
                    return jnp.sum(du) * 1e-9 + jnp.sum(dv) * 1e-12, None

                return jnp.zeros(()), body

            tag = f"F={F}{' bf16' if vb else ''} fwd={mode}"
            results[tag] = timed_scan(mk_block, label=f"fused block fwd+bwd {tag}")
    print()
    for F, vb in ((64, False), (256, False), (256, True)):
        base = f"F={F}{' bf16' if vb else ''}"
        lo = results[f"{base} fwd=loop"]
        ba = results[f"{base} fwd=batched"]
        print(f"{base:14s} batched/loop = {ba/lo:.3f}x "
              f"({'batched wins' if ba < lo else 'loop wins'})")


if __name__ == "__main__":
    main()
