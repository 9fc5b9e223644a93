"""Trace-time analytic FLOP registry (sug_tpu/ops/flops.py): the honest-MFU
fix — XLA cost_analysis reports 0 FLOPs for Pallas custom calls, so bench.py
adds these analytic counts (VERDICT r3 weak #3)."""

import jax
import jax.numpy as jnp
import numpy as np

from sug_tpu.ops import flops


def test_disabled_by_default_and_nested_collectors():
    flops.record("orphan", 123.0)  # no active collector: no-op, no error
    with flops.collect() as outer:
        flops.record("a", 1.0)
        with flops.collect() as inner:
            flops.record("b", 2.0)
        flops.record("a", 3.0)
    assert inner.total() == 2.0
    assert outer.total() == 4.0
    assert outer.by_kernel() == {"a": 4.0}


def test_edgeconv_wrapper_records_at_trace_time():
    from sug_tpu.ops.edgeconv_pallas import fused_edgeconv_reduce

    B, N, C, F, k = 2, 128, 3, 8, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)

    def loss(u, v):
        amax, amin, s1, s2, _ = fused_edgeconv_reduce(
            x, u, v, k=k, interpret=True
        )
        return jnp.sum(amax) + jnp.sum(s2)

    with flops.collect() as fl:
        jax.jit(jax.grad(loss, argnums=(0, 1))).lower(u, v)
    by = fl.by_kernel()
    # padded dims: C -> 128, F -> 128
    Cp = Fp = 128
    assert by["edgeconv_fwd"] == B * N * N * (6.0 * Cp + 2.0 * 2 * Fp * k)
    assert by["edgeconv_bwd"] == 4.0 * 2 * B * N * N * Fp * k
    # nothing recorded outside a collector
    jax.jit(jax.grad(loss, argnums=(0, 1))).lower(u, v)
    assert fl.by_kernel() == by
