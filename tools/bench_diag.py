#!/usr/bin/env python
"""Diagnose the round-1 bench anomaly (BENCH_r01.json implied >230% MFU).

Three independent measurements on the live backend:

1. A known-FLOPs matmul chain timed with per-call block_until_ready —
   if THIS exceeds the device's peak, host-side timing over the axon
   tunnel is broken and no host-timed number can be trusted.
2. The full DG train step timed the round-1 way (python loop, one final
   block) — reproduces the suspect methodology.
3. The same step iterated K times INSIDE one compiled program
   (lax.scan over the step with threaded state) — one dispatch, one
   result fetch; host timing then bounds true device execution time
   from above. This is the honest number.

Also prints device_kind and the compiled step's cost_analysis() FLOPs so
MFU can be computed against the right peak.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} platform={dev.platform} n={len(jax.devices())}", flush=True)

    # --- 1. known-FLOPs probes ----------------------------------------
    M = 4096
    layers, reps = 8, 10
    a = jnp.ones((M, M), jnp.bfloat16) * 1e-3

    @jax.jit
    def mm(x, a):
        for _ in range(layers):
            x = jnp.tanh(jnp.dot(x, a))
        return x

    flops = 2 * M**3 * layers * reps

    # probe A: identical args every call (dedup-prone), block at end
    x0 = jnp.ones((M, M), jnp.bfloat16)
    mm(x0, a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = mm(x0, a)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"probe A (same args, block end): {dt*1e3:.1f} ms, "
          f"{flops/dt/1e12:.1f} TFLOPS implied", flush=True)

    # probe B: chained args (every call distinct), block at end
    t0 = time.perf_counter()
    x = x0
    for _ in range(reps):
        x = mm(x, a)
    x.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"probe B (chained, block end): {dt*1e3:.1f} ms, "
          f"{flops/dt/1e12:.1f} TFLOPS implied", flush=True)

    # probe C: chained + full host fetch of the result
    t0 = time.perf_counter()
    x = x0
    for _ in range(reps):
        x = mm(x, a)
    _ = np.asarray(x)
    dt = time.perf_counter() - t0
    print(f"probe C (chained + device_get): {dt*1e3:.1f} ms, "
          f"{flops/dt/1e12:.1f} TFLOPS implied", flush=True)

    # probe D: one dispatch, scan on device, then fetch
    @jax.jit
    def mm_scan(x, a):
        def body(x, _):
            for _ in range(layers):
                x = jnp.tanh(jnp.dot(x, a))
            return x, ()
        x, _ = jax.lax.scan(body, x, None, length=reps)
        return x

    _ = np.asarray(mm_scan(x0, a)[0, :1])  # compile + warm
    xb = (x0 * 0.5).block_until_ready()  # distinct input so a dedup cache can't hit
    t0 = time.perf_counter()
    _ = np.asarray(mm_scan(xb, a)[0, :1])
    dt = time.perf_counter() - t0
    print(f"probe D (on-device scan + fetch): {dt*1e3:.1f} ms, "
          f"{flops/dt/1e12:.1f} TFLOPS implied", flush=True)

    # --- build the DG step (same cfg as bench.py) ---------------------
    from sug_tpu.engine.dg_trainer import DGTrainer
    from sug_tpu.utils.config import ConfigDict

    cfg = ConfigDict(
        {
            "METHODS": {
                "MMD_WEIGHT": 0.5,
                "CLS_WEIGHT": 1.0,
                "GEO_MMD": [
                    {"NAME": "SOFT_MMD", "LABEL_SCALE": 50, "GEO_WEIGHTS": "mean2one", "GEO_SCALE": 1}
                ],
                "SEM_MMD": [
                    {"NAME": "SOFT_MMD", "LABEL_SCALE": 5, "SEM_WEIGHTS": "mean2one",
                     "LABEL_WEIGHT": 0.5, "SEM_SCALE": 1}
                ],
                "TARGET_LOSS": 1.0,
                "SRC_LOSS_WEIGHT": 1.0,
                "ADV_WEIGHT": 0.0,
                "PURE_CLS_EPOCH": 0,
                "GRL": False,
            },
            "OPTIMIZATION": {"NUM_EPOCHES": 200, "LR": 1e-3, "LR_SCALER": 1.0, "WEIGHT_DECAY": 5e-5},
        }
    )
    batch, n_points = 64, 1024
    trainer = DGTrainer(cfg, model_name="DGCNN", augment=True)
    state = trainer.init_state(seed=0, batch_size=batch, num_points=n_points)

    rng = np.random.default_rng(0)
    data_s = jnp.asarray(rng.normal(size=(batch, n_points, 3)), jnp.float32)
    data_t = jnp.asarray(rng.normal(size=(batch, n_points, 3)), jnp.float32)
    label_s = jnp.asarray(rng.integers(0, 10, batch), jnp.int32)
    label_t = jnp.asarray(rng.integers(0, 10, batch), jnp.int32)
    batch_tuple = (data_s, label_s, data_t, label_t)
    scalars = tuple(jnp.asarray(v, jnp.float32) for v in (1e-3, 1e-3, 1e-3, 0.0))
    key = jax.random.key(0)

    step_fn = trainer._train_step_full

    # cost analysis of the compiled step
    lowered = step_fn.lower(state, batch_tuple, key, scalars)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    step_flops = float(ca.get("flops", -1.0))
    print(f"cost_analysis flops/step: {step_flops/1e12:.3f} TFLOP", flush=True)

    # warm
    for _ in range(3):
        state, metrics = step_fn(state, batch_tuple, key, scalars)
    jax.block_until_ready(state)

    # --- 2. round-1 methodology ---------------------------------------
    iters = 30
    t0 = time.perf_counter()
    s = state
    for _ in range(iters):
        s, metrics = step_fn(s, batch_tuple, key, scalars)
    jax.tree.leaves(s.params)[0].block_until_ready()
    dt_loop = (time.perf_counter() - t0) / iters
    print(f"py-loop (r1 method): {dt_loop*1e3:.2f} ms/step -> "
          f"{step_flops/dt_loop/1e12:.1f} TFLOPS implied", flush=True)

    # same but blocking the FULL state each step
    t0 = time.perf_counter()
    s = state
    for _ in range(iters):
        s, metrics = step_fn(s, batch_tuple, key, scalars)
        jax.block_until_ready(s)
    dt_block = (time.perf_counter() - t0) / iters
    print(f"py-loop (block each): {dt_block*1e3:.2f} ms/step -> "
          f"{step_flops/dt_block/1e12:.1f} TFLOPS implied", flush=True)

    # --- 3. on-device scan of K steps ---------------------------------
    K = 20

    @jax.jit
    def multi_step(state, batch_tuple, key, scalars):
        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            st, m = trainer._train_step(st, batch_tuple, sub, scalars, mmd_on=True)
            return (st, k), m["loss_total"]

        (state, _), losses = jax.lax.scan(body, (state, key), None, length=K)
        return state, losses

    st, losses = multi_step(state, batch_tuple, key, scalars)
    jax.block_until_ready((st, losses))
    t0 = time.perf_counter()
    st, losses = multi_step(state, batch_tuple, key, scalars)
    jax.block_until_ready((st, losses))
    dt_scan = (time.perf_counter() - t0) / K
    print(f"on-device scan x{K}: {dt_scan*1e3:.2f} ms/step -> "
          f"{step_flops/dt_scan/1e12:.1f} TFLOPS implied", flush=True)
    print(f"losses finite: {bool(np.isfinite(np.asarray(losses)).all())}", flush=True)

    tput = 2 * batch / dt_scan
    print(f"honest throughput: {tput:.0f} clouds/sec/chip "
          f"({2*batch} clouds / {dt_scan*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
