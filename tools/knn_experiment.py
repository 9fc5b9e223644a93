#!/usr/bin/env python
"""kNN top-k strategy shootout on TPU + full-step profile attempt.

Questions:
1. Is approx_max_k(recall_target=1.0) exact w.r.t. lax.top_k neighbor SETS,
   and how fast at each EdgeConv width?
2. Does computing the pairwise distance in bf16 (f32 accum) change the
   neighbor sets, and how much does it save?
3. Where do the DG step's remaining ~250ms go (jax.profiler trace)?
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sug_tpu.ops.geometry import square_distance

B, N, K = 64, 1024, 20


def timed(fn, *args, reps=10, label=""):
    @jax.jit
    def run(*a):
        def body(c, t):
            out = fn(a[0] + c * 0 + t * 1e-6, *a[1:])
            return jnp.sum(out[0].astype(jnp.float32) if isinstance(out, tuple) else out.astype(jnp.float32)) * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(reps, dtype=jnp.float32))
        return c

    out = run(*args)
    _ = float(out)
    t0 = time.perf_counter()
    _ = float(run(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    for C in (3, 64, 128):
        x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)

        def knn_exact(x):
            _, idx = jax.lax.top_k(-square_distance(x, x), K)
            return idx

        def knn_approx(x, recall):
            _, idx = jax.lax.approx_max_k(-square_distance(x, x), K, recall_target=recall)
            return idx

        def knn_bf16(x):
            xb = x.astype(jnp.bfloat16)
            d = -2.0 * jnp.einsum("bnc,bmc->bnm", xb, xb, preferred_element_type=jnp.float32)
            n2 = jnp.sum(x**2, axis=-1)
            d = d + n2[:, :, None] + n2[:, None, :]
            _, idx = jax.lax.approx_max_k(-d, K, recall_target=1.0)
            return idx

        # correctness: neighbor-set equality vs exact
        ie = np.sort(np.asarray(knn_exact(x)), -1)
        for recall in (1.0, 0.95):
            ia = np.sort(np.asarray(jax.jit(lambda x: knn_approx(x, recall))(x)), -1)
            match = float((ie == ia).mean())
            print(f"C={C} approx recall={recall}: set match {match*100:.3f}%", flush=True)
        ib = np.sort(np.asarray(jax.jit(knn_bf16)(x)), -1)
        print(f"C={C} bf16-dist approx@1.0: set match {float((ie == ib).mean())*100:.3f}%", flush=True)

        timed(knn_exact, x, label=f"exact lax.top_k           C={C}")
        timed(lambda x: knn_approx(x, 1.0), x, label=f"approx recall=1.0         C={C}")
        timed(lambda x: knn_approx(x, 0.95), x, label=f"approx recall=0.95        C={C}")
        timed(knn_bf16, x, label=f"bf16 dist + approx@1.0    C={C}")

    # ---- profile the full DG step ------------------------------------
    from sug_tpu.engine.dg_trainer import DGTrainer
    from sug_tpu.utils.config import ConfigDict
    from tests._multihost_common import CFG

    trainer = DGTrainer(ConfigDict(dict(CFG)), model_name="DGCNN", augment=True)
    state = trainer.init_state(seed=0, batch_size=64, num_points=1024)
    data_s = jnp.asarray(rng.normal(size=(64, 1024, 3)), jnp.float32)
    data_t = jnp.asarray(rng.normal(size=(64, 1024, 3)), jnp.float32)
    label_s = jnp.asarray(rng.integers(0, 10, 64), jnp.int32)
    label_t = jnp.asarray(rng.integers(0, 10, 64), jnp.int32)
    bt = (data_s, label_s, data_t, label_t)
    scalars = tuple(jnp.asarray(v, jnp.float32) for v in (1e-3, 1e-3, 1e-3, 0.0))
    key = jax.random.key(0)
    st, m = trainer._train_step_full(state, bt, key, scalars)  # compile
    _ = float(m["loss_total"])
    try:
        with jax.profiler.trace("/tmp/jax_trace"):
            st, m = trainer._train_step_full(state, bt, key, scalars)
            _ = float(m["loss_total"])
        print("profiler trace written to /tmp/jax_trace", flush=True)
    except Exception as e:
        print(f"profiler trace FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
