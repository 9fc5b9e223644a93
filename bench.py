#!/usr/bin/env python
"""Benchmark: full SUG DG train-step throughput in clouds/sec/chip.

Measures the flagship config — DGCNN backbone, B=64 source + 64 target
1024-pt clouds per step, full MSA/SDA loss stack (geo+sem soft-MMD with
chamfer/KL sample weights), on-device augmentation, fused 3-group optimizer —
i.e. everything the reference does per step (train_dg_single_gpu.py hot loop)
in one compiled program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline: ratio against the value stored in BENCH_BASELINE.json (a
measured PyTorch-reference throughput, when available). The reference repo
publishes no numbers (BASELINE.md), so when no measured baseline exists the
field reports the ratio against this repo's first recorded bench
(BENCH_r1.json) or 1.0.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def measure(model_name: str = "DGCNN", batch: int = 64, n_points: int = 1024,
            warmup: int = 5, iters: int = 30) -> float:
    import jax

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

    trainer = DGTrainer(cfg, model_name=model_name, augment=True)
    state = trainer.init_state(seed=0, batch_size=batch, num_points=n_points)

    rng = np.random.default_rng(0)
    data_s = np.asarray(rng.normal(size=(batch, n_points, 3)), np.float32)
    data_t = np.asarray(rng.normal(size=(batch, n_points, 3)), np.float32)
    label_s = rng.integers(0, 10, batch).astype(np.int32)
    label_t = rng.integers(0, 10, batch).astype(np.int32)

    key = jax.random.key(0)

    def step(state, key):
        key, k = jax.random.split(key)
        state, metrics = trainer.train_step(
            state, data_s, label_s, data_t, label_t, k, 1e-3, 1e-3, 1e-3, mmd_on=True
        )
        return state, key, metrics

    for _ in range(warmup):
        state, key, metrics = step(state, key)
    jax.tree.leaves(state.params)[0].block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        state, key, metrics = step(state, key)
    jax.tree.leaves(state.params)[0].block_until_ready()
    dt = time.perf_counter() - t0

    clouds_per_step = 2 * batch  # source + target-split clouds consumed
    n_chips = 1  # bench runs single-chip
    return clouds_per_step * iters / dt / n_chips


def main():
    import sys

    if "--all" in sys.argv:
        # side table for humans (stderr); the JSON line below stays canonical.
        # Batch sizes follow the reference training recipes (BASELINE.md):
        # PTran's (B, N, k, 512) attention intermediates cap its batch ~32.
        for model, batch in (
            ("Pointnet", 64), ("Pointnet2", 64), ("DGCNN", 64),
            ("PTran", 32), ("KPConv", 16),
        ):
            v = measure(model_name=model, batch=batch)
            print(f"{model} (B={batch}+{batch}): {v:.0f} clouds/sec/chip", file=sys.stderr)
    value = measure()
    baseline = None
    for cand in ("BENCH_BASELINE.json", "BENCH_r1.json"):
        if os.path.exists(cand):
            try:
                with open(cand) as f:
                    baseline = float(json.load(f)["value"])
                break
            except Exception:
                pass
    vs = value / baseline if baseline else 1.0
    print(
        json.dumps(
            {
                "metric": "dg_train_step_throughput (DGCNN, 1024 pts, B=64+64, full MSA/SDA loss)",
                "value": round(value, 2),
                "unit": "clouds/sec/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
