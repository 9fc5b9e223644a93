"""Shared fixtures for the multi-host data-parallel tests."""

from __future__ import annotations

import numpy as np

GLOBAL_BATCH = 8
N_POINTS = 32
N_STEPS = 3

CFG = {
    "METHODS": {
        "MMD_WEIGHT": 0.5,
        "CLS_WEIGHT": 1.0,
        # 'none' weighting, NOT mean2one: mean2one truncates 1/mean to an int
        # (quirk parity), a step function that amplifies float-order noise
        # into divergent trajectories — too chaotic for a cross-run equality test
        "GEO_MMD": [
            {"NAME": "SOFT_MMD", "LABEL_SCALE": 50, "GEO_WEIGHTS": "none", "GEO_SCALE": 1}
        ],
        "SEM_MMD": [
            {"NAME": "SOFT_MMD", "LABEL_SCALE": 5, "SEM_WEIGHTS": "none",
             "LABEL_WEIGHT": 0.5, "SEM_SCALE": 1}
        ],
        "TARGET_LOSS": 1.0,
        "SRC_LOSS_WEIGHT": 1.0,
        "ADV_WEIGHT": 0.0,
        "PURE_CLS_EPOCH": 0,
        "GRL": False,
    },
    "OPTIMIZATION": {"NUM_EPOCHES": 10, "LR": 1e-3, "LR_SCALER": 1.0, "WEIGHT_DECAY": 5e-4},
}


def make_data(n: int = 40):
    rng = np.random.default_rng(42)
    pts_s = rng.normal(size=(n, N_POINTS, 3)).astype(np.float32)
    lab_s = rng.integers(0, 10, n).astype(np.int64)
    pts_t = rng.normal(size=(n, N_POINTS, 3)).astype(np.float32)
    lab_t = rng.integers(0, 10, n).astype(np.int64)
    return pts_s, lab_s, pts_t, lab_t


def padded_batches(it):
    """Yield FULL-size batches from a drop_last=False BatchIterator, tiling
    a short tail batch up to batch_size (every rank pads identically, so the
    single-process reference can reproduce the exact global batches)."""
    for data, label in it:
        n = data.shape[0]
        if n < it.batch_size:
            reps = -(-it.batch_size // n)
            data = np.concatenate([data] * reps)[: it.batch_size]
            label = np.concatenate([label] * reps)[: it.batch_size]
        yield data, label
