#!/usr/bin/env python
"""Measure the PyTorch reference's DG train step on this host's CPU.

The reference publishes no performance numbers (BASELINE.md) and no GPU is
available here, so the strongest measurable baseline is its actual hot loop
(train_dg_single_gpu.py:246-340) on CPU torch: four backbone forwards
(semantic s/t + node s/t), cls + geo-MMD + sem-MMD losses with SDA sample
weights, one backward, three Adam steps. Two shims make it runnable (both
documented in tests/test_torch_parity.py): a torch.cdist chamfer stand-in for
the pip CUDA ext, and cuda->cpu device mapping.

Augmentation is EXCLUDED from the torch number (the reference does it in
dataloader worker processes, overlapped with GPU compute) but INCLUDED in the
sug_tpu step (it is fused into the compiled program) — the comparison is
conservative toward the reference.

Usage:
  python tools/bench_torch_reference.py --impl torch_ref --model DGCNN --batch 16 --iters 3
  JAX_PLATFORMS=cpu python tools/bench_torch_reference.py --impl sug_tpu --model DGCNN ...

Prints one JSON line per run: model, impl, batch, ms/step, clouds/sec.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time
import types

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_ROOT = "/root/reference"


# ---------------------------------------------------------------------- shims
def _install_chamfer_stub():
    import torch

    mod = types.ModuleType("chamfer_distance")

    class ChamferDistance(torch.nn.Module):
        def forward(self, pc1, pc2):
            d2 = torch.cdist(pc1, pc2) ** 2
            dist1, idx1 = d2.min(dim=2)
            dist2, idx2 = d2.min(dim=1)
            return dist1, dist2, idx1, idx2

    mod.ChamferDistance = ChamferDistance
    sys.modules["chamfer_distance"] = mod


@contextlib.contextmanager
def cuda_as_cpu():
    import torch

    orig_to, orig_cuda, orig_arange = torch.Tensor.to, torch.Tensor.cuda, torch.arange

    def fix(a):
        if isinstance(a, (str, torch.device)) and "cuda" in str(a):
            return "cpu"
        return a

    def patched_to(self, *args, **kwargs):
        args = tuple(fix(a) for a in args)
        if kwargs.get("device") is not None:
            kwargs["device"] = fix(kwargs["device"])
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = patched_to
    torch.Tensor.cuda = lambda self, *a, **k: self

    def patched_arange(*args, **kwargs):
        if kwargs.get("device") is not None:
            kwargs["device"] = fix(kwargs["device"])
        return orig_arange(*args, **kwargs)

    torch.arange = patched_arange
    try:
        yield
    finally:
        torch.Tensor.to, torch.Tensor.cuda, torch.arange = orig_to, orig_cuda, orig_arange


CFG = {
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


# ------------------------------------------------------------------ torch ref
def bench_torch_ref(model_name: str, batch: int, n_points: int, warmup: int, iters: int):
    import torch
    import torch.optim as optim

    _install_chamfer_stub()
    sys.path.insert(0, REF_ROOT)
    import model.Model as mM
    import model.mmd as mmd
    from utils.train_utils import discrepancy  # noqa: F401 (parity of imports)

    torch.manual_seed(0)
    with cuda_as_cpu():
        model = mM.Net_MDA(model_name=model_name)
        model.train()
        criterion = torch.nn.CrossEntropyLoss()

        opt_cfg = CFG["OPTIMIZATION"]
        LR, wd, scaler = opt_cfg["LR"], opt_cfg["WEIGHT_DECAY"], opt_cfg["LR_SCALER"]
        params = [{"params": v} for k, v in model.g.named_parameters() if "pred_offset" not in k]
        optimizer_g = optim.Adam(params, lr=LR, weight_decay=wd)
        optimizer_c = optim.Adam(
            [{"params": model.c1.parameters()}, {"params": model.c2.parameters()}],
            lr=LR, weight_decay=wd,
        )
        optimizer_dis = optim.Adam(
            [{"params": model.g.parameters()}, {"params": model.attention_s.parameters()},
             {"params": model.attention_t.parameters()}],
            lr=LR * scaler, weight_decay=wd,
        )

        rng = np.random.default_rng(0)
        data = torch.from_numpy(
            rng.normal(size=(batch, 3, n_points, 1)).astype(np.float32))
        data_t = torch.from_numpy(
            rng.normal(size=(batch, 3, n_points, 1)).astype(np.float32))
        label = torch.from_numpy(rng.integers(0, 10, batch)).long()
        label_t = torch.from_numpy(rng.integers(0, 10, batch)).long()

        methods = CFG["METHODS"]

        def step():
            # hot loop semantics: train_dg_single_gpu.py:246-340 (MMD phase)
            pred_s1, pred_s2, sem_s1, sem_s2 = model(data, semantic_adaption=True)
            pred_t1, pred_t2, sem_t1, sem_t2 = model(data_t, semantic_adaption=True)
            loss_s = 0.5 * criterion(pred_s1, label) + 0.5 * criterion(pred_s2, label)
            loss_t = 0.5 * criterion(pred_t1, label) + 0.5 * criterion(pred_t2, label)
            loss_cls = methods["CLS_WEIGHT"] * (0.5 * loss_s + 0.5 * loss_t)

            feat_node_s = model(data, node_adaptation_s=True)
            feat_node_t = model(data_t, node_adaptation_t=True)
            geo_cfg = methods["GEO_MMD"][0]
            loss_geo = methods["MMD_WEIGHT"] * geo_cfg["GEO_SCALE"] * mmd.mmd_cal(
                label, feat_node_s, label_t, feat_node_t, geo_cfg,
                data_s=data, data_t=data_t)
            sem_cfg = methods["SEM_MMD"][0]
            l1 = sem_cfg["SEM_SCALE"] * mmd.mmd_cal(
                label, sem_s1, label_t, sem_t1, sem_cfg, data_s=pred_s1, data_t=pred_t1)
            l2 = sem_cfg["SEM_SCALE"] * mmd.mmd_cal(
                label, sem_s2, label_t, sem_t2, sem_cfg, data_s=pred_s2, data_t=pred_t2)
            loss_sem = methods["MMD_WEIGHT"] * (0.5 * l1 + 0.5 * l2)

            loss = loss_cls + loss_geo + loss_sem
            loss.backward()
            optimizer_dis.step()
            optimizer_g.step()
            optimizer_c.step()
            optimizer_g.zero_grad()
            optimizer_c.zero_grad()
            optimizer_dis.zero_grad()
            return float(loss.detach())

        for _ in range(warmup):
            step()
        t0 = time.perf_counter()
        for _ in range(iters):
            loss = step()
        dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss)
    return dt


# -------------------------------------------------------------------- sug_tpu
def bench_sug_tpu(model_name: str, batch: int, n_points: int, warmup: int, iters: int):
    sys.path.insert(0, REPO_ROOT)
    import jax

    from sug_tpu.engine.dg_trainer import DGTrainer
    from sug_tpu.utils.config import ConfigDict

    trainer = DGTrainer(ConfigDict(CFG), model_name=model_name, augment=True)
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
            state, data_s, label_s, data_t, label_t, k, 1e-3, 1e-3, 1e-3, mmd_on=True)
        return state, key

    for _ in range(warmup):
        state, key = step(state, key)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, key = step(state, key)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", choices=["torch_ref", "sug_tpu"], required=True)
    ap.add_argument("--model", default="DGCNN")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    fn = bench_torch_ref if args.impl == "torch_ref" else bench_sug_tpu
    dt = fn(args.model, args.batch, args.points, args.warmup, args.iters)
    print(json.dumps({
        "impl": args.impl,
        "model": args.model,
        "batch": args.batch,
        "points": args.points,
        "ms_per_step": round(dt * 1e3, 2),
        "clouds_per_sec": round(2 * args.batch / dt, 2),
        "host": "cpu-1core" if args.impl == "torch_ref" else None,
    }))


if __name__ == "__main__":
    main()
