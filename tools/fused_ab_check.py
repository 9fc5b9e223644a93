#!/usr/bin/env python
"""A/B check: 10 DG training steps with a fused Pallas path vs its XLA
reference path, same seed and data.

Modes:
  --kernel edgeconv (default): DGCNN step, SUG_FUSED_EDGECONV 1 vs 0.
  --kernel vecattn: PTran step under the bf16 policy (the configuration the
    fused vector-attention kernel serves), SUG_FUSED_VECATTN 1 vs 0.

Expect trajectories to track closely; exact equality is impossible because
the paths round distances/matmuls differently, flipping ~0.1% near-tie
neighbors (docs/PERF.md) and (vecattn) rounding per-edge matmuls to bf16 in
a different association order. Divergence beyond a few percent would
indicate an integration bug. The two paths are spawned as subprocesses
because the flags are read at trace time.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, numpy as np, jax, jax.numpy as jnp
MODEL = "%(model)s"
if %(bf16)d:
    from sug_tpu.models.precision import set_compute_dtype
    set_compute_dtype("bf16")
from sug_tpu.engine.dg_trainer import DGTrainer
from sug_tpu.utils.config import ConfigDict
from tests._multihost_common import CFG

trainer = DGTrainer(ConfigDict(dict(CFG)), model_name=MODEL, augment=True)
state = trainer.init_state(seed=0, batch_size=%(batch)d, num_points=1024)
rng = np.random.default_rng(0)
ds = jnp.asarray(rng.normal(size=(%(batch)d,1024,3)), jnp.float32)
dt = jnp.asarray(rng.normal(size=(%(batch)d,1024,3)), jnp.float32)
ls = jnp.asarray(rng.integers(0,10,%(batch)d), jnp.int32)
lt = jnp.asarray(rng.integers(0,10,%(batch)d), jnp.int32)
key = jax.random.key(0)
losses = []
for i in range(10):
    key, k = jax.random.split(key)
    state, m = trainer.train_step(state, ds, ls, dt, lt, k, 1e-3, 1e-3, 1e-3, mmd_on=True)
    losses.append(float(m["loss_total"]))
print("RESULT " + json.dumps(losses), flush=True)
"""

KERNELS = {
    "edgeconv": {"model": "DGCNN", "flag": "SUG_FUSED_EDGECONV", "batch": 16,
                 "bf16": 0},
    "vecattn": {"model": "PTran", "flag": "SUG_FUSED_VECATTN", "batch": 8,
                "bf16": 1},
}


def run(spec: dict, fused: bool) -> list:
    env = dict(os.environ)
    env[spec["flag"]] = "1" if fused else "0"
    env["PYTHONPATH"] = env.get("PYTHONPATH", "") + os.pathsep + REPO
    out = subprocess.run(
        [sys.executable, "-c", CHILD % spec], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, timeout=2400,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert lines, f"child failed:\n{out.stdout[-3000:]}"
    return json.loads(lines[-1][7:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", choices=sorted(KERNELS), default="edgeconv")
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()
    spec = dict(KERNELS[args.kernel])
    if args.batch:
        spec["batch"] = args.batch
    fused = run(spec, True)
    unfused = run(spec, False)
    rel = np.abs(np.array(fused) - np.array(unfused)) / np.abs(np.array(unfused))
    print(json.dumps({
        "kernel": args.kernel,
        "fused": [round(x, 4) for x in fused],
        "unfused": [round(x, 4) for x in unfused],
        "max_rel_diff": round(float(rel.max()), 5),
        "ok": bool(rel.max() < 0.05),
    }))


if __name__ == "__main__":
    main()
