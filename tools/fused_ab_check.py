#!/usr/bin/env python
"""A/B check: 10 DG training steps with the fused EdgeConv kernel vs the XLA
reference path (SUG_FUSED_EDGECONV=0), same seed and data.

Expect trajectories to track closely; exact equality is impossible because
the two paths round distances differently, flipping ~0.1% near-tie neighbors
(docs/PERF.md). Divergence beyond a few percent would indicate an
integration bug. The fused/unfused paths are spawned as subprocesses because
the flag is read at trace time.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, numpy as np, jax, jax.numpy as jnp
from sug_tpu.engine.dg_trainer import DGTrainer
from sug_tpu.utils.config import ConfigDict
from tests._multihost_common import CFG

trainer = DGTrainer(ConfigDict(dict(CFG)), model_name="DGCNN", augment=True)
state = trainer.init_state(seed=0, batch_size=16, num_points=1024)
rng = np.random.default_rng(0)
ds = jnp.asarray(rng.normal(size=(16,1024,3)), jnp.float32)
dt = jnp.asarray(rng.normal(size=(16,1024,3)), jnp.float32)
ls = jnp.asarray(rng.integers(0,10,16), jnp.int32)
lt = jnp.asarray(rng.integers(0,10,16), jnp.int32)
key = jax.random.key(0)
losses = []
for i in range(10):
    key, k = jax.random.split(key)
    state, m = trainer.train_step(state, ds, ls, dt, lt, k, 1e-3, 1e-3, 1e-3, mmd_on=True)
    losses.append(float(m["loss_total"]))
print("RESULT " + json.dumps(losses), flush=True)
"""


def run(fused: bool):
    env = dict(os.environ)
    env["SUG_FUSED_EDGECONV"] = "1" if fused else "0"
    env["PYTHONPATH"] = env.get("PYTHONPATH", "") + os.pathsep + REPO
    out = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, timeout=2400,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert lines, f"child failed:\n{out.stdout[-3000:]}"
    return json.loads(lines[-1][7:])


def main():
    fused = run(True)
    unfused = run(False)
    rel = np.abs(np.array(fused) - np.array(unfused)) / np.abs(np.array(unfused))
    print(json.dumps({
        "fused": [round(x, 4) for x in fused],
        "unfused": [round(x, 4) for x in unfused],
        "max_rel_diff": round(float(rel.max()), 5),
        "ok": bool(rel.max() < 0.05),
    }))


if __name__ == "__main__":
    main()
