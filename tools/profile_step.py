#!/usr/bin/env python
"""Per-op device-time breakdown of one DG train step.

Captures a jax.profiler trace of a single compiled step and sums the XLA-op
durations on the device track, printing the top ops and a category rollup
(sort/gather/scatter/matmul/pallas/elementwise). This is what tells us where
the flat per-step tail lives (docs/PERF.md "Where the time went").

Usage:  python tools/profile_step.py [Pointnet|DGCNN|...] [batch]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(model_name: str, batch: int, n_points: int = 1024):
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _make_cfg
    from sug_tpu.engine.dg_trainer import DGTrainer

    trainer = DGTrainer(_make_cfg(), model_name=model_name, augment=True)
    state = trainer.init_state(seed=0, batch_size=batch, num_points=n_points)
    rng = np.random.default_rng(0)
    data_s = jnp.asarray(rng.normal(size=(batch, n_points, 3)), jnp.float32)
    data_t = jnp.asarray(rng.normal(size=(batch, n_points, 3)), jnp.float32)
    label_s = jnp.asarray(rng.integers(0, 10, batch), jnp.int32)
    label_t = jnp.asarray(rng.integers(0, 10, batch), jnp.int32)
    batch_tuple = (data_s, label_s, data_t, label_t)
    scalars = tuple(jnp.asarray(v, jnp.float32) for v in (1e-3, 1e-3, 1e-3, 0.0))
    key = jax.random.key(0)

    def run():
        st, m = trainer._train_step_full(state, batch_tuple, key, scalars)
        return float(jax.device_get(m["loss_total"]))

    return run


CATEGORIES = (
    ("pallas/fused-kernel", ("edgeconv", "custom-call", "pallas", "tpu_custom_call")),
    ("sort/top-k", ("sort", "top-k", "topk", "partialreduce", "approx")),
    ("gather/scatter", ("gather", "scatter", "dynamic-slice", "dynamic-update")),
    ("matmul/conv", ("dot", "conv", "einsum")),
    ("copy/transpose/reshape", ("copy", "transpose", "reshape", "bitcast", "pad", "concatenate", "slice")),
    ("reduce", ("reduce", "all-reduce")),
    ("rng", ("rng", "threefry")),
)


def categorize(name: str) -> str:
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other(fusions/elementwise)"


def parse_trace(trace_dir: str, top_n: int = 40):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device tracks: pid names containing "TPU" and track names with "XLA Ops"
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_time = defaultdict(float)
    op_count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if "XLA Ops" not in tname and "Steps" not in tname and tname != "":
            # keep only the op-level track when named; unnamed tracks pass
            if "XLA" not in tname:
                continue
        if "XLA Ops" not in tname:
            continue
        dur = float(e.get("dur", 0.0))
        op_time[e["name"]] += dur
        op_count[e["name"]] += 1
        total += dur
    return op_time, op_count, total


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "Pointnet"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    import jax

    run = build_step(model, batch)
    print(f"compiling {model} B={batch}...", flush=True)
    run()  # compile + warm
    run()
    trace_dir = f"/tmp/jax_trace_{model}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        run()
    op_time, op_count, total = parse_trace(trace_dir)
    print(f"\n== {model} B={batch}+{batch}: device op time total {total/1e3:.1f} ms ==")
    cat_time = defaultdict(float)
    for name, t in op_time.items():
        cat_time[categorize(name)] += t
    print("\n-- categories --")
    for cat, t in sorted(cat_time.items(), key=lambda kv: -kv[1]):
        print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  {cat}")
    print("\n-- top ops --")
    for name, t in sorted(op_time.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{t/1e3:9.2f} ms  x{op_count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
