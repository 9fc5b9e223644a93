#!/usr/bin/env python
"""Benchmark: full SUG DG train-step throughput in clouds/sec/chip.

Measures the flagship config — DGCNN backbone, B=64 source + 64 target
1024-pt clouds per step, full MSA/SDA loss stack (geo+sem soft-MMD with
chamfer/KL sample weights), on-device augmentation, fused 3-group optimizer —
i.e. everything the reference does per step (train_dg_single_gpu.py hot loop)
in one compiled program.

Methodology (see docs/PERF.md "Measurement methodology"): the K steps being
timed run INSIDE one compiled ``lax.scan`` with the train state threaded
through, and the timer stops only after a scalar from the final state is
fetched to the host. Host-side ``block_until_ready`` timing is NOT used: over
this dev box's remote-TPU tunnel it returns without waiting (measured
~26,000 "TFLOPS" on a known-FLOPs probe, tools/bench_diag.py), which is what
made the round-1 numbers physically impossible. The scan+fetch number is an
upper bound on true device time (it includes one tunnel round trip, amortized
over K steps).

Sanity: the compiled step's cost_analysis() FLOPs give an implied TFLOP/s and
MFU versus the chip's bf16 peak; the script REFUSES to print a throughput
whose implied MFU exceeds 100%.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline: ratio against BENCH_BASELINE.json (the measured PyTorch
reference, tools/bench_torch_reference.py) when present, else against the
earliest recorded BENCH_r*.json, else 1.0.
"""

from __future__ import annotations

import glob
import json
import os
import re
import time

import numpy as np

# bf16 MXU peak by device_kind substring; used only for the MFU sanity gate.
PEAK_FLOPS = {
    "v5 lite": 197e12,  # TPU v5e
    "v5e": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6 lite": 918e12,  # Trillium
}


class MethodologyError(RuntimeError):
    """The timing itself is broken (impossible MFU) — never retried."""


def _device_peak():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in PEAK_FLOPS.items():
        if sub in kind:
            return peak
    return None


def _make_cfg():
    from sug_tpu.utils.config import ConfigDict

    return ConfigDict(
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


def measure(model_name: str = "DGCNN", batch: int = 64, n_points: int = 1024,
            scan_steps: int = 20) -> dict:
    """Returns {'ms_per_step', 'clouds_per_sec', 'flops_per_step', 'tflops',
    'mfu_pct'} for one compiled DG train step."""
    import jax
    import jax.numpy as jnp

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

    # FLOPs of ONE compiled step (for the MFU sanity gate)
    compiled = trainer._train_step_full.lower(state, batch_tuple, key, scalars).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_per_step = float(ca.get("flops", 0.0)) if ca else 0.0

    @jax.jit
    def multi_step(state, batch_tuple, key, scalars):
        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            st, m = trainer._train_step(st, batch_tuple, sub, scalars, mmd_on=True)
            return (st, k), m["loss_total"]

        (state, _), losses = jax.lax.scan(body, (state, key), None, length=scan_steps)
        return state, losses

    st, losses = multi_step(state, batch_tuple, key, scalars)  # compile + warm
    assert np.isfinite(np.asarray(losses)).all(), "non-finite loss in warmup"
    # best of two timed scans: the axon tunnel occasionally stalls a whole
    # run ~2x (observed 543 ms for a step that reproduces at 242 ms); the
    # min of independent scans is robust to such one-off congestion.
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        st, losses = multi_step(state, batch_tuple, key, scalars)
        _ = float(losses[-1])  # fetch forces completion of the whole scan
        dt = min(dt, (time.perf_counter() - t0) / scan_steps)

    tflops = flops_per_step / dt / 1e12 if flops_per_step else 0.0
    peak = _device_peak()
    mfu = 100.0 * tflops * 1e12 / peak if peak else None
    if mfu is not None and mfu > 100.0:
        raise MethodologyError(
            f"implied MFU {mfu:.0f}% > 100% — timing is broken "
            f"({dt*1e3:.2f} ms/step for {flops_per_step/1e12:.2f} TFLOP); "
            "refusing to report a physically impossible throughput"
        )
    return {
        "ms_per_step": dt * 1e3,
        "clouds_per_sec": 2 * batch / dt,
        "flops_per_step": flops_per_step,
        "tflops": tflops,
        "mfu_pct": mfu,
    }


def _load_baseline():
    """Measured torch-reference baseline (BENCH_BASELINE.json, produced from
    tools/bench_torch_reference.py runs), else prior-round bench values.

    Round 1 (BENCH_r01.json) is EXCLUDED: its 32,965 clouds/sec implies >230%
    MFU — it measured dispatch rate, not execution (docs/PERF.md), and
    comparing against a physically impossible number would be meaningless.
    """
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            with open("BENCH_BASELINE.json") as f:
                d = json.load(f)
            return float(d["value"]), d.get("note", "measured torch reference")
        except Exception:
            pass
    rounds = sorted(
        glob.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r0*(\d+)", p).group(1)),
    )
    for cand in rounds:
        n = int(re.search(r"r0*(\d+)", cand).group(1))
        if n < 2:
            continue
        try:
            with open(cand) as f:
                d = json.load(f)
            value = d["parsed"]["value"] if "parsed" in d else d["value"]
            return float(value), f"prior round {cand}"
        except Exception:
            continue
    return None, None


def measure_with_retry(attempts: int = 3, wait_s: float = 120.0, **kw) -> dict:
    """The axon remote-compile tunnel occasionally drops mid-run (observed:
    'Connection refused' on /remote_compile after 40 min of benching) and
    usually comes back; retry transient runtime failures so a one-off outage
    doesn't zero out a round's benchmark artifact."""
    import sys

    last = None
    for i in range(attempts):
        try:
            return measure(**kw)
        except MethodologyError:
            raise  # the MFU sanity gate — never retry a methodology failure
        except Exception as e:  # noqa: BLE001 — tunnel/runtime errors
            last = e
            print(f"measure attempt {i+1}/{attempts} failed: {e}", file=sys.stderr)
            if i + 1 < attempts:
                time.sleep(wait_s)
    raise last


def main():
    import sys

    if "--all" in sys.argv:
        # side table for humans (stderr); the JSON line below stays canonical.
        # Batch sizes follow the reference training recipes (BASELINE.md).
        for model, batch in (
            ("Pointnet", 64), ("Pointnet2", 64), ("DGCNN", 64),
            ("PTran", 32), ("KPConv", 16),
        ):
            r = measure_with_retry(model_name=model, batch=batch)
            mfu = f", {r['mfu_pct']:.1f}% MFU" if r["mfu_pct"] is not None else ""
            print(
                f"{model} (B={batch}+{batch}): {r['clouds_per_sec']:.0f} clouds/sec/chip "
                f"({r['ms_per_step']:.1f} ms/step, {r['tflops']:.1f} TFLOP/s{mfu})",
                file=sys.stderr,
            )
    r32 = measure_with_retry()
    # HEADLINE = the PRECISION: bf16 mixed-precision configuration (same
    # model/losses; backbone compute in bf16, f32 params/BN-stats/neighbor-
    # selection/softmax/losses, bf16 value gathers + fused attention in the
    # Pallas kernels). This is the production training configuration:
    # accuracy parity vs f32 is A/B-validated (docs/PERF.md "bf16 accuracy
    # A/B", docs/VALIDATION.md) — the f32 numbers stay as secondary fields.
    from sug_tpu.models.precision import set_compute_dtype

    try:
        set_compute_dtype("bf16")
        r = measure_with_retry()
        extra = {
            "f32_clouds_per_sec": round(r32["clouds_per_sec"], 2),
            "f32_ms_per_step": round(r32["ms_per_step"], 2),
        }
        tag = ", bf16 policy"
    except Exception:
        r, extra, tag = r32, {}, ""
    finally:
        try:
            set_compute_dtype(None)
        except Exception:
            pass
    baseline, note = _load_baseline()
    vs = r["clouds_per_sec"] / baseline if baseline else 1.0

    print(
        json.dumps(
            {
                "metric": "dg_train_step_throughput (DGCNN, 1024 pts, B=64+64, "
                          f"full MSA/SDA loss{tag})",
                "value": round(r["clouds_per_sec"], 2),
                "unit": "clouds/sec/chip",
                "vs_baseline": round(vs, 3),
                "ms_per_step": round(r["ms_per_step"], 2),
                "step_tflop": round(r["flops_per_step"] / 1e12, 3),
                "mfu_pct": round(r["mfu_pct"], 2) if r["mfu_pct"] is not None else None,
                **extra,
                "baseline_note": note,
            }
        )
    )


if __name__ == "__main__":
    main()
