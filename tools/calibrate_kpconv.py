#!/usr/bin/env python
"""KPConv neighbor-capacity calibration — the reference's calibrate_neighbors
(model/KPConv_model.py:848-880) for the fixed-capacity FPS pyramid.

The hardcoded NEIGHBOR_LIMITS / first_subsampling_dl in sug_tpu/models/kpconv.py
were tuned on synthetic normalized clouds; real datasets have different local
density. This tool measures, per pyramid level, the TRUE (uncapped) in-radius
neighbor-count histogram over a dataset sample and emits:

- the keep_ratio percentile as the recommended per-level NEIGHBOR_LIMITS
  (reference semantics: cumulative neighbor mass, keep_ratio=0.8 default);
- mean occupancy, flagging starved levels (mean < 4 suggests raising
  first_subsampling_dl) and saturated ones (p80 near the level size suggests
  lowering it).

Run on the synthetic smoke set to reproduce the current constants:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/calibrate_kpconv.py \
      --root /tmp/synth_data --dataset modelnet --samples 64
Pass the measured limits to training with
  --set MODEL_CFG.NEIGHBOR_LIMITS <csv>  (or edit kpconv.py's constants).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(pts: np.ndarray, cfg: dict, keep_ratio: float, batch: int = 16):
    import jax.numpy as jnp

    from sug_tpu.models.kpconv import LEVEL_FRACTIONS, build_pyramid
    from sug_tpu.ops.geometry import farthest_point_sample, index_points, square_distance

    num_layers = cfg["num_layers"]
    r0 = cfg["first_subsampling_dl"] * cfg["conv_radius"]
    N = pts.shape[1]

    # uncapped histogram upper bound (reference hist_n, :851)
    counts_per_level = [[] for _ in range(num_layers)]
    for start in range(0, len(pts), batch):
        pc = jnp.asarray(pts[start : start + batch], jnp.float32)
        points = [pc]
        for lvl in range(1, num_layers):
            n_l = max(N // LEVEL_FRACTIONS[lvl], 4)
            fps_idx = farthest_point_sample(points[-1], n_l)
            points.append(index_points(points[-1], fps_idx))
        for lvl in range(num_layers):
            r = r0 * (2**lvl)
            d2 = square_distance(points[lvl], points[lvl])
            cnt = jnp.sum(d2 <= r * r, axis=-1)  # true in-radius counts
            counts_per_level[lvl].append(np.asarray(cnt).ravel())

    limits, stats = [], []
    for lvl in range(num_layers):
        c = np.concatenate(counts_per_level[lvl])
        hist = np.bincount(c)
        cumsum = np.cumsum(hist)
        # reference percentile: smallest K covering keep_ratio of all
        # neighbor-count mass (model/KPConv_model.py:875-877)
        limit = int(np.searchsorted(cumsum, keep_ratio * cumsum[-1]) + 1)
        limits.append(limit)
        stats.append(
            {
                "level": lvl,
                "radius": round(r0 * (2**lvl), 4),
                "level_size": int(max(N // LEVEL_FRACTIONS[lvl], 4)) if lvl else N,
                "mean_neighbors": round(float(c.mean()), 2),
                "p50": int(np.median(c)),
                f"p{int(keep_ratio*100)}": limit,
                "max": int(c.max()),
            }
        )
    return limits, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="PointDA-style data root")
    ap.add_argument("--dataset", default="modelnet")
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--keep-ratio", type=float, default=0.8)
    ap.add_argument("--first-dl", type=float, default=None,
                    help="override first_subsampling_dl")
    args = ap.parse_args()

    from sug_tpu.data.datasets import create_single_dataset
    from sug_tpu.models.kpconv import KPCONV_DEFAULTS, NEIGHBOR_LIMITS

    ds = create_single_dataset(
        args.dataset, "train", model="KPConv", data_root=args.root,
        pc_num=args.points, aug=False,
    )
    pts = ds.pts[: args.samples]
    cfg = dict(KPCONV_DEFAULTS)
    if args.first_dl is not None:
        cfg["first_subsampling_dl"] = args.first_dl

    limits, stats = measure(pts, cfg, args.keep_ratio)
    for s in stats:
        print(json.dumps(s), file=sys.stderr)
    starved = [s["level"] for s in stats if s["mean_neighbors"] < 4]
    if starved:
        print(
            f"WARNING: levels {starved} are starved (mean < 4 neighbors) — "
            f"raise first_subsampling_dl above {cfg['first_subsampling_dl']}",
            file=sys.stderr,
        )
    print(json.dumps({
        "dataset": args.dataset,
        "first_subsampling_dl": cfg["first_subsampling_dl"],
        "keep_ratio": args.keep_ratio,
        "recommended_NEIGHBOR_LIMITS": limits,
        "current_NEIGHBOR_LIMITS": list(NEIGHBOR_LIMITS),
    }))


if __name__ == "__main__":
    main()
