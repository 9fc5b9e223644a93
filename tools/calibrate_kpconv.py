#!/usr/bin/env python
"""KPConv neighbor-capacity calibration — the reference's calibrate_neighbors
(model/KPConv_model.py:848-880) for the fixed-capacity pyramid.

The hardcoded NEIGHBOR_LIMITS / grid_dl in sug_tpu/models/kpconv.py were
tuned on synthetic normalized clouds; real datasets have different local
density. This tool builds the SAME pyramid training builds (``build_pyramid``
with the configured ``pyramid: grid|fps`` mode, grid capacities and radii)
and measures, per level, the TRUE (uncapped) in-radius neighbor-count
histogram over a dataset sample, emitting:

- the keep_ratio percentile as the recommended per-level NEIGHBOR_LIMITS
  (reference semantics: cumulative neighbor mass, keep_ratio=0.8 default);
- mean occupancy, flagging starved levels (mean < 4 suggests raising the
  subsampling dl) and saturated ones.

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

    from sug_tpu.models.kpconv import build_pyramid
    from sug_tpu.ops.geometry import square_distance

    num_layers = cfg["num_layers"]
    grid_mode = cfg.get("pyramid", "fps") == "grid"
    dl = cfg["grid_dl"] if grid_mode else cfg["first_subsampling_dl"]
    r0 = dl * cfg["conv_radius"]

    # uncapped histogram upper bound (reference hist_n, :851), measured on
    # the exact pyramid training uses (grid levels carry validity masks;
    # only VALID query rows contribute, and sentinel support rows are
    # excluded — they sit far away but count themselves)
    counts_per_level = [[] for _ in range(num_layers)]
    level_sizes = None
    for start in range(0, len(pts), batch):
        pc = jnp.asarray(pts[start : start + batch], jnp.float32)
        pyr = build_pyramid(pc, cfg)
        level_sizes = [int(p.shape[1]) for p in pyr["points"]]
        for lvl in range(num_layers):
            r = r0 * (2**lvl)
            p = pyr["points"][lvl]
            within = square_distance(p, p) <= r * r  # (B, N_l, N_l)
            if pyr["valid"] is not None:
                v = np.asarray(pyr["valid"][lvl]) > 0
                within = within & jnp.asarray(v)[:, None, :]
                cnt = np.asarray(jnp.sum(within, axis=-1))[v]
            else:
                cnt = np.asarray(jnp.sum(within, axis=-1)).ravel()
            counts_per_level[lvl].append(cnt)

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
                "level_size": level_sizes[lvl],
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
    ap.add_argument("--pyramid", default=None, choices=("grid", "fps"),
                    help="override MODEL_CFG pyramid mode (default: the "
                         "training default from KPCONV_DEFAULTS)")
    ap.add_argument("--dl", type=float, default=None,
                    help="override grid_dl (grid) / first_subsampling_dl (fps)")
    args = ap.parse_args()

    from sug_tpu.data.datasets import create_single_dataset
    from sug_tpu.models.kpconv import KPCONV_DEFAULTS, NEIGHBOR_LIMITS

    ds = create_single_dataset(
        args.dataset, "train", model="KPConv", data_root=args.root,
        pc_num=args.points, aug=False,
    )
    pts = ds.pts[: args.samples]
    cfg = dict(KPCONV_DEFAULTS)
    if args.pyramid is not None:
        cfg["pyramid"] = args.pyramid
    grid_mode = cfg.get("pyramid", "fps") == "grid"
    dl_key = "grid_dl" if grid_mode else "first_subsampling_dl"
    if args.dl is not None:
        cfg[dl_key] = args.dl

    limits, stats = measure(pts, cfg, args.keep_ratio)
    for s in stats:
        print(json.dumps(s), file=sys.stderr)
    starved = [s["level"] for s in stats if s["mean_neighbors"] < 4]
    if starved:
        print(
            f"WARNING: levels {starved} are starved (mean < 4 neighbors) — "
            f"raise {dl_key} above {cfg[dl_key]}",
            file=sys.stderr,
        )
    print(json.dumps({
        "dataset": args.dataset,
        "pyramid": cfg.get("pyramid", "fps"),
        dl_key: cfg[dl_key],
        "keep_ratio": args.keep_ratio,
        "recommended_NEIGHBOR_LIMITS": limits,
        "current_NEIGHBOR_LIMITS": list(NEIGHBOR_LIMITS),
    }))


if __name__ == "__main__":
    main()
