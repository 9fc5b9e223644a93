#!/usr/bin/env python
"""Generate a synthetic PointDA-10-shaped dataset tree for smoke runs.

Writes ``<root>/{scannet,shapenet,modelnet}/{train,test}_{pts,label}.npy``
with 10 geometric classes per dataset (each "dataset" gets a different noise
level / point count to mimic domain shift). Lets every trainer CLI run
end-to-end without the real PointDA-10 download.

    python tools/make_synthetic_data.py --root data/PointDA_data \
        --per-class 32 --points 1024
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sug_tpu.data.datasets import make_synthetic_pointda  # noqa: E402

DOMAIN_PARAMS = {
    # (noise, seed offset): crude domain shift between the three datasets
    "modelnet": (0.01, 0),
    "shapenet": (0.03, 1),
    "scannet": (0.06, 2),
}

# --hard: scan-realism degradations per domain (partial_view, occlusion,
# density_grad — sug_tpu/data/datasets._scan_degrade). modelnet stays a
# clean CAD-like source; shapenet gets mild density falloff; scannet gets
# the full single-view + occluder + falloff treatment real scans show.
HARD_PARAMS = {
    "modelnet": (0.0, 0.0, 0.0),
    "shapenet": (0.0, 0.05, 1.0),
    "scannet": (0.35, 0.15, 2.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/PointDA_data")
    ap.add_argument("--per-class", type=int, default=32)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument(
        "--hard", action="store_true",
        help="add partial-view / occlusion / density-shift degradations "
             "(scan realism — the transfer A/B benchmark set)",
    )
    ap.add_argument(
        "--degrade", choices=["all", "pv", "occ", "density"], default="all",
        help="with --hard: apply only ONE degradation component (per-"
             "degradation ablation of the hard set; 'all' = the full set)",
    )
    args = ap.parse_args()

    for ds, (noise, off) in DOMAIN_PARAMS.items():
        pv, occ, dg = HARD_PARAMS[ds] if args.hard else (0.0, 0.0, 0.0)
        if args.degrade != "all":
            pv = pv if args.degrade == "pv" else 0.0
            occ = occ if args.degrade == "occ" else 0.0
            dg = dg if args.degrade == "density" else 0.0
        out = os.path.join(args.root, ds)
        os.makedirs(out, exist_ok=True)
        for split, n in (("train", args.per_class), ("test", max(args.per_class // 2, 4))):
            pts, labels = make_synthetic_pointda(
                num_per_class=n, num_points=args.points, seed=100 * off + (split == "test"),
                noise=noise, partial_view=pv, occlusion=occ, density_grad=dg,
            )
            np.save(os.path.join(out, f"{split}_pts.npy"), pts)
            np.save(os.path.join(out, f"{split}_label.npy"), labels)
            print(f"{ds}/{split}: {pts.shape}")


if __name__ == "__main__":
    main()
