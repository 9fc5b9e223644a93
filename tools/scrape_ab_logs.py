#!/usr/bin/env python
"""Scrape DG trainer logs into the docs/VALIDATION.md A/B table format.

Usage: python tools/scrape_ab_logs.py /tmp/ab5/dg_*.log

Groups logs by arm (the ``dg_<arm>_<seed>.log`` naming the campaign scripts
use), extracts each run's best accuracy per eval set from the trainer's
"Best Tar Acc" lines, and prints per-arm mean [min..max] over seeds.
"""

import re
import sys
from collections import defaultdict

LINE = re.compile(
    r"On dataset (\w+) :\d+ \[overall_acc: ([0-9.]+) Best Tar Acc: ([0-9.]+)"
)


def best_per_set(path):
    best = {}
    with open(path) as f:
        for line in f:
            m = LINE.search(line)
            if m:
                best[m.group(1)] = float(m.group(3))
    return best


def main(paths):
    arms = defaultdict(list)
    for p in paths:
        m = re.search(r"dg_([A-Za-z0-9-]+)_(\d+)\.log$", p)
        arm = m.group(1) if m else p
        b = best_per_set(p)
        if b:
            arms[arm].append((m.group(2) if m else "?", b))
        else:
            print(f"WARNING: no eval lines in {p}", file=sys.stderr)

    for arm, runs in sorted(arms.items()):
        sets = sorted({s for _, b in runs for s in b})
        cols = []
        for s in sets:
            vals = [b[s] for _, b in runs if s in b]
            cols.append(
                f"{s} {sum(vals)/len(vals):.3f} [{min(vals):.3f}..{max(vals):.3f}]"
            )
        seeds = ",".join(seed for seed, _ in runs)
        print(f"{arm} (seeds {seeds}): " + " | ".join(cols))


if __name__ == "__main__":
    main(sys.argv[1:])
