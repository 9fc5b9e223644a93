#!/usr/bin/env python
"""Distributed DG trainer — the WORKING replacement for the reference's WIP
DDP path (train_dg.py there is broken: optimizers built over
``model.modules.g``, SURVEY.md §3.6).

TPU-native distribution: a 1-D data mesh + jitted step; GSPMD inserts the
gradient all-reduce over ICI and makes BatchNorm statistics global. Multi-host
launches initialize jax.distributed via --launcher {jax,slurm,pytorch}
(pytorch accepted as an alias for CLI parity).

    python train_dg.py --source modelnet --cfg tools/cfgs/... \
        [--num_devices N] [--launcher slurm --tcp_port 18888]
"""

import time
import warnings

import jax

from sug_tpu.parallel.mesh import distributed_init
from sug_tpu.utils.config import parser_config
from sug_tpu.engine.dg_loop import run_dg_training

warnings.filterwarnings("ignore")


def main():
    args, cfg = parser_config()
    launcher = {"pytorch": "jax"}.get(args.launcher, args.launcher)
    rank = distributed_init(launcher)
    cfg.LOCAL_RANK = rank
    if args.num_devices is None:
        args.num_devices = len(jax.devices())
    # reference divides the batch per rank (train_dg.py:74-75); here the mesh
    # handles the split — args.batch_size stays the per-device batch.
    run_dg_training(args, cfg)


if __name__ == "__main__":
    since = time.time()
    main()
    dt = time.time() - since
    print("Training complete in {:.0f}m {:.0f}s".format(dt // 60, dt % 60))
