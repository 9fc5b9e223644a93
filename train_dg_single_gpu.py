#!/usr/bin/env python
"""Main SUG DG trainer (TPU-native).

CLI parity with the reference train_dg_single_gpu.py:
    python train_dg_single_gpu.py --source modelnet \
        --cfg tools/cfgs/cfgs_local/DG_unified_loss.yaml [--set KEY VAL ...]

Despite the legacy name ("single_gpu"), pass --num_devices N to data-parallel
over a device mesh — the step compiles identically for 1 or N chips.
"""

import time
import warnings

from sug_tpu.utils.config import parser_config
from sug_tpu.engine.dg_loop import run_dg_training

warnings.filterwarnings("ignore")


def main():
    args, cfg = parser_config()
    run_dg_training(args, cfg)


if __name__ == "__main__":
    since = time.time()
    main()
    dt = time.time() - since
    print("Training complete in {:.0f}m {:.0f}s".format(dt // 60, dt % 60))
