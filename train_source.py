#!/usr/bin/env python
"""Source-only baseline trainer + zero-shot eval (TPU-native).

CLI parity with the reference train_source.py:
    python train_source.py --source modelnet \
        --cfg tools/cfgs/cfgs_local/direct_inference.yaml
"""

import time
import warnings

from sug_tpu.utils.config import parser_config
from sug_tpu.engine.source_loop import run_source_training

warnings.filterwarnings("ignore")


def main():
    args, cfg = parser_config()
    run_source_training(args, cfg)


if __name__ == "__main__":
    since = time.time()
    main()
    dt = time.time() - since
    print("Training complete in {:.0f}m {:.0f}s".format(dt // 60, dt % 60))
