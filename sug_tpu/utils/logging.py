"""Logger, experiment folder layout, and metrics writer.

Reference: utils/common_utils.py:105-158 (logger + exp dirs) and the
tensorboardX SummaryWriter usage in the trainers. The metrics writer prefers
tensorboardX when importable and always mirrors scalars to a JSONL file so
runs are inspectable without TF tooling.
"""

from __future__ import annotations

import json
import logging
import os
from datetime import datetime
from typing import Optional


def create_logger(log_file: Optional[str] = None, rank: int = 0, log_level=logging.INFO):
    logger = logging.getLogger("sug_tpu")
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    formatter = logging.Formatter(
        "%(asctime)s %(filename)s %(funcName)s %(lineno)d %(levelname)5s  %(message)s"
    )
    logger.handlers.clear()
    console = logging.StreamHandler()
    console.setLevel(log_level if rank == 0 else logging.ERROR)
    console.setFormatter(formatter)
    logger.addHandler(console)
    if log_file is not None:
        fh = logging.FileHandler(filename=log_file)
        fh.setLevel(log_level if rank == 0 else logging.ERROR)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def exp_log_folder_creator(cfg, extra_tag: Optional[str] = None):
    """Create output/ckpt dirs: DATA_ROOT/output/EXTRA_TAG[/source], with a
    timestamp suffix on collision (reference utils/common_utils.py:130-158)."""
    today_str = datetime.now().strftime("%Y-%m-%d %H:%M:%S")

    data_root = cfg["DATA_ROOT"]
    dir_root = data_root if "data" in data_root else os.path.join(data_root, "PointDA_data/")

    output_dir = os.path.join(dir_root, "output", cfg["EXTRA_TAG"])
    ckpt_dir = os.path.join(output_dir, "ckpt", cfg.get("EXPERIMENT", "exp"), cfg["EXTRA_TAG"])
    if extra_tag is not None:
        output_dir = os.path.join(output_dir, extra_tag)
        ckpt_dir = os.path.join(ckpt_dir, extra_tag)
    if not os.path.exists(output_dir):
        os.makedirs(output_dir)
    else:
        output_dir = os.path.join(output_dir, today_str)
        os.makedirs(output_dir)
    if not os.path.exists(ckpt_dir):
        os.makedirs(ckpt_dir)
    else:
        ckpt_dir = os.path.join(ckpt_dir, today_str)
        os.makedirs(ckpt_dir)
    return output_dir, ckpt_dir


class MetricsWriter:
    """Scalar metrics sink: tensorboardX (if available) + JSONL mirror.

    Drop-in for the SummaryWriter scalars the reference logs: lr_g / lr_c /
    lr_dis, loss/cls, loss/adv, loss/mmd_geo, loss/mmd_sem, acc/*_best_acc,
    acc/*_cur_acc (train_dg_single_gpu.py:214-215,354-357,379-383).
    """

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        value = float(value)
        self._jsonl.write(json.dumps({"tag": tag, "value": value, "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
