"""Orbax checkpointing with real resume.

The reference saves model weights only (optimizer state saving is disabled by
``if False``, utils/train_utils.py:29) and NO trainer ever loads a checkpoint
(SURVEY.md §5). Here the full train state — params, batch stats, all three
optimizer states, epoch, best-accuracy trackers — round-trips, with the
reference's mtime rotation policy (train_dg_single_gpu.py:386-395).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_path(ckpt_dir: str, source: str, epoch: int) -> str:
    # reference naming: <ckpt_dir>/<source>_checkpoint_epoch_N (.pth there)
    return os.path.abspath(os.path.join(ckpt_dir, f"{source}_checkpoint_epoch_{epoch}"))


def save_checkpoint(
    ckpt_dir: str,
    source: str,
    epoch: int,
    state: Any,
    extra: Optional[Dict] = None,
    max_ckpt_save_num: int = 50,
) -> str:
    """Save the full train state; rotate, keeping the newest
    ``max_ckpt_save_num`` checkpoints by mtime."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"state": jax.tree.map(np.asarray, state), "epoch": epoch}
    if extra:
        payload["extra"] = extra

    # rotation before save (reference order, train_dg_single_gpu.py:387-391)
    existing = [
        os.path.join(ckpt_dir, d)
        for d in os.listdir(ckpt_dir)
        if "_checkpoint_epoch_" in d
    ]
    existing.sort(key=os.path.getmtime)
    if len(existing) >= max_ckpt_save_num:
        import shutil

        for path in existing[: len(existing) - max_ckpt_save_num + 1]:
            shutil.rmtree(path, ignore_errors=True)

    path = _ckpt_path(ckpt_dir, source, epoch)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, payload, force=True)
    checkpointer.wait_until_finished()
    return path


def restore_checkpoint(path: str, abstract_state: Any) -> Dict:
    """Restore a checkpoint saved by save_checkpoint. ``abstract_state``
    provides the pytree structure/dtypes (e.g. a freshly-initialized state)."""
    checkpointer = ocp.StandardCheckpointer()
    abstract = {
        "state": jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state),
        "epoch": 0,
    }
    try:
        return checkpointer.restore(os.path.abspath(path), abstract)
    except BaseException:
        # payloads saved with an 'extra' dict need it in the abstract tree
        abstract["extra"] = None
        return checkpointer.restore(os.path.abspath(path), abstract)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = [
        os.path.join(ckpt_dir, d)
        for d in os.listdir(ckpt_dir)
        if "_checkpoint_epoch_" in d
    ]
    if not ckpts:
        return None
    return max(ckpts, key=lambda p: int(p.rsplit("_", 1)[-1]))
