"""Orbax checkpointing with real resume and async saves.

The reference saves model weights only (optimizer state saving is disabled by
``if False``, utils/train_utils.py:29) and NO trainer ever loads a checkpoint
(SURVEY.md §5). Here the full train state — params, batch stats, all three
optimizer states, epoch, best-accuracy trackers — round-trips, with the
reference's mtime rotation policy (train_dg_single_gpu.py:386-395).

Saves are ASYNC by default (``block=False``): the device→host fetch is one
batched ``jax.device_get`` (per-leaf fetches each cost a tunnel round trip on
this dev box), after which the disk write proceeds on orbax's background
thread while training continues. The training loops call
``wait_for_saves()`` at exit and before a preemption shutdown so no write is
ever abandoned; a new save first waits out the previous one, so rotation
never races an in-flight write.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

# one process-wide checkpointer: reused across saves (each StandardCheckpointer
# owns a background thread pool) and the handle wait_for_saves() flushes.
_CHECKPOINTER: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def wait_for_saves() -> None:
    """Block until every async save issued so far is committed to disk."""
    if _CHECKPOINTER is not None:
        _CHECKPOINTER.wait_until_finished()


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
    block: bool = False,
) -> str:
    """Save the full train state; rotate, keeping the newest
    ``max_ckpt_save_num`` checkpoints by mtime. Returns once the state is
    safely staged in host memory; the disk write completes in the background
    unless ``block=True``."""
    os.makedirs(ckpt_dir, exist_ok=True)
    # ONE batched transfer for the whole tree (np.asarray per leaf would pay
    # one device round trip per leaf over the axon tunnel)
    host_state = jax.device_get(state)
    payload = {"state": jax.tree.map(np.asarray, host_state), "epoch": epoch}
    if extra:
        payload["extra"] = extra

    checkpointer = _checkpointer()
    # the previous async save must be committed before we rotate (its dir
    # must exist with a final mtime) and before orbax accepts a new save
    checkpointer.wait_until_finished()

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
    checkpointer.save(path, payload, force=True)
    if block:
        checkpointer.wait_until_finished()
    return path


def restore_checkpoint(path: str, abstract_state: Any) -> Dict:
    """Restore a checkpoint saved by save_checkpoint. ``abstract_state``
    provides the pytree structure/dtypes (e.g. a freshly-initialized state)."""
    wait_for_saves()  # a just-issued async save of this path must land first
    checkpointer = _checkpointer()
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
    wait_for_saves()
    ckpts = [
        os.path.join(ckpt_dir, d)
        for d in os.listdir(ckpt_dir)
        if "_checkpoint_epoch_" in d
    ]
    if not ckpts:
        return None
    return max(ckpts, key=lambda p: int(p.rsplit("_", 1)[-1]))
