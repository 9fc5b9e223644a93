"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's NCCL/DDP runtime (utils/common_utils.py:36-78, train_dg.py:216-217).

Design: a 1-D 'data' mesh; batches are sharded along it, params replicated.
The train step is a plain jitted function — GSPMD inserts the gradient
all-reduce (psum over ICI) and makes BatchNorm statistics *globally* correct
(batch reductions span the mesh), which torch DDP only gets with SyncBN.
There is no hand-written collective code to test or break — the compiler owns
the comms, so the multi-device path cannot ship broken the way the
reference's DDP trainer did (SURVEY.md §3.6: optimizer built over
``model.modules.g``, an AttributeError at runtime).

Multi-host: ``distributed_init`` wraps ``jax.distributed.initialize`` —
launcher parity with the reference's pytorch/slurm launchers. Inside SLURM,
jax auto-detects the coordinator from the environment.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(launcher: str = "none", coordinator: Optional[str] = None) -> int:
    """Initialize multi-process jax when launched under a cluster manager.

    Returns this process's index. 'none' = single process. With a non-none
    launcher but no coordinator and no detectable cluster environment
    (SLURM / TPU pod / explicit JAX coordinator vars), this degrades to a
    single-process run instead of crashing — ``jax.distributed.initialize``
    cannot auto-detect outside a managed environment, and the reference's
    launchers read the same env markers (utils/common_utils.py:36-78).
    """
    if launcher == "none":
        return 0
    import os

    cluster_markers = (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "SLURM_JOB_ID",
        "CLOUD_TPU_TASK_ID",
        "TPU_WORKER_HOSTNAMES",
        "MEGASCALE_COORDINATOR_ADDRESS",
    )
    if coordinator is None and not any(m in os.environ for m in cluster_markers):
        return 0
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    jax.distributed.initialize(**kwargs)
    return jax.process_index()


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], *arrays):
    """Place host arrays with the batch axis sharded over the mesh."""
    if mesh is None:
        return tuple(jax.numpy.asarray(a) for a in arrays)
    sh = batch_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)


def assemble_global_batch(mesh: Optional[Mesh], *arrays):
    """Build mesh-sharded global batches from per-process local shards.

    Single process: equivalent to ``shard_batch``. Multi-process: each host
    passes its LOCAL slice (global_batch / process_count rows, produced by a
    rank-aware BatchIterator) and ``jax.make_array_from_process_local_data``
    assembles the logical global array without gathering data to any single
    host — the TPU-native replacement for the reference's DistributedSampler
    + per-rank DataLoader (data/dataloader.py:16-36, train_dg.py:74-75).
    """
    if mesh is None:
        return tuple(jax.numpy.asarray(a) for a in arrays)
    if jax.process_count() == 1:
        return shard_batch(mesh, *arrays)
    sh = batch_sharding(mesh)
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a)) for a in arrays
    )


def replicate(mesh: Optional[Mesh], tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    if mesh is None:
        return tree
    sh = replicated_sharding(mesh)
    return jax.device_put(tree, sh)
