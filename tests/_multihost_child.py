"""Child process for the multi-process data-parallel tests
(tests/test_multihost.py).

Each process owns ``devices-per-process`` virtual CPU devices (set by the
parent via XLA_FLAGS), feeds its rank's slice of the shared epoch permutation
through a rank-aware BatchIterator, assembles global batches with
jax.make_array_from_process_local_data, and runs DG train steps on the global
mesh. Prints the per-step global losses as JSON.

Usage:
    python tests/_multihost_child.py <coordinator> <num_procs> <proc_id> \
        [<global_batch> <dataset_n> <drop_last 0|1>]

The 3-arg form is the original 2x2 run (GLOBAL_BATCH=8, n=40, drop_last).
The 6-arg form covers the uneven-tail epoch: drop_last=0 iterates the FULL
rank slice, tiling the short tail batch to full size (padded_batches), so a
dataset_n not divisible by (global_batch * ranks) exercises the tail path.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main(coordinator: str, num_procs: int, proc_id: int,
         global_batch: int | None = None, dataset_n: int | None = None,
         drop_last: bool = True):
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs

    from sug_tpu.data.datasets import PointCloudDataset
    from sug_tpu.data.sampler import BatchIterator
    from sug_tpu.engine.dg_trainer import DGTrainer
    from sug_tpu.parallel.mesh import assemble_global_batch, make_mesh
    from sug_tpu.utils.config import ConfigDict
    from tests._multihost_common import (
        CFG, GLOBAL_BATCH, N_POINTS, N_STEPS, make_data, padded_batches,
    )

    if global_batch is None:
        global_batch = GLOBAL_BATCH
    mesh = make_mesh()
    pts_s, lab_s, pts_t, lab_t = make_data(dataset_n or 40)
    ds_s = PointCloudDataset("modelnet", pts_s, lab_s, num_points=N_POINTS)
    ds_t = PointCloudDataset("modelnet", pts_t, lab_t, num_points=N_POINTS)

    local_batch = global_batch // num_procs
    it_s = BatchIterator(
        ds_s, local_batch, seed=1, process_index=proc_id,
        process_count=num_procs, drop_last=drop_last,
    )
    it_t = BatchIterator(
        ds_t, local_batch, seed=2, process_index=proc_id,
        process_count=num_procs, drop_last=drop_last,
    )
    it_s.set_epoch(0)
    it_t.set_epoch(0)
    batches_s = iter(it_s) if drop_last else padded_batches(it_s)
    batches_t = iter(it_t) if drop_last else padded_batches(it_t)
    # drop_last: the original fixed-step run; else: the whole epoch
    # including the tiled tail batch
    max_steps = N_STEPS if drop_last else len(it_s)

    trainer = DGTrainer(
        ConfigDict(CFG), model_name="Pointnet", mesh=mesh, augment=True
    )
    state = trainer.init_state(seed=0, batch_size=global_batch, num_points=N_POINTS)

    key = jax.random.key(0)
    losses = []  # trajectory (state carried)
    fixed_losses = []  # per-batch loss from the FIXED initial state (no carry
    # -> no chaos amplification through FPS/ball-query argmax flips)
    state0 = state
    for step, ((dsb, lsb), (dtb, ltb)) in enumerate(zip(batches_s, batches_t)):
        if step >= max_steps:
            break
        dsb, lsb, dtb, ltb = assemble_global_batch(
            mesh, dsb, lsb.astype(np.int32), dtb, ltb.astype(np.int32)
        )
        key, k = jax.random.split(key)
        _, m0 = trainer.train_step(
            state0, dsb, lsb, dtb, ltb, jax.random.key(7), 1e-3, 1e-3, 1e-3, mmd_on=True
        )
        fixed_losses.append(float(m0["loss_total"]))
        state, metrics = trainer.train_step(
            state, dsb, lsb, dtb, ltb, k, 1e-3, 1e-3, 1e-3, mmd_on=True
        )
        losses.append(float(metrics["loss_total"]))
    print(
        json.dumps({"proc": proc_id, "losses": losses, "fixed_losses": fixed_losses}),
        flush=True,
    )


if __name__ == "__main__":
    if len(sys.argv) > 4:
        main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
             int(sys.argv[4]), int(sys.argv[5]), bool(int(sys.argv[6])))
    else:
        main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
