"""Batch iterators: shuffled and class-balanced.

Host-side index generation feeding the jitted train step with fixed-shape
(B, N, 3) slices. Replaces the reference's torch DataLoader + custom Sampler
(utils/train_utils.py:65-82) and DistributedSampler
(data/dataloader.py:16-36).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np

from sug_tpu.data.datasets import PointCloudDataset


class BatchIterator:
    """Shuffled, drop-last batch index iterator over a PointCloudDataset.

    Multi-host: pass ``process_index``/``process_count`` and the SAME seed on
    every host — the epoch permutation is derived from ``seed + epoch`` so all
    ranks shuffle identically, then each rank takes its strided slice
    (DistributedSampler semantics, reference data/dataloader.py:16-36).
    ``batch_size`` is the PER-PROCESS batch; rank slices of the same batch
    index together form the global batch (assemble with
    ``sug_tpu.parallel.mesh.assemble_global_batch``). Call ``set_epoch`` each
    epoch — without it every epoch reuses the epoch-0 shuffle, exactly like
    the reference's DistributedSampler without ``set_epoch``.
    """

    def __init__(
        self,
        dataset: PointCloudDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 666,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def _local_count(self) -> int:
        n = len(self.dataset)
        if self.process_count > 1:
            return -(-n // self.process_count)  # padded, like DistributedSampler
        return n

    def __len__(self) -> int:
        n = self._local_count()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """DistributedSampler-style epoch seeding for reproducible,
        cross-process-consistent shuffles (reference data/dataloader.py:22-26)."""
        self.epoch = epoch

    def _epoch_order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(n)
        else:
            order = np.arange(n)
        if self.process_count > 1:
            total = self._local_count() * self.process_count
            order = np.concatenate([order, order[: total - n]])  # pad by wrap
            order = order[self.process_index :: self.process_count]
        return order

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self._epoch_order()
        nb = len(self)
        for b in range(nb):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                return
            yield self.dataset.pts[idx], self.dataset.labels[idx]


class ClassBalancedBatchIterator:
    """Class-balanced batches: sample ``class_per_batch`` classes per epoch,
    then draw each batch element from a random chosen class — reference
    ``Sampler`` semantics (utils/train_utils.py:65-82, enabled by
    ``CLASS_BALANCE`` at train_dg_single_gpu.py:98-102)."""

    def __init__(
        self,
        dataset: PointCloudDataset,
        batch_size: int,
        class_per_batch: int = 10,
        seed: int = 666,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.classes: List[List[int]] = dataset.classes()
        self.batch_size = batch_size
        self.class_per_batch = class_per_batch
        n_local = sum(len(x) for x in self.classes) // max(1, process_count)
        self.n_batches = n_local // batch_size
        self.seed = seed
        self.process_index = process_index
        self.epoch = 0

    def __len__(self) -> int:
        return self.n_batches

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        # The per-epoch class subset is drawn from a rank-INDEPENDENT stream so
        # every rank restricts to the same classes (single-process semantics:
        # one global `chosen` per epoch); only the per-sample draws use the
        # rank-specific stream.
        shared_rng = np.random.default_rng((self.seed, self.epoch))
        nonempty = [i for i, x in enumerate(self.classes) if len(x) > 0]
        k = min(self.class_per_batch, len(nonempty))
        chosen = shared_rng.choice(nonempty, size=k, replace=False)
        rng = np.random.default_rng(
            (self.seed, self.epoch, self.process_index)
        )
        for _ in range(self.n_batches):
            klass = rng.choice(chosen, size=self.batch_size)
            idx = np.array(
                [self.classes[c][rng.integers(len(self.classes[c]))] for c in klass]
            )
            yield self.dataset.pts[idx], self.dataset.labels[idx]


def paired_epoch(it_s, it_t) -> Iterator:
    """zip() over source/target iterators — the DG hot-loop pairing
    (train_dg_single_gpu.py:246)."""
    return zip(iter(it_s), iter(it_t))


def prefetch_to_device(iterator, size: int = 2, sharding=None, put_fn=None):
    """Stage batches on the accelerator one step ahead of consumption.

    The device-transfer analog of DataLoader prefetching: ``jax.device_put``
    is async, so the upload of batch i+1 overlaps the compute of batch i.
    Works on any iterator yielding tuples/lists of arrays. ``sharding``
    places batches directly with the mesh sharding (data-parallel loops);
    ``put_fn`` overrides placement entirely (multi-host assembly via
    ``sug_tpu.parallel.mesh.assemble_global_batch``).
    """
    import collections

    import jax

    queue = collections.deque()
    it = iter(iterator)

    def put(batch):
        if put_fn is not None:
            return put_fn(*batch)
        if sharding is not None:
            return tuple(jax.device_put(x, sharding) for x in batch)
        return tuple(jax.device_put(x) for x in batch)

    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
