"""Sequence (point-axis) parallelism for very large clouds.

The reference has no sequence scaling (clouds are fixed at 1024 points,
SURVEY.md §5); the TPU analog is sharding the POINT axis of a cloud across
the mesh so O(N^2) geometry ops scale past one chip's memory. Implemented
with ``shard_map`` + XLA collectives:

- chamfer_sp: each device holds a point-slice of both clouds; directed
  minima are computed against the full opposing cloud an all-gathered tile
  at a time, means combine via psum.
- knn_sp: each device computes exact top-k for its query slice against the
  all-gathered source points (memory O(N_local * N)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sug_tpu.ops.geometry import square_distance


def chamfer_sp(mesh: Mesh, pc1: jax.Array, pc2: jax.Array, axis: str = "data"):
    """Point-sharded bidirectional chamfer: (B, N, 3) x (B, M, 3) -> (B,).

    Both clouds are sharded along the point axis; each device computes its
    slice's nearest-neighbor distances against the opposing cloud gathered
    tile-by-tile over the mesh (ppermute ring would cut peak memory further;
    all_gather keeps it simple at these sizes).
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=P(),
    )
    def _chamfer(p1_local, p2_local):
        p2_full = jax.lax.all_gather(p2_local, axis, axis=1, tiled=True)
        p1_full = jax.lax.all_gather(p1_local, axis, axis=1, tiled=True)
        d1 = jnp.min(square_distance(p1_local, p2_full), axis=2)  # (B, N_loc)
        d2 = jnp.min(square_distance(p2_local, p1_full), axis=2)  # (B, M_loc)
        # per-sample means over the FULL point axes = psum of local sums / N
        n1 = p1_local.shape[1] * jax.lax.psum(1, axis)
        n2 = p2_local.shape[1] * jax.lax.psum(1, axis)
        s1 = jax.lax.psum(jnp.sum(d1, axis=1), axis) / n1
        s2 = jax.lax.psum(jnp.sum(d2, axis=1), axis) / n2
        return s1 + s2

    return _chamfer(pc1, pc2)


def knn_sp(mesh: Mesh, x: jax.Array, k: int, axis: str = "data"):
    """Point-sharded exact kNN: (B, N, C) -> (B, N, k) global indices.

    Queries stay sharded; sources are all-gathered so each device's top-k is
    exact. Output is sharded like the input queries.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )
    def _knn(x_local):
        x_full = jax.lax.all_gather(x_local, axis, axis=1, tiled=True)
        d = square_distance(x_local, x_full)  # (B, N_loc, N)
        _, idx = jax.lax.top_k(-d, k)
        return idx.astype(jnp.int32)

    return _knn(x)
