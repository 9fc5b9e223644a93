"""Pallas TPU kernels for the hot geometry ops.

At the reference scale (N=1024) XLA already keeps the pairwise-distance
working set in VMEM and runs the DG step near the MXU roofline, so these
kernels target the axis the reference cannot scale (SURVEY.md §5
"long-context"): O(N^2) ops tiled blockwise so N can grow far past VMEM
without materializing (B, N, M) distance matrices in HBM.

- chamfer_pallas: running min over source tiles; HBM traffic O(N), not O(N^2).
- fps_pallas: the whole S-iteration farthest-point loop runs inside one
  kernel with coordinates and the running min-distance resident in VMEM
  (the reference's CUDA kernel, model/pointnet2/src/sampling_gpu.cu:93-211,
  re-reads HBM per iteration).

TPU layout notes: clouds are carried as (B, 8, N) — xyz on SUBLANES (rows
0..2, zero-padded to the 8-row f32 tile), points on the 128-wide LANE axis —
so a full 16k-point cloud costs 512KB of VMEM instead of the 8.4MB a
128-lane-padded (N, 128) layout would. The pairwise cross term is then one
(TQ, 8) x (8, TS) MXU dot. FPS centroid extraction uses a lane-iota masked
reduction (dynamic value slices don't lower), and per-iteration indices
accumulate via a row-iota mask instead of dynamic scalar stores.

Each public entry dispatches to the plain-XLA implementation for small N and
enables ``interpret=True`` off-TPU so the suite runs on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sug_tpu.ops import geometry


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _to_lane_layout(pc: jax.Array) -> jax.Array:
    """(B, N, 3) -> (B, 8, N): coords on sublanes, points on lanes."""
    return jnp.pad(jnp.swapaxes(pc, 1, 2), ((0, 0), (0, 5), (0, 0)))


# ---------------------------------------------------------------------------
# chamfer distance, tiled
# ---------------------------------------------------------------------------


def _chamfer_min_kernel(q_ref, s_ref, out_ref, *, tile_s: int):
    """One (batch, query-tile) program: running min of squared distances to
    every source tile. Blocks: q_ref (1, 8, TQ); s_ref (1, 8, S);
    out (1, 8, TQ) [min broadcast across sublanes]."""
    q = q_ref[0]  # (8, TQ); rows 3..7 are zero
    TQ = q.shape[1]
    S = s_ref.shape[2]
    n_tiles = S // tile_s
    q_sq = jnp.sum(q * q, axis=0, keepdims=True)  # (1, TQ)

    def body(t, running):  # running: (1, TQ)
        s = s_ref[0, :, pl.ds(t * tile_s, tile_s)]  # (8, TS)
        s_sq = jnp.sum(s * s, axis=0, keepdims=True)  # (1, TS)
        cross = jnp.dot(q.T, s, preferred_element_type=jnp.float32)  # (TQ, TS)
        d = q_sq.T - 2.0 * cross + s_sq  # (TQ, TS)
        tile_min = jnp.min(d, axis=1, keepdims=True)  # (TQ, 1)
        return jnp.minimum(running, tile_min.T)

    init = jnp.full((1, TQ), 1e30, dtype=jnp.float32)
    running = jax.lax.fori_loop(0, n_tiles, body, init)
    out_ref[0] = jnp.broadcast_to(running, (8, TQ))


def _min_dists_tiled(query: jax.Array, source: jax.Array, tile_q: int, tile_s: int):
    """(B, N, 3) x (B, M, 3) -> (B, N) min squared distance, never
    materializing (B, N, M)."""
    B, N, _ = query.shape
    M = source.shape[1]
    qt = _to_lane_layout(query)  # (B, 8, N)
    st = _to_lane_layout(source)  # (B, 8, M)

    out = pl.pallas_call(
        functools.partial(_chamfer_min_kernel, tile_s=tile_s),
        out_shape=jax.ShapeDtypeStruct((B, 8, N), jnp.float32),
        grid=(B, N // tile_q),
        in_specs=[
            pl.BlockSpec((1, 8, tile_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, M), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tile_q), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(qt, st)
    return out[:, 0, :]


def chamfer_pallas(
    pc1: jax.Array, pc2: jax.Array, per_sample: bool = True, tile: int = 512
) -> jax.Array:
    """Tiled bidirectional chamfer. Falls back to the XLA op when N is small
    enough that the full distance matrix is the faster plan."""
    B, N, _ = pc1.shape
    M = pc2.shape[1]
    if N <= 2048 and M <= 2048:
        return geometry.chamfer_distance(pc1, pc2, per_sample)
    tile_q = min(tile, N)
    tile_s = min(tile, M)
    # analytic executed-MXU FLOPs: one (TQ,8)x(8,TS) cross matmul per tile
    # pair, both directions (XLA cost_analysis cannot see custom calls)
    from sug_tpu.ops import flops as _flops

    _flops.record("chamfer_tiled", 32.0 * B * N * M)
    d1 = _min_dists_tiled(pc1, pc2, tile_q, tile_s)  # (B, N)
    d2 = _min_dists_tiled(pc2, pc1, tile_q, tile_s)  # (B, M)
    per = jnp.mean(d1, axis=1) + jnp.mean(d2, axis=1)
    return per if per_sample else jnp.mean(per)


# ---------------------------------------------------------------------------
# farthest point sampling, VMEM-resident
# ---------------------------------------------------------------------------


def _fps_kernel(start_ref, xyz_ref, out_ref, dist_ref, acc_ref, *, npoint: int):
    """One batch element per program. Blocks: xyz_ref (1, 8, N);
    out (1, npoint, 128) int32 [index broadcast across lanes]."""
    rows = xyz_ref[0]  # (8, N); rows 3..7 zero
    N = rows.shape[1]
    dist_ref[:, :] = jnp.full((8, N), 1e10, dtype=jnp.float32)
    acc_ref[:, :] = jnp.zeros((npoint, 128), dtype=jnp.int32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (npoint, 128), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    def body(i, farthest):
        acc_ref[:, :] = jnp.where(row_iota == i, farthest, acc_ref[:, :])
        sel = (lane_iota == farthest).astype(jnp.float32)  # (1, N)
        centroid = jnp.sum(rows * sel, axis=1, keepdims=True)  # (8, 1)
        d = jnp.sum((rows - centroid) ** 2, axis=0, keepdims=True)  # (1, N)
        new_dist = jnp.minimum(dist_ref[0:1, :], d)
        dist_ref[0:1, :] = new_dist
        return jnp.argmax(new_dist[0]).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, start_ref[pl.program_id(0)])
    out_ref[0, :, :] = acc_ref[:, :]


def fps_pallas(
    xyz: jax.Array, npoint: int, start_idx: jax.Array | None = None
) -> jax.Array:
    """Pallas FPS: (B, N, 3) -> (B, npoint) indices. Semantics identical to
    geometry.farthest_point_sample. npoint must be a multiple of 8."""
    B, N, _ = xyz.shape
    if start_idx is None:
        start_idx = jnp.zeros((B,), dtype=jnp.int32)
    xt = _to_lane_layout(xyz)  # (B, 8, N)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        out_shape=jax.ShapeDtypeStruct((B, npoint, 128), jnp.int32),
        grid=(B,),
        in_specs=[
            # whole (B,) start array in SMEM; indexed by program_id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, npoint, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, N), jnp.float32),
            pltpu.VMEM((npoint, 128), jnp.int32),
        ],
        interpret=_interpret(),
    )(start_idx.astype(jnp.int32), xt)
    return out[:, :, 0]
