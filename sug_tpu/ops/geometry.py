"""Core point-cloud geometry ops, TPU-native.

All ops use channels-last ``(B, N, C)`` layout with static shapes so XLA can
tile the pairwise-distance matmuls onto the MXU and fuse the elementwise tails.
The reference (SiyuanHuang95/SUG) implements these as torch loops / CUDA
kernels (``model/point_utils.py``, ``model/pointnet2/src/*.cu``); here each op
is a pure jittable function, differentiable where it makes sense (gathers and
interpolation have natural scatter-add gradients via ``take_along_axis``).

Parity notes (file:line refer to the reference):
- FPS: model/point_utils.py:5-26 (sequential argmax loop, random start point).
- ball query: model/point_utils.py:86-109 (radius mask -> smallest indices,
  pad with first-in-ball; radius=None -> plain kNN by sorted distance).
- kNN graph: model/model_utils.py:178-209 (matmul trick + topk).
- 3-NN inverse-distance upsample: model/point_utils.py:134-165.
- chamfer distance: external pip CUDA ext used at model/mmd.py:123-128.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared euclidean distance.

    Args:
        src: (B, N, C)
        dst: (B, M, C)
    Returns:
        (B, N, M) squared distances. Computed with the ``|x|^2 - 2xy + |y|^2``
        matmul trick so the inner product lands on the MXU.
    """
    # -2 * src @ dst^T  -> (B, N, M). Precision.HIGH (bf16_3x on TPU): with
    # single-pass bf16 the rounded distances reorder near-tied neighbors vs
    # the reference's f32 kNN — a real parity issue, measured as O(1) feature
    # differences downstream. 3-pass is ~f32-accurate at 3x MXU cost on an op
    # that is a small share of the step.
    dist = -2.0 * jnp.einsum(
        "bnc,bmc->bnm", src, dst,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH,
    )
    dist = dist + jnp.sum(src**2, axis=-1, keepdims=True)  # (B, N, 1)
    dist = dist + jnp.sum(dst**2, axis=-1)[:, None, :]  # (B, 1, M)
    return dist


def _topk_neg_dist(neg_dist: jax.Array, k: int) -> jax.Array:
    """Top-k indices along the last axis, TPU-tuned.

    On TPU ``lax.approx_max_k`` hits the hardware PartialReduce op instead of
    a full O(N log N) sort: measured 16.5ms vs 22-25ms per (64,1024,1024)
    call at recall_target=1.0 — where it is EXACT (verified: 100.000%
    neighbor-set equality vs lax.top_k at every EdgeConv width,
    tools/knn_experiment.py). Setting SUG_KNN_RECALL < 1 (e.g. 0.95, ~2.7x
    faster still) opts into genuinely approximate neighbors — a documented deviation
    from the reference's exact kNN.
    """
    if jax.default_backend() == "tpu":
        import os

        recall = float(os.environ.get("SUG_KNN_RECALL", "1.0"))
        _, idx = jax.lax.approx_max_k(neg_dist, k, recall_target=recall)
        return idx.astype(jnp.int32)
    _, idx = jax.lax.top_k(neg_dist, k)
    return idx


def knn_indices(x: jax.Array, k: int) -> jax.Array:
    """Indices of the k nearest neighbors of each point (self included).

    Args:
        x: (B, N, C) point features.
        k: neighborhood size.
    Returns:
        (B, N, k) int32 indices. Mirrors reference ``knn``
        (model/model_utils.py:178-185): topk of negative pairwise distance.
        Large N dispatches to the blockwise scan (O(N * tile) memory).
    """
    N = x.shape[1]
    if N > 4096:
        return knn_blockwise(x, k)
    neg_dist = -square_distance(x, x)  # (B, N, N)
    return _topk_neg_dist(neg_dist, k)


@functools.partial(jax.jit, static_argnums=(1, 2))
def knn_blockwise(x: jax.Array, k: int, tile: int = 1024) -> jax.Array:
    """kNN via a scan over source tiles with a running top-k merge.

    Never materializes the (B, N, N) distance matrix — transient memory is
    O(B * N * tile), so EdgeConv graphs scale to clouds far past what the
    reference's full-matrix kNN allows (the "blockwise attention over the
    point axis" analog, SURVEY.md §5).
    """
    B, N, C = x.shape
    tile = min(tile, N)
    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    def step(carry, t):
        best_d, best_i = carry  # (B, N, k)
        src = jax.lax.dynamic_slice_in_dim(xp, t * tile, tile, axis=1)
        d = square_distance(x, src)  # (B, N, tile)
        idx = t * tile + jnp.arange(tile, dtype=jnp.int32)
        # pad rows land past N: push them to +inf so they never win
        d = jnp.where(idx[None, None, :] < N, d, jnp.inf)
        cat_d = jnp.concatenate([best_d, d], axis=-1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(idx, (B, N, tile))], axis=-1
        )
        neg, pos = jax.lax.top_k(-cat_d, k)
        return (-neg, jnp.take_along_axis(cat_i, pos, axis=-1)), None

    init = (
        jnp.full((B, N, k), jnp.inf, dtype=x.dtype),
        jnp.zeros((B, N, k), dtype=jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(step, init, jnp.arange(n_tiles))
    return best_i


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather points by index.

    Args:
        points: (B, N, C)
        idx: (B, S) or (B, S, K) int indices into the N axis.
    Returns:
        (B, S, C) or (B, S, K, C) gathered points.

    Reference: model/point_utils.py:60-83 (batched fancy indexing).
    """
    if idx.ndim == 2:
        return jnp.take_along_axis(points, idx[..., None], axis=1)
    if idx.ndim == 3:
        B, S, K = idx.shape
        flat = idx.reshape(B, S * K)
        out = jnp.take_along_axis(points, flat[..., None], axis=1)
        return out.reshape(B, S, K, points.shape[-1])
    raise ValueError(f"idx must be rank 2 or 3, got {idx.ndim}")


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sample(
    xyz: jax.Array, npoint: int, start_idx: Optional[jax.Array] = None
) -> jax.Array:
    """Farthest point sampling.

    Args:
        xyz: (B, N, 3) coordinates.
        npoint: number of samples (static).
        start_idx: (B,) int32 index of the first centroid per cloud. The
            reference starts at a random point (model/point_utils.py:17);
            pass ``jax.random.randint(key, (B,), 0, N)`` for that behavior,
            default is deterministic index 0.
    Returns:
        (B, npoint) int32 indices of the sampled points.

    Implemented as a ``lax.fori_loop`` over npoint iterations; each iteration
    is a batched distance update + argmax (vectorized over B and N on the
    VPU). See sug_tpu.ops.fps_pallas for the fused Pallas kernel.
    """
    B, N, _ = xyz.shape
    if start_idx is None:
        start_idx = jnp.zeros((B,), dtype=jnp.int32)

    # large clouds: the Pallas kernel keeps xyz + the running distance in
    # VMEM across all npoint iterations (2.8x over the XLA loop at N=16k)
    if N >= 4096 and npoint % 8 == 0 and jax.default_backend() == "tpu":
        from sug_tpu.ops.pallas_kernels import fps_pallas

        return fps_pallas(xyz, npoint, start_idx)

    def body(i, state):
        dists, farthest, centroids = state
        centroids = jax.lax.dynamic_update_slice_in_dim(
            centroids, farthest[:, None], i, axis=1
        )
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)  # (B, N)
        dists = jnp.minimum(dists, d)
        farthest = jnp.argmax(dists, axis=-1).astype(jnp.int32)
        return dists, farthest, centroids

    init = (
        jnp.full((B, N), 1e10, dtype=jnp.float32),
        start_idx.astype(jnp.int32),
        jnp.zeros((B, npoint), dtype=jnp.int32),
    )
    _, _, centroids = jax.lax.fori_loop(0, npoint, body, init)
    return centroids


@functools.partial(jax.jit, static_argnums=(0, 1))
def query_ball_point(
    radius: Optional[float], nsample: int, xyz: jax.Array, new_xyz: jax.Array
) -> jax.Array:
    """Radius-limited neighbor query.

    Args:
        radius: ball radius; ``None`` selects plain k-nearest (sorted by
            distance) matching model/point_utils.py:107-108.
        nsample: neighbors per query point (static).
        xyz: (B, N, 3) all points.
        new_xyz: (B, S, 3) query points.
    Returns:
        (B, S, nsample) int32 indices. In-radius points are taken in
        ascending index order; if fewer than nsample lie in the ball the
        remainder repeats the first in-ball index (reference padding
        semantics, model/point_utils.py:100-106).
    """
    B, N, _ = xyz.shape
    nsample = min(nsample, N)  # tiny clouds: can't have more neighbors than points
    sqrdists = square_distance(new_xyz, xyz)  # (B, S, N)
    if radius is None:
        # k nearest sorted by distance
        _, idx = jax.lax.top_k(-sqrdists, nsample)
        return idx.astype(jnp.int32)

    iota = jnp.arange(N, dtype=jnp.int32)
    # out-of-ball points get sentinel key N; top_k(-key) selects the nsample
    # smallest keys == smallest in-ball indices, already ascending.
    keys = jnp.where(sqrdists > radius**2, N, iota[None, None, :])
    if jax.default_backend() == "tpu" and N > 128:
        # PartialReduce instead of a full O(N log N) sort (exact at
        # recall 1.0 for these int-valued f32 keys — same trick as
        # _topk_neg_dist); approx_max_k does not guarantee sorted output,
        # so re-sort the nsample selected keys (a lanes-wide sort over
        # nsample << N). PN++'s two ball queries were 7.4 ms/sort each at
        # (64, 512, 1024) — this takes them off the sort path entirely.
        neg_keys, _ = jax.lax.approx_max_k(
            -keys.astype(jnp.float32), nsample, recall_target=1.0
        )
        group_idx = jnp.sort((-neg_keys).astype(jnp.int32), axis=-1)
    else:
        neg_keys, _ = jax.lax.top_k(-keys, nsample)
        group_idx = -neg_keys  # ascending in-ball indices, N where missing
    first = group_idx[..., :1]
    group_idx = jnp.where(group_idx == N, first, group_idx)
    # degenerate guard (empty ball -> everything is sentinel): clamp in-range
    return jnp.minimum(group_idx, N - 1).astype(jnp.int32)


def three_nn_interpolate(
    xyz_dense: jax.Array,
    xyz_coarse: jax.Array,
    feats_coarse: jax.Array,
    k: int = 3,
) -> jax.Array:
    """Inverse-distance-weighted k-NN feature upsampling.

    Args:
        xyz_dense: (B, N, 3) target positions.
        xyz_coarse: (B, S, 3) source positions.
        feats_coarse: (B, S, D) source features.
        k: number of neighbors (3 in the reference).
    Returns:
        (B, N, D) interpolated features.

    Reference: model/point_utils.py:134-165 (``upsample_inter`` without the
    skip concat — callers concat themselves) and the CUDA
    three_nn/three_interpolate pair.
    """
    sqrdists = square_distance(xyz_dense, xyz_coarse)  # (B, N, S)
    neg_d, idx = jax.lax.top_k(-sqrdists, k)  # k smallest distances
    dists = jnp.maximum(-neg_d, 1e-10)
    weight = 1.0 / dists
    weight = weight / jnp.sum(weight, axis=-1, keepdims=True)  # (B, N, k)
    neighbor_feats = index_points(feats_coarse, idx)  # (B, N, k, D)
    return jnp.sum(neighbor_feats * weight[..., None], axis=2)


def chamfer_distance(
    pc1: jax.Array, pc2: jax.Array, per_sample: bool = True
) -> jax.Array:
    """Bidirectional chamfer distance between two batches of clouds.

    Args:
        pc1: (B, N, 3)
        pc2: (B, M, 3)
        per_sample: if True return (B,) ``mean_n min_m d + mean_m min_n d``
            (the reference's ``cd_distance`` with batch_loss=True,
            model/mmd.py:169-175); else a scalar mean.
    Returns:
        (B,) or scalar chamfer distances (squared-distance convention, as the
        pip ``chamfer_distance`` CUDA ext the reference uses).
    """
    B, N, _ = pc1.shape
    M = pc2.shape[1]
    # large clouds: tile via Pallas instead of materializing (B, N, M)
    if (N > 2048 or M > 2048) and jax.default_backend() == "tpu":
        from sug_tpu.ops.pallas_kernels import chamfer_pallas

        return chamfer_pallas(pc1, pc2, per_sample)
    sqrdists = square_distance(pc1, pc2)  # (B, N, M)
    dist1 = jnp.min(sqrdists, axis=2)  # (B, N)
    dist2 = jnp.min(sqrdists, axis=1)  # (B, M)
    per = jnp.mean(dist1, axis=1) + jnp.mean(dist2, axis=1)
    return per if per_sample else jnp.mean(per)


def get_graph_feature(
    x: jax.Array, k: int = 20, idx: Optional[jax.Array] = None
) -> jax.Array:
    """EdgeConv graph feature: concat(neighbor - center, center).

    Args:
        x: (B, N, C) point features.
        k: neighborhood size.
        idx: optional precomputed (B, N, k) neighbor indices.
    Returns:
        (B, N, k, 2C) edge features. Matches reference ``get_graph_feature``
        (model/model_utils.py:188-209) up to layout — reference returns
        (B, 2C, N, k).
    """
    if idx is None:
        idx = knn_indices(x, k)
    neighbors = index_points(x, idx)  # (B, N, k, C)
    center = jnp.broadcast_to(x[:, :, None, :], neighbors.shape)
    return jnp.concatenate([neighbors - center, center], axis=-1)


def sample_and_group(
    npoint: int,
    radius: Optional[float],
    nsample: int,
    xyz: jax.Array,
    feats: Optional[jax.Array],
    start_idx: Optional[jax.Array] = None,
    return_fps_idx: bool = False,
):
    """FPS -> ball query -> gather -> center, PointNet++ style.

    Args:
        npoint: number of sampled centroids.
        radius: ball radius (None = kNN grouping).
        nsample: neighbors per centroid.
        xyz: (B, N, 3).
        feats: optional (B, N, D) features to concat with centered coords.
    Returns:
        new_xyz (B, npoint, 3), new_feats (B, npoint, nsample, 3[+D])
        [, fps_idx (B, npoint)].

    Reference: model/pointnet2_utils.py:107-145.
    """
    fps_idx = farthest_point_sample(xyz, npoint, start_idx)
    new_xyz = index_points(xyz, fps_idx)  # (B, npoint, 3)
    group_idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, group_idx)  # (B, npoint, nsample, 3)
    grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
    if feats is not None:
        grouped_feats = index_points(feats, group_idx)
        new_feats = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
    else:
        new_feats = grouped_xyz
    if return_fps_idx:
        return new_xyz, new_feats, fps_idx
    return new_xyz, new_feats


def sample_and_group_all(
    xyz: jax.Array, feats: Optional[jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """Group the whole cloud into a single region (final SA layer).

    Reference: model/pointnet2_utils.py:148-155.
    """
    B, N, _ = xyz.shape
    new_xyz = jnp.zeros((B, 1, 3), dtype=xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]  # (B, 1, N, 3)
    if feats is not None:
        new_feats = jnp.concatenate([grouped_xyz, feats[:, None, :, :]], axis=-1)
    else:
        new_feats = grouped_xyz
    return new_xyz, new_feats
