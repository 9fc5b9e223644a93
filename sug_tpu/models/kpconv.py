"""KPConv backbone, redesigned for TPU as a fixed-capacity batched pyramid.

Reference (model/KPConv_model.py + model/KPConv_blocks.py, ~1700 LoC):
packed ragged clouds, MinkowskiEngine grid subsampling, pytorch3d radius
neighbors with shadow-index padding, per-cloud InstanceNorm over variable
stack lengths, 14-block simple/resnetb/resnetb_strided architecture with
ones-features input and global average pooling.

TPU redesign (everything static-shape, one compiled graph):
- pyramid levels are FIXED capacities [N, N/4, N/16, N/32, N/64] obtained
  with FPS (uniform-coverage subsampling ~= grid subsampling on normalized
  clouds; the doubling radius schedule r_l = first_dl*conv_radius*2^l is
  kept);
- radius neighbors are a masked fixed-K ball query; the mask replaces the
  reference's shadow-point trick (zero features + ~0 influence for padded
  slots, and exclusion from the neighbor-count normalization);
- per-cloud InstanceNorm becomes a per-sample, per-channel normalization
  over the level axis — exact, since levels have no ragged padding;
- the KPConv correlation is two einsums (influence x neighbors, then the
  (K_pts, Cin, Cout) weight tensor) that XLA maps onto the MXU;
- deformable KPConv keeps the offset-conv + fitting/repulsive regularizer
  (model/KPConv_model.py:282-315), with the per-layer terms exposed through
  a flax 'regularizers' sow collection instead of module attributes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sug_tpu.models.kernel_points import load_kernels
from sug_tpu.models.precision import compute_dtype
from sug_tpu.ops.geometry import farthest_point_sample, index_points, square_distance

# ---------------------------------------------------------------------------
# configuration (parity with KPConvConfig, model/KPConv_model.py:24-59)
# ---------------------------------------------------------------------------

KPCONV_DEFAULTS = dict(
    num_class=10,
    # NOTE: the reference uses dl=0.02 (model/KPConv_model.py:26) against its
    # denser grid-subsampled levels; with the fixed-capacity FPS pyramid that
    # starves the convolutions (80% single-neighbor at L1/L2 on unit-norm
    # clouds). dl=0.05 restores healthy 10-16 neighbor occupancy across all
    # levels (measured on normalized 1024-pt clouds).
    first_subsampling_dl=0.05,
    conv_radius=2.5,
    deform_radius=6.0,
    in_feats_dim=1,
    KP_extent=1.2,
    KP_influence="linear",
    use_batch_norm=True,
    batch_norm_momentum=0.02,
    modulated=False,
    num_kernel_points=15,
    first_feats_dim=64,
    fixed_kernel_points="center",
    aggregation_mode="sum",
    num_layers=5,
    deform_fitting_power=1.0,
    kp_method="lloyd",  # or "gd" (reference kernel_point_optimization_debug)
    kp_random_init=False,  # reference load-time rotation + 0.01 jitter
    kp_seed=0,
    # pyramid construction: "grid" (default) = reference-structured voxel
    # subsampling (MinkowskiEngine quantization + segment mean,
    # model/KPConv_model.py:362-389) rebuilt as fixed-capacity voxel hashing
    # with per-level validity masks; "fps" = the round-2 FPS redesign.
    # Measured on the synthetic transfer benchmark (12-epoch DG, same seed):
    # grid 0.80/0.80 test1/test2 vs fps 0.40/0.43 — the voxel receptive-field
    # structure transfers far better, so it is the default.
    pyramid="grid",
    # the reference uses dl=0.02 (model/KPConv_model.py:26); on unit-norm
    # 1024-pt clouds that starves r0=0.05 balls (see check_neighbor_occupancy
    # warning) — 0.05 gives healthy occupancy and matches the fps pyramid's
    # radius schedule. Recalibrate per dataset (tools/calibrate_kpconv.py).
    grid_dl=0.05,
    grid_capacities=(1024, 512, 256, 96, 48),
    neighbor_limits=None,  # per-level override of NEIGHBOR_LIMITS
    architecture=(
        "simple",
        "resnetb",
        "resnetb_strided",
        "resnetb",
        "resnetb",
        "resnetb_strided",
        "resnetb",
        "resnetb",
        "resnetb_strided",
        "resnetb",
        "resnetb",
        "resnetb_strided",
        "resnetb",
        "resnetb",
    ),
)

def _normalize_cfg(model_cfg) -> dict:
    """Merge-ready MODEL_CFG: YAML configs use UPPERCASE keys by convention
    (e.g. ``--set MODEL_CFG.NEIGHBOR_LIMITS ...``, tools/calibrate_kpconv.py)
    — map them case-insensitively onto the KPCONV_DEFAULTS keys."""
    if not model_cfg:
        return {}
    out = {}
    for k, v in dict(model_cfg).items():
        out[k if k in KPCONV_DEFAULTS else k.lower()] = v
    return out


# fixed per-level capacities and neighbor counts for N=1024 inputs
LEVEL_FRACTIONS = (1, 4, 16, 32, 64)  # N / frac per level
# The reference caps neighborhoods at 50 (its grid levels are denser);
# measured occupancy on the FPS pyramid at dl=0.05 is 10-16 valid
# neighbors/level, so K=24 keeps the tails while cutting the dominant
# gather traffic ~40% vs K=40 (neighbor slots beyond the cap are masked
# padding that still costs HBM bandwidth).
NEIGHBOR_LIMITS = (24, 24, 24, 24, 16)


# half-extent of the voxel coordinate frame; clouds are unit-normalized so
# (-4, 4) leaves generous margin. Shared by grid_subsample_fixed and the
# build_pyramid pre_sorted alignment check.
_GRID_R = 4.0


def _morton3(v: jax.Array) -> jax.Array:
    """Interleave the low 10 bits of 3 int32 voxel coords (..., 3) into a
    Morton (Z-order) code < 2**30. Hierarchical by construction:
    ``_morton3(v >> 1) == _morton3(v) >> 3``."""

    def spread(x):
        x = x & 0x3FF
        x = (x | (x << 16)) & 0x30000FF
        x = (x | (x << 8)) & 0x300F00F
        x = (x | (x << 4)) & 0x30C30C3
        x = (x | (x << 2)) & 0x9249249
        return x

    return (
        (spread(v[..., 0]) << 2) | (spread(v[..., 1]) << 1) | spread(v[..., 2])
    )


def grid_subsample_fixed(
    pc: jax.Array,
    dl: float,
    capacity: int,
    valid: Optional[jax.Array] = None,
    pre_sorted: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fixed-capacity voxel-grid subsampling with segment-mean centroids.

    TPU-native equivalent of the reference's MinkowskiEngine sparse
    quantization (model/KPConv_model.py:362-389): floor-quantize to voxels of
    side ``dl``, average the points in each occupied voxel, return up to
    ``capacity`` centroids (static shape). When more voxels are occupied than
    ``capacity``, a stratified pick over the lexicographic voxel order keeps
    spatial coverage; invalid slots are pushed to distinct far-away sentinels
    so they never fall inside any downstream radius.

    ``pre_sorted``: promise that the VALID rows of ``pc`` are already in
    voxel-MORTON order for the aligned 2x-coarser grid and the invalid rows
    trail at the end. This function's own output satisfies that contract for
    the next power-of-two level: the voxel key is a Morton (Z-order) code,
    which is hierarchical — ``morton(v >> 1) == morton(v) >> 3`` — so a
    sequence sorted by the fine key is already sorted by every aligned
    coarser key (NOT true of lexicographic packing: halving components can
    reorder ties). Pyramid levels >= 2 therefore skip the multi-operand
    sort entirely, which dominated the grid-pyramid step (docs/PERF.md).
    The even-offset alignment (int(R/dl) halves exactly across the
    power-of-two dl schedule) makes child voxel ids exactly ``parent >> 1``
    per axis.

    Args:
        pc: (B, N, 3); coordinates must lie in (-4, 4) (normalized clouds).
        valid: optional (B, N) float/bool mask of real input rows.
    Returns:
        (B, capacity, 3) centroids, (B, capacity) float validity mask.
    """
    B, N, _ = pc.shape
    R = _GRID_R
    K = int(2 * R / dl) + 2
    if K > 1024:
        raise ValueError(
            f"grid_subsample_fixed: dl={dl} gives {K} voxels/axis > the "
            "10-bit Morton budget — raise dl (or extend _morton3)"
        )
    v = jnp.floor(pc / dl).astype(jnp.int32) + int(R / dl)
    v = jnp.clip(v, 0, K - 1)
    key = _morton3(v)  # (B, N) int32 < 2**30
    pad_key = 1 << 30
    if valid is not None:
        key = jnp.where(valid > 0, key, pad_key)

    # Scatter-free segment means: ONE multi-operand sort carries the
    # coordinates with the keys (replacing argsort + gathers), and each
    # voxel's sum is a prefix-sum difference at its segment boundaries.
    # The previous jax.ops.segment_sum formulation lowered to TPU scatters,
    # which serialize and dominated the grid-pyramid step (docs/PERF.md).
    f = pc.astype(jnp.float32)
    if pre_sorted:
        skey, sx, sy, sz = key, f[..., 0], f[..., 1], f[..., 2]
    else:
        skey, sx, sy, sz = jax.lax.sort(
            (key, f[..., 0], f[..., 1], f[..., 2]), dimension=1, num_keys=1
        )
    is_real = skey < pad_key
    w = is_real.astype(jnp.float32)
    is_first = jnp.concatenate(
        [jnp.ones((B, 1), bool), skey[:, 1:] != skey[:, :-1]], axis=1
    ) & is_real
    n_vox = jnp.sum(is_first.astype(jnp.int32), axis=1)  # (B,)
    n_real = jnp.sum(is_real.astype(jnp.int32), axis=1)  # (B,)

    # prefix sums with a leading zero: segment rows [s, e) sum to P[e]-P[s]
    spc = jnp.stack([sx, sy, sz], axis=-1) * w[..., None]
    P = jnp.concatenate(
        [jnp.zeros((B, 1, 3), jnp.float32), jnp.cumsum(spc, axis=1)], axis=1
    )  # (B, N+1, 3)
    Pw = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), jnp.cumsum(w, axis=1)], axis=1
    )  # (B, N+1)

    # segment start rows in voxel-rank order (ranks >= n_vox get sentinel N)
    iota_n = jnp.arange(N, dtype=jnp.int32)
    (starts,) = jax.lax.sort((jnp.where(is_first, iota_n[None, :], N),), dimension=1)

    i = jnp.arange(capacity, dtype=jnp.int32)
    strat = (i[None, :] * n_vox[:, None]) // jnp.maximum(capacity, 1)
    head = jnp.minimum(i[None, :], jnp.maximum(n_vox[:, None] - 1, 0))
    take = jnp.where(n_vox[:, None] > capacity, strat, head)  # (B, cap) ranks

    s_row = jnp.take_along_axis(starts, take, axis=1)  # (B, cap)
    nxt_row = jnp.take_along_axis(starts, jnp.minimum(take + 1, N - 1), axis=1)
    e_row = jnp.where(take + 1 < n_vox[:, None], nxt_row, n_real[:, None])
    # n_vox == 0 (fully padded cloud): starts[0] is the sentinel N and
    # e_row is 0; the slots are sentinel-overwritten below, the P/Pw
    # gathers just need to stay in bounds (P has N+1 rows).
    s_row = jnp.minimum(s_row, N)

    seg_sum = jnp.take_along_axis(P, e_row[..., None], axis=1) - jnp.take_along_axis(
        P, s_row[..., None], axis=1
    )
    cnt = jnp.take_along_axis(Pw, e_row, axis=1) - jnp.take_along_axis(Pw, s_row, axis=1)
    out = (seg_sum / jnp.maximum(cnt, 1.0)[..., None]).astype(pc.dtype)

    out_valid = (i[None, :] < n_vox[:, None]).astype(pc.dtype)
    sentinel = (1e6 + 10.0 * i.astype(pc.dtype)).astype(pc.dtype)
    out = jnp.where(
        out_valid[..., None] > 0, out, sentinel[None, :, None]
    )
    return out, out_valid


def radius_neighbors_masked(
    radius: float, nsample: int, s_pts: jax.Array, q_pts: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Fixed-K radius neighbors with validity mask.

    Returns (idx (B,Q,K) int32 clamped in-range, mask (B,Q,K) float 0/1).
    In-radius points are taken in ascending index order (the reference's
    pytorch3d ball_query ordering is distance-based; order is irrelevant to
    the symmetric sums downstream).
    """
    B, Ns, _ = s_pts.shape
    sqr = square_distance(q_pts, s_pts)
    iota = jnp.arange(Ns, dtype=jnp.int32)
    keys = jnp.where(sqr > radius**2, Ns, iota[None, None, :])
    kk = min(nsample, Ns)
    # top-k smallest keys. On TPU approx_max_k at recall 1.0 is EXACT and
    # hits the PartialReduce hardware op instead of a full sort (same trick
    # as ops.geometry._topk_neg_dist; keys <= Ns <= a few thousand are
    # exactly representable in f32). Selection order may differ from
    # lax.top_k's sorted order — irrelevant to the symmetric sums downstream.
    neg_keys = -keys.astype(jnp.float32)
    if jax.default_backend() == "tpu":
        vals, _ = jax.lax.approx_max_k(neg_keys, kk, recall_target=1.0)
    else:
        vals, _ = jax.lax.top_k(neg_keys, kk)
    idx = (-vals).astype(jnp.int32)
    mask = (idx < Ns).astype(jnp.float32)
    return jnp.minimum(idx, Ns - 1), mask


class KPConvOp(nn.Module):
    """The kernel-point convolution (reference model/KPConv_blocks.py:208-453).

    Inputs: q_pts (B,Q,3), s_pts (B,S,3), x (B,S,Cin), neighbor idx/mask.
    Output: (B,Q,Cout).
    """

    out_channels: int
    kp_extent: float
    radius: float
    num_kpoints: int = 15
    influence: str = "linear"
    aggregation: str = "sum"
    fixed: str = "center"
    deformable: bool = False
    modulated: bool = False
    # reference load-time disposition options (model/KPConv_kernels.py:417+):
    # kp_method 'gd' uses the gradient-descent optimizer; kp_random_init adds
    # the per-instance z-rotation + 0.01 jitter. Defaults stay deterministic.
    kp_method: str = "lloyd"
    kp_random_init: bool = False
    kp_seed: int = 0

    @nn.compact
    def __call__(self, q_pts, s_pts, neighb_idx, neighb_mask, x, q_mask=None):
        K = self.num_kpoints
        in_ch = x.shape[-1]
        # The reference calls load_kernels per layer with fresh global-RNG
        # draws, so every KPConv layer gets an INDEPENDENT rotation + jitter
        # (model/KPConv_kernels.py:417+). Fold the flax module path into the
        # seed so layers differ while the whole model stays deterministic.
        seed = self.kp_seed
        if self.kp_random_init:
            import zlib

            path = "/".join(self.scope.path) if self.scope is not None else (self.name or "")
            seed = (int(seed) + zlib.crc32(path.encode())) % (2**31)
        kp = jnp.asarray(
            load_kernels(
                self.radius, K, 3, self.fixed,
                method=self.kp_method,
                random_init=self.kp_random_init,
                seed=seed,
            )
        )  # (K, 3)

        neighbors = index_points(s_pts, neighb_idx)  # (B, Q, k, 3)
        neighbors = neighbors - q_pts[:, :, None, :]

        if self.deformable:
            offset_dim = (4 if self.modulated else 3) * K
            offset_feats = KPConvOp(
                offset_dim, self.kp_extent, self.radius, K,
                self.influence, self.aggregation, self.fixed,
                kp_method=self.kp_method, kp_random_init=self.kp_random_init,
                kp_seed=self.kp_seed, name="offset_conv",
            )(q_pts, s_pts, neighb_idx, neighb_mask, x)
            offset_feats = offset_feats + self.param(
                "offset_bias", nn.initializers.zeros, (offset_dim,)
            )
            B, Q = offset_feats.shape[:2]
            if self.modulated:
                unscaled = offset_feats[..., : 3 * K].reshape(B, Q, K, 3)
                modulations = 2.0 * jax.nn.sigmoid(offset_feats[..., 3 * K :])
            else:
                unscaled = offset_feats.reshape(B, Q, K, 3)
                modulations = None
            deformed_kp = unscaled * self.kp_extent + kp  # (B, Q, K, 3)
        else:
            modulations = None
            deformed_kp = None

        # |n - kp|^2 via the matmul trick: avoids materializing the 5-D
        # (B, Q, k, K, 3) difference tensor (118MB at L0 for B=16) and puts
        # the cross term on the MXU; clamped >= 0 for the sqrt downstream.
        n_sq = jnp.sum(neighbors**2, axis=-1)  # (B, Q, k)
        if deformed_kp is not None:
            cross = jnp.einsum(
                "bqkc,bqpc->bqkp", neighbors, deformed_kp,
                preferred_element_type=jnp.float32,
            )
            kp_sq = jnp.sum(deformed_kp**2, axis=-1)  # (B, Q, K)
            sq_d = n_sq[..., None] - 2.0 * cross + kp_sq[:, :, None, :]
        else:
            cross = jnp.einsum(
                "bqkc,pc->bqkp", neighbors, kp,
                preferred_element_type=jnp.float32,
            )
            kp_sq = jnp.sum(kp**2, axis=-1)  # (K,)
            sq_d = n_sq[..., None] - 2.0 * cross + kp_sq
        sq_d = jnp.maximum(sq_d, 0.0)  # (B, Q, k, K)

        if self.deformable:
            # distances for the fitting regularizer: min over VALID neighbors
            masked_sq = jnp.where(
                neighb_mask[..., None] > 0, sq_d, jnp.full_like(sq_d, 1e12)
            )
            min_d2 = jnp.min(masked_sq, axis=2)  # (B, Q, K)
            if q_mask is not None:
                # grid-pyramid pad queries: zero their (garbage, huge)
                # distances AND sow the mask itself so
                # p2p_fitting_regularizer can take a true masked MEAN —
                # multiplying alone would deflate the fitting mean with
                # injected zeros and collapse pad rows' kernel points onto
                # each other (counted as K-1 overlapping pairs by the
                # repulsive term).
                min_d2 = min_d2 * q_mask[..., None]
                self.sow("regularizers", "q_mask", q_mask)
            self.sow("regularizers", "min_d2_over_ext2",
                     min_d2 / (self.kp_extent**2))
            self.sow("regularizers", "deformed_kp_over_ext",
                     deformed_kp / self.kp_extent)

        if self.influence == "constant":
            all_weights = jnp.ones_like(sq_d)
        elif self.influence == "linear":
            # sqrt clamped away from 0: a self-neighbor offset against the
            # center kernel point gives sq_d == 0 exactly, and sqrt's grad at
            # 0 is inf — with a starved (single-neighbor) ball that inf is
            # not diluted and NaNs the weight gradients. 1e-12 shifts the
            # distance by <=1e-6, invisible at kp_extent scale.
            all_weights = jnp.maximum(
                1.0 - jnp.sqrt(jnp.maximum(sq_d, 1e-12)) / self.kp_extent, 0.0
            )
        elif self.influence == "gaussian":
            sigma = self.kp_extent * 0.3
            all_weights = jnp.exp(-sq_d / (2.0 * sigma**2))
        else:
            raise ValueError(f"Unknown influence {self.influence}")

        if self.aggregation == "closest":
            closest = jnp.argmin(sq_d, axis=-1)  # (B, Q, k)
            all_weights = all_weights * jax.nn.one_hot(closest, K)
        elif self.aggregation != "sum":
            raise ValueError("aggregation must be 'closest' or 'sum'")

        # shadow semantics: padded neighbor slots contribute nothing
        all_weights = all_weights * neighb_mask[..., None]

        # PRECISION: bf16 — geometry (sq_d, influence) stays f32 above;
        # the VALUE side (neighbor-feature gather + the two contractions,
        # the step's dominant HBM traffic: (B,Q,k,Cin) and (B,Q,k,K)) runs
        # in bf16 with f32 accumulation, mirroring the EdgeConv kernel's
        # values_bf16 mode.
        dt = compute_dtype()
        if dt is not None:
            all_weights = all_weights.astype(dt)
            x = x.astype(dt)
        neighb_x = index_points(x, neighb_idx)  # (B, Q, k, Cin)
        neighb_x = neighb_x * neighb_mask[..., None].astype(neighb_x.dtype)

        # influence-weighted neighbor features: (B, Q, K, Cin)
        weighted = jnp.einsum(
            "bqkp,bqkc->bqpc", all_weights, neighb_x,
            preferred_element_type=jnp.float32,
        )
        if modulations is not None:
            weighted = weighted * modulations[..., None]

        w = self.param(
            "weights",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (K, in_ch, self.out_channels),
        )
        if dt is not None:
            weighted, w = weighted.astype(dt), w.astype(dt)
        out = jnp.einsum(
            "bqpc,pco->bqo", weighted, w, preferred_element_type=jnp.float32
        )

        # normalize by valid-neighbor count (reference counts neighbors with
        # positive feature sums, model/KPConv_blocks.py:445-449 — same intent).
        # Deformable parity detail: the reference re-gathers only IN-RANGE
        # neighbors (within KP_extent of some deformed kernel point,
        # KP_blocks.py:365-390) before counting, so a valid neighbor outside
        # every kernel point's reach is excluded from the denominator — its
        # influence is already zero, but the normalization changes. Mirror it.
        if self.deformable:
            in_range = jnp.any(sq_d < self.kp_extent**2, axis=-1)  # (B, Q, k)
            count_mask = neighb_mask * in_range.astype(neighb_mask.dtype)
        else:
            count_mask = neighb_mask
        n_valid = jnp.maximum(jnp.sum(count_mask, axis=-1), 1.0)
        return out / n_valid[..., None]


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over the level axis — the
    batched equivalent of the reference's per-cloud InstanceNorm1d
    (model/KPConv_blocks.py:507-563, affine-free like torch's default).

    ``mask`` (B, N): grid-pyramid validity — statistics run over valid rows
    only (the reference normalizes each variable-length cloud exactly; pad
    rows are zeroed on output so nothing leaks downstream)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        # statistics in f32 regardless of the bf16 policy (mirrors flax
        # BatchNorm); output is f32 — the next Dense re-casts to the policy
        x = x.astype(jnp.float32)
        if mask is None:
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        m = mask[..., None]
        n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * m, axis=1, keepdims=True) / n
        var = jnp.sum((x - mean) ** 2 * m, axis=1, keepdims=True) / n
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * m


class UnaryBlock(nn.Module):
    """Linear (no bias) + InstanceNorm + leaky_relu(0.1)
    (model/KPConv_blocks.py:565-600)."""

    out_dim: int
    no_relu: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        x = nn.Dense(self.out_dim, use_bias=False, dtype=compute_dtype())(x)
        x = InstanceNorm()(x, mask)
        if not self.no_relu:
            x = nn.leaky_relu(x, 0.1)
        return x


class SimpleBlock(nn.Module):
    """KPConv(out/2) + norm + leaky_relu (model/KPConv_blocks.py:623-679)."""

    out_dim: int
    radius: float
    kp_extent: float
    cfg: dict
    deformable: bool = False

    @nn.compact
    def __call__(self, q_pts, s_pts, idx, mask, x, q_mask=None):
        x = KPConvOp(
            self.out_dim // 2, self.kp_extent, self.radius,
            self.cfg["num_kernel_points"], self.cfg["KP_influence"],
            self.cfg["aggregation_mode"], self.cfg["fixed_kernel_points"],
            deformable=self.deformable, modulated=self.cfg["modulated"],
            kp_method=self.cfg.get("kp_method", "lloyd"),
            kp_random_init=self.cfg.get("kp_random_init", False),
            kp_seed=self.cfg.get("kp_seed", 0),
            name="KPConv",
        )(q_pts, s_pts, idx, mask, x, q_mask)
        return nn.leaky_relu(InstanceNorm()(x, q_mask), 0.1)


class ResnetBottleneckBlock(nn.Module):
    """unary(out/4) -> KPConv(out/4) -> unary(out, no relu) + shortcut
    (max-pooled over the stride neighborhood when strided)
    (model/KPConv_blocks.py:682-779)."""

    out_dim: int
    radius: float
    kp_extent: float
    cfg: dict
    strided: bool = False
    deformable: bool = False

    @nn.compact
    def __call__(self, q_pts, s_pts, idx, mask, x, s_mask=None, q_mask=None):
        in_dim = x.shape[-1]
        h = UnaryBlock(self.out_dim // 4, name="unary1")(x, s_mask) if in_dim != self.out_dim // 4 else x
        h = KPConvOp(
            self.out_dim // 4, self.kp_extent, self.radius,
            self.cfg["num_kernel_points"], self.cfg["KP_influence"],
            self.cfg["aggregation_mode"], self.cfg["fixed_kernel_points"],
            deformable=self.deformable, modulated=self.cfg["modulated"],
            kp_method=self.cfg.get("kp_method", "lloyd"),
            kp_random_init=self.cfg.get("kp_random_init", False),
            kp_seed=self.cfg.get("kp_seed", 0),
            name="KPConv",
        )(q_pts, s_pts, idx, mask, h, q_mask)
        h = nn.leaky_relu(InstanceNorm()(h, q_mask), 0.1)
        h = UnaryBlock(self.out_dim, no_relu=True, name="unary2")(h, q_mask)

        if self.strided:
            # max-pool features over the stride neighborhood; padded slots
            # contribute zeros (reference max_pool shadow semantics).
            # bf16 policy: gather values at half width (max is exact in any
            # precision; inputs are bf16-rounded either way)
            dt = compute_dtype()
            xv = x.astype(dt) if dt is not None else x
            gathered = index_points(xv, idx) * mask[..., None].astype(xv.dtype)
            shortcut = jnp.max(gathered, axis=2).astype(jnp.float32)
        else:
            shortcut = x
        if shortcut.shape[-1] != self.out_dim:
            shortcut = UnaryBlock(self.out_dim, no_relu=True, name="unary_shortcut")(
                shortcut, q_mask
            )
        return nn.leaky_relu(h + shortcut, 0.1)


def build_pyramid(pc: jax.Array, cfg: dict, fps_start: Optional[jax.Array] = None):
    """Fixed-capacity point pyramid + per-level neighbor/pool indices.

    Replaces PreprocessorGPU (model/KPConv_model.py:563-683). Two modes:

    - ``pyramid: fps`` (default): FPS to N/LEVEL_FRACTIONS points per level —
      every level row is valid ('valid' is None).
    - ``pyramid: grid``: voxel-grid subsample of the previous level at
      ``grid_dl * 2**lvl`` (the reference's grid structure) with fixed
      capacities; 'valid' holds per-level (B, N_l) masks. Invalid slots sit
      at far sentinels, so radius queries exclude them automatically.

    Returns dict with 'points' (list of (B,N_l,3)), 'neighbors'/'pools'
    (idx, mask) tuples per level, 'valid' (list of masks or None).
    """
    N = pc.shape[1]
    num_layers = cfg["num_layers"]
    grid_mode = cfg.get("pyramid", "fps") == "grid"
    dl = cfg["grid_dl"] if grid_mode else cfg["first_subsampling_dl"]
    r0 = dl * cfg["conv_radius"]

    points = [pc]
    valids = None
    if grid_mode:
        caps = cfg["grid_capacities"]
        valids = [jnp.ones(pc.shape[:2], pc.dtype)]
        for lvl in range(1, num_layers):
            cap = min(int(caps[lvl]), points[-1].shape[1])
            # levels >= 2 consume grid_subsample_fixed's own output, which is
            # already voxel-MORTON ordered for the aligned 2x coarser grid
            # (valid prefix, pads trailing) — skip their sorts. Alignment
            # requires the integer voxel offset int(R/dl) to halve EXACTLY
            # between the two levels (then child voxel ids are parent >> 1
            # per axis); true for power-of-two-friendly dl like the default
            # 0.05, but an arbitrary MODEL_CFG.grid_dl (e.g. 0.03 -> offsets
            # 66 vs 33... then 133 != 2*66) breaks it — fall back to sorting
            # rather than silently mis-segmenting the voxels.
            aligned = int(_GRID_R / (dl * 2 ** (lvl - 1))) == 2 * int(
                _GRID_R / (dl * 2 ** lvl)
            )
            p, v = grid_subsample_fixed(
                points[-1], dl * (2 ** lvl), cap, valid=valids[-1],
                pre_sorted=(lvl >= 2 and aligned),
            )
            points.append(p)
            valids.append(v)
    else:
        for lvl in range(1, num_layers):
            n_l = max(N // LEVEL_FRACTIONS[lvl], 4)
            fps_idx = farthest_point_sample(
                points[-1], n_l, fps_start if lvl == 1 else None
            )
            points.append(index_points(points[-1], fps_idx))

    limits = cfg.get("neighbor_limits") or NEIGHBOR_LIMITS
    neighbors, pools = [], []
    for lvl in range(num_layers):
        r = r0 * (2**lvl)
        k = min(int(limits[lvl]), points[lvl].shape[1])
        neighbors.append(radius_neighbors_masked(r, k, points[lvl], points[lvl]))
        if lvl + 1 < num_layers:
            pools.append(
                radius_neighbors_masked(r, k, points[lvl], points[lvl + 1])
            )
    return {"points": points, "neighbors": neighbors, "pools": pools, "valid": valids}


def check_neighbor_occupancy(sample_pts, model_cfg=None, logger=None, batch=8):
    """Startup calibration guard — the reference calibrates neighbor capacity
    at model build (calibrate_neighbors, model/KPConv_model.py:848-880); the
    fixed-capacity pyramid made that a tool (tools/calibrate_kpconv.py), and
    this check runs a cheap version of it automatically at trainer init.

    Probes the configured pyramid on a sample of REAL training clouds and
    returns per-level mean valid-neighbor counts; logs a warning when any
    level is starved (mean < 4 in-radius neighbors: the convolutions see
    almost no support and the InstanceNorm chain degenerates — raise
    first_subsampling_dl / grid_dl) or saturated (mean at the K cap:
    neighborhoods are being truncated — raise NEIGHBOR_LIMITS).
    """
    import numpy as np

    cfg = dict(KPCONV_DEFAULTS, **_normalize_cfg(model_cfg))
    pc = jnp.asarray(np.asarray(sample_pts[:batch], dtype=np.float32))
    pyr = jax.jit(lambda p: build_pyramid(p, cfg))(pc)
    limits = cfg.get("neighbor_limits") or NEIGHBOR_LIMITS
    means = []
    for lvl, (_, mask) in enumerate(pyr["neighbors"]):
        counts = np.asarray(jnp.sum(mask, axis=-1))  # (B, N_l)
        if pyr["valid"] is not None:
            v = np.asarray(pyr["valid"][lvl]) > 0
            counts = counts[v] if v.any() else counts
        means.append(float(counts.mean()))
    msg = ", ".join(f"L{i}={m:.1f}" for i, m in enumerate(means))
    emit = logger.info if logger is not None else print
    emit(f"KPConv pyramid occupancy (mean valid neighbors/level): {msg}")
    for lvl, m in enumerate(means):
        k = min(int(limits[lvl]), pyr["points"][lvl].shape[1])
        if m < 4.0 and logger is not None:
            logger.warning(
                f"KPConv level {lvl} is STARVED (mean {m:.1f} neighbors < 4): "
                "convolutions see almost no support — raise "
                "MODEL_CFG.first_subsampling_dl (fps) / MODEL_CFG.grid_dl "
                "(grid) or recalibrate with tools/calibrate_kpconv.py"
            )
        elif m > 0.95 * k and logger is not None:
            logger.warning(
                f"KPConv level {lvl} SATURATES its K={k} cap (mean {m:.1f}): "
                "neighborhoods are truncated — raise MODEL_CFG.NEIGHBOR_LIMITS"
            )
    return means


class KPConvEncoder(nn.Module):
    """The 14-block encoder (KPFEncoder, model/KPConv_model.py:133-203).
    Returns (final feats (B,N4,1024), node tap (B,N1,64) after block 2)."""

    cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, pc, train: bool, fps_start=None):
        cfg = dict(KPCONV_DEFAULTS, **_normalize_cfg(self.cfg))
        pyr = build_pyramid(pc, cfg, fps_start)

        r = cfg["first_subsampling_dl"] * cfg["conv_radius"]
        in_dim = cfg["in_feats_dim"]
        out_dim = cfg["first_feats_dim"]
        ext_ratio = cfg["KP_extent"] / cfg["conv_radius"]

        x = jnp.ones(pc.shape[:2] + (in_dim,), dtype=pc.dtype)  # ones features
        lvl = 0
        node_tap = None
        node_tap_mask = None
        valids = pyr.get("valid")
        vmask = lambda l: None if valids is None else valids[l]  # noqa: E731
        for block_i, block in enumerate(cfg["architecture"]):
            strided = "strided" in block
            deform = "deform" in block
            if strided:
                q_pts = pyr["points"][lvl + 1]
                idx, mask = pyr["pools"][lvl]
                q_mask = vmask(lvl + 1)
            else:
                q_pts = pyr["points"][lvl]
                idx, mask = pyr["neighbors"][lvl]
                q_mask = vmask(lvl)
            s_pts = pyr["points"][lvl]

            if block.startswith("simple"):
                x = SimpleBlock(
                    out_dim, r, r * ext_ratio, cfg, deformable=deform,
                    name=f"block{block_i}",
                )(q_pts, s_pts, idx, mask, x, q_mask)
                in_dim = out_dim // 2
            elif block.startswith("resnetb"):
                x = ResnetBottleneckBlock(
                    out_dim, r, r * ext_ratio, cfg, strided=strided,
                    deformable=deform, name=f"block{block_i}",
                )(q_pts, s_pts, idx, mask, x, s_mask=vmask(lvl), q_mask=q_mask)
                in_dim = out_dim
            else:
                raise ValueError(f"Unknown block {block}")

            if block_i == 2:
                # the mid-feature tap feeding the DG node features
                # (KPFEncoder.forward, model/KPConv_model.py:196-202)
                node_tap = jax.lax.stop_gradient(x)
                node_tap_mask = q_mask

            if strided:
                lvl += 1
                r *= 2.0
                out_dim *= 2
        return x, node_tap, vmask(lvl), node_tap_mask


def p2p_fitting_regularizer(sown: dict, deform_fitting_power: float = 1.0,
                            repulse_extent: float = 1.2):
    """Fitting + repulsive losses over deformable layers' sown tensors
    (reference model/KPConv_model.py:282-315). ``sown`` is the
    'regularizers' collection from Module.apply(..., mutable=...).

    When a layer also sowed a ``q_mask`` (grid-pyramid pad queries), both
    terms are TRUE masked means over valid rows — the reference computes
    them over real points only (its clouds are packed, never padded);
    averaging in pad rows would deflate the fitting term and count each pad
    row's (garbage) kernel points as overlapping pairs in the repulsion."""
    fitting = 0.0
    repulsive = 0.0
    # group each deformable layer's sown leaves by module path + sow index so
    # its q_mask pairs with its tensors
    groups: dict = {}
    for path, value in jax.tree_util.tree_leaves_with_path(sown):
        if len(path) >= 2:
            name = str(path[-2].key) if hasattr(path[-2], "key") else str(path[-2])
            gkey = tuple(str(p) for p in path[:-2]) + (str(path[-1]),)
        else:
            name, gkey = str(path), ()
        groups.setdefault(gkey, {})[name] = value
    for group in groups.values():
        qm = group.get("q_mask")  # (B, Q) or None
        min_d2 = group.get("min_d2_over_ext2")
        kp = group.get("deformed_kp_over_ext")
        if min_d2 is not None:
            if qm is None:
                fitting = fitting + jnp.mean(jnp.abs(min_d2))
            else:
                K = min_d2.shape[-1]
                denom = jnp.maximum(jnp.sum(qm), 1.0) * K
                fitting = fitting + jnp.sum(jnp.abs(min_d2)) / denom
        if kp is not None:  # (B, Q, K, 3)
            K = kp.shape[-2]
            # clamp before sqrt: the diagonal is exactly 0 and sqrt's grad
            # there is inf — the eye-masked where would turn the zero
            # cotangent into 0*inf = NaN
            d = jnp.sqrt(
                jnp.maximum(
                    jnp.sum(
                        (kp[..., :, None, :]
                         - jax.lax.stop_gradient(kp)[..., None, :, :]) ** 2,
                        axis=-1,
                    ),
                    1e-12,
                )
            )  # (B, Q, K, K)
            eye = jnp.eye(K, dtype=bool)
            clipped = jnp.minimum(d - repulse_extent, 0.0) ** 2
            clipped = jnp.where(eye[None, None], 0.0, clipped)
            # reference: sum_i mean_pts(sum_j clipped_ij) / K
            # == mean over rows of the full (K, K) clipped sum, divided by K
            # (model/KPConv_model.py:308-313) — NOT a mean over the i axis
            row_sums = jnp.sum(clipped, axis=(-1, -2))  # (B, Q)
            if qm is None:
                repulsive = repulsive + jnp.mean(row_sums) / K
            else:
                denom = jnp.maximum(jnp.sum(qm), 1.0)
                repulsive = repulsive + jnp.sum(row_sums * qm) / denom / K
    return deform_fitting_power * (2.0 * fitting + repulsive)


def _masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Global average over valid level rows (reference global_average,
    model/KPConv_model.py:111-131 — averages each variable-length cloud)."""
    if mask is None:
        return jnp.mean(x, axis=1)
    m = mask[..., None]
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def _sample_tensor_slices(
    tap: jax.Array, mask: Optional[jax.Array], n_out: int
) -> jax.Array:
    """Strided sample of ``n_out`` rows per cloud from the tap level —
    reference sample_tensor_slices (model/KPConv_blocks.py:159-177) strides
    over each cloud's VALID rows. With a grid-pyramid mask the stride is
    computed from the per-cloud valid count (valid rows sort first, so row
    indices < count are valid); duplicates fill when count < n_out."""
    n1 = tap.shape[1]
    if mask is None:
        step = max(n1 // n_out, 1)
        return tap[:, ::step][:, :n_out]
    cnt = jnp.sum(mask.astype(jnp.int32), axis=1)  # (B,)
    i = jnp.arange(n_out, dtype=jnp.int32)
    strided = (i[None, :] * cnt[:, None]) // n_out
    head = jnp.minimum(i[None, :], jnp.maximum(cnt[:, None] - 1, 0))
    take = jnp.where(cnt[:, None] >= n_out, strided, head)
    return jnp.take_along_axis(tap, take[..., None], axis=1)


class KPConvGenerator(nn.Module):
    """DG generator (KPConv_g, model/Model.py:349-386): encoder -> global
    average (B,1024); node features = strided sample of the block-2 tap to
    64 per cloud (sample_tensor_slices, model/KPConv_blocks.py:159-177)."""

    cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, pc, train: bool, fps_start=None):
        feats, node_tap, final_mask, tap_mask = KPConvEncoder(
            self.cfg, name="encoder"
        )(pc, train, fps_start)
        global_feat = _masked_mean(feats, final_mask)  # (B, 1024)
        node_fea = _sample_tensor_slices(node_tap, tap_mask, 64)  # (B, 64, 64)
        return global_feat, node_fea, None


class KPConvClassifier(nn.Module):
    """Standalone classifier (KPFCls, model/KPConv_model.py:62-96):
    encoder -> global average -> 256 -> 64 -> num_class; mid feature = the
    256-d pre-ReLU activation."""

    num_class: int = 10
    cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, pc, train: bool):
        feats, _, final_mask, _ = KPConvEncoder(self.cfg, name="encoder")(pc, train)
        x = _masked_mean(feats, final_mask)
        x = nn.Dense(256, name="fc1")(x)
        mid_feature = x
        x = nn.relu(x)
        x = nn.relu(nn.Dense(64, name="fc2")(x))
        logits = nn.Dense(self.num_class, name="fc3")(x)
        return logits, mid_feature
