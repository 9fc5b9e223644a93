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

# fixed per-level capacities and neighbor counts for N=1024 inputs
LEVEL_FRACTIONS = (1, 4, 16, 32, 64)  # N / frac per level
# The reference caps neighborhoods at 50 (its grid levels are denser);
# measured occupancy on the FPS pyramid at dl=0.05 is 10-16 valid
# neighbors/level, so K=24 keeps the tails while cutting the dominant
# gather traffic ~40% vs K=40 (neighbor slots beyond the cap are masked
# padding that still costs HBM bandwidth).
NEIGHBOR_LIMITS = (24, 24, 24, 24, 16)


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
    neg, _ = jax.lax.top_k(-keys, min(nsample, Ns))
    idx = -neg
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
    def __call__(self, q_pts, s_pts, neighb_idx, neighb_mask, x):
        K = self.num_kpoints
        in_ch = x.shape[-1]
        kp = jnp.asarray(
            load_kernels(
                self.radius, K, 3, self.fixed,
                method=self.kp_method,
                random_init=self.kp_random_init,
                seed=self.kp_seed,
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
            self.sow("regularizers", "min_d2_over_ext2",
                     min_d2 / (self.kp_extent**2))
            self.sow("regularizers", "deformed_kp_over_ext",
                     deformed_kp / self.kp_extent)

        if self.influence == "constant":
            all_weights = jnp.ones_like(sq_d)
        elif self.influence == "linear":
            all_weights = jnp.maximum(1.0 - jnp.sqrt(sq_d) / self.kp_extent, 0.0)
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

        neighb_x = index_points(x, neighb_idx)  # (B, Q, k, Cin)
        neighb_x = neighb_x * neighb_mask[..., None]

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
        out = jnp.einsum(
            "bqpc,pco->bqo", weighted, w, preferred_element_type=jnp.float32
        )

        # normalize by valid-neighbor count (reference counts neighbors with
        # positive feature sums, model/KPConv_blocks.py:445-449 — same intent)
        n_valid = jnp.maximum(jnp.sum(neighb_mask, axis=-1), 1.0)
        return out / n_valid[..., None]


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over the level axis — the
    batched equivalent of the reference's per-cloud InstanceNorm1d
    (model/KPConv_blocks.py:507-563, affine-free like torch's default)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class UnaryBlock(nn.Module):
    """Linear (no bias) + InstanceNorm + leaky_relu(0.1)
    (model/KPConv_blocks.py:565-600)."""

    out_dim: int
    no_relu: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.out_dim, use_bias=False)(x)
        x = InstanceNorm()(x)
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
    def __call__(self, q_pts, s_pts, idx, mask, x):
        x = KPConvOp(
            self.out_dim // 2, self.kp_extent, self.radius,
            self.cfg["num_kernel_points"], self.cfg["KP_influence"],
            self.cfg["aggregation_mode"], self.cfg["fixed_kernel_points"],
            deformable=self.deformable, modulated=self.cfg["modulated"],
            kp_method=self.cfg.get("kp_method", "lloyd"),
            kp_random_init=self.cfg.get("kp_random_init", False),
            kp_seed=self.cfg.get("kp_seed", 0),
            name="KPConv",
        )(q_pts, s_pts, idx, mask, x)
        return nn.leaky_relu(InstanceNorm()(x), 0.1)


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
    def __call__(self, q_pts, s_pts, idx, mask, x):
        in_dim = x.shape[-1]
        h = UnaryBlock(self.out_dim // 4, name="unary1")(x) if in_dim != self.out_dim // 4 else x
        h = KPConvOp(
            self.out_dim // 4, self.kp_extent, self.radius,
            self.cfg["num_kernel_points"], self.cfg["KP_influence"],
            self.cfg["aggregation_mode"], self.cfg["fixed_kernel_points"],
            deformable=self.deformable, modulated=self.cfg["modulated"],
            kp_method=self.cfg.get("kp_method", "lloyd"),
            kp_random_init=self.cfg.get("kp_random_init", False),
            kp_seed=self.cfg.get("kp_seed", 0),
            name="KPConv",
        )(q_pts, s_pts, idx, mask, h)
        h = nn.leaky_relu(InstanceNorm()(h), 0.1)
        h = UnaryBlock(self.out_dim, no_relu=True, name="unary2")(h)

        if self.strided:
            # max-pool features over the stride neighborhood; padded slots
            # contribute zeros (reference max_pool shadow semantics)
            gathered = index_points(x, idx) * mask[..., None]
            shortcut = jnp.max(gathered, axis=2)
        else:
            shortcut = x
        if shortcut.shape[-1] != self.out_dim:
            shortcut = UnaryBlock(self.out_dim, no_relu=True, name="unary_shortcut")(
                shortcut
            )
        return nn.leaky_relu(h + shortcut, 0.1)


def build_pyramid(pc: jax.Array, cfg: dict, fps_start: Optional[jax.Array] = None):
    """Fixed-capacity point pyramid + per-level neighbor/pool indices.

    Replaces PreprocessorGPU (model/KPConv_model.py:563-683).
    Returns dict with 'points' (list of (B,N_l,3)), 'neighbors'/'pools'
    (idx, mask) tuples per level.
    """
    N = pc.shape[1]
    num_layers = cfg["num_layers"]
    r0 = cfg["first_subsampling_dl"] * cfg["conv_radius"]

    points = [pc]
    for lvl in range(1, num_layers):
        n_l = max(N // LEVEL_FRACTIONS[lvl], 4)
        fps_idx = farthest_point_sample(
            points[-1], n_l, fps_start if lvl == 1 else None
        )
        points.append(index_points(points[-1], fps_idx))

    neighbors, pools = [], []
    for lvl in range(num_layers):
        r = r0 * (2**lvl)
        k = min(NEIGHBOR_LIMITS[lvl], points[lvl].shape[1])
        neighbors.append(radius_neighbors_masked(r, k, points[lvl], points[lvl]))
        if lvl + 1 < num_layers:
            pools.append(
                radius_neighbors_masked(r, k, points[lvl], points[lvl + 1])
            )
    return {"points": points, "neighbors": neighbors, "pools": pools}


class KPConvEncoder(nn.Module):
    """The 14-block encoder (KPFEncoder, model/KPConv_model.py:133-203).
    Returns (final feats (B,N4,1024), node tap (B,N1,64) after block 2)."""

    cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, pc, train: bool, fps_start=None):
        cfg = dict(KPCONV_DEFAULTS, **(self.cfg or {}))
        pyr = build_pyramid(pc, cfg, fps_start)

        r = cfg["first_subsampling_dl"] * cfg["conv_radius"]
        in_dim = cfg["in_feats_dim"]
        out_dim = cfg["first_feats_dim"]
        ext_ratio = cfg["KP_extent"] / cfg["conv_radius"]

        x = jnp.ones(pc.shape[:2] + (in_dim,), dtype=pc.dtype)  # ones features
        lvl = 0
        node_tap = None
        for block_i, block in enumerate(cfg["architecture"]):
            strided = "strided" in block
            deform = "deform" in block
            if strided:
                q_pts = pyr["points"][lvl + 1]
                idx, mask = pyr["pools"][lvl]
            else:
                q_pts = pyr["points"][lvl]
                idx, mask = pyr["neighbors"][lvl]
            s_pts = pyr["points"][lvl]

            if block.startswith("simple"):
                x = SimpleBlock(
                    out_dim, r, r * ext_ratio, cfg, deformable=deform,
                    name=f"block{block_i}",
                )(q_pts, s_pts, idx, mask, x)
                in_dim = out_dim // 2
            elif block.startswith("resnetb"):
                x = ResnetBottleneckBlock(
                    out_dim, r, r * ext_ratio, cfg, strided=strided,
                    deformable=deform, name=f"block{block_i}",
                )(q_pts, s_pts, idx, mask, x)
                in_dim = out_dim
            else:
                raise ValueError(f"Unknown block {block}")

            if block_i == 2:
                # the mid-feature tap feeding the DG node features
                # (KPFEncoder.forward, model/KPConv_model.py:196-202)
                node_tap = jax.lax.stop_gradient(x)

            if strided:
                lvl += 1
                r *= 2.0
                out_dim *= 2
        return x, node_tap


def p2p_fitting_regularizer(sown: dict, deform_fitting_power: float = 1.0,
                            repulse_extent: float = 1.2):
    """Fitting + repulsive losses over deformable layers' sown tensors
    (reference model/KPConv_model.py:282-315). ``sown`` is the
    'regularizers' collection from Module.apply(..., mutable=...)."""
    fitting = 0.0
    repulsive = 0.0
    leaves = jax.tree_util.tree_leaves_with_path(sown)
    for path, value in leaves:
        name = str(path[-2].key) if len(path) >= 2 else ""
        if "min_d2_over_ext2" in str(path):
            fitting = fitting + jnp.mean(jnp.abs(value))
        elif "deformed_kp_over_ext" in str(path):
            kp = value  # (B, Q, K, 3)
            K = kp.shape[-2]
            d = jnp.sqrt(
                jnp.sum(
                    (kp[..., :, None, :] - jax.lax.stop_gradient(kp)[..., None, :, :])
                    ** 2,
                    axis=-1,
                )
            )  # (B, Q, K, K)
            eye = jnp.eye(K, dtype=bool)
            clipped = jnp.minimum(d - repulse_extent, 0.0) ** 2
            clipped = jnp.where(eye[None, None], 0.0, clipped)
            repulsive = repulsive + jnp.mean(jnp.sum(clipped, axis=-1)) / K
    return deform_fitting_power * (2.0 * fitting + repulsive)


class KPConvGenerator(nn.Module):
    """DG generator (KPConv_g, model/Model.py:349-386): encoder -> global
    average (B,1024); node features = strided sample of the block-2 tap to
    64 per cloud (sample_tensor_slices, model/KPConv_blocks.py:159-177)."""

    cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, pc, train: bool, fps_start=None):
        feats, node_tap = KPConvEncoder(self.cfg, name="encoder")(pc, train, fps_start)
        global_feat = jnp.mean(feats, axis=1)  # (B, 1024)
        n1 = node_tap.shape[1]
        step = max(n1 // 64, 1)
        node_fea = node_tap[:, ::step][:, :64]  # (B, 64, 64)
        return global_feat, node_fea, None


class KPConvClassifier(nn.Module):
    """Standalone classifier (KPFCls, model/KPConv_model.py:62-96):
    encoder -> global average -> 256 -> 64 -> num_class; mid feature = the
    256-d pre-ReLU activation."""

    num_class: int = 10
    cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, pc, train: bool):
        feats, _ = KPConvEncoder(self.cfg, name="encoder")(pc, train)
        x = jnp.mean(feats, axis=1)
        x = nn.Dense(256, name="fc1")(x)
        mid_feature = x
        x = nn.relu(x)
        x = nn.relu(nn.Dense(64, name="fc2")(x))
        logits = nn.Dense(self.num_class, name="fc3")(x)
        return logits, mid_feature
