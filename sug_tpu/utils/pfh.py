"""Point Feature Histogram descriptors (PFH / SPFH / FPFH), TPU-native.

Reference: utils/pfh.py (660 LoC) — exploratory dataset-distance analysis
with per-cloud python loops + a multiprocessing pool. Here the whole
descriptor — normal estimation (neighborhood PCA), Darboux-frame angle
features (alpha, phi, theta), histogram binning, FPFH distance weighting —
is a jittable, vmappable jax program: one call descriptors a full batch of
clouds on device.

API surface kept: ``get_pfh_descriptor(pcs, method)`` -> per-cloud pooled
histograms, ``pfh_hist_distance(histS, histT)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sug_tpu.ops.geometry import index_points, knn_indices


def estimate_normals(pc: jax.Array, k: int = 8) -> jax.Array:
    """Per-point normals via neighborhood-covariance PCA.

    Args:
        pc: (B, N, 3)
    Returns:
        (B, N, 3) unit normals (sign-disambiguated toward the origin view,
        reference PFH.calc_normals semantics, utils/pfh.py:270-301).
    """
    idx = knn_indices(pc, k)
    nbrs = index_points(pc, idx)  # (B, N, k, 3)
    centered = nbrs - jnp.mean(nbrs, axis=2, keepdims=True)
    cov = jnp.einsum("bnki,bnkj->bnij", centered, centered) / k
    # eigenvector of the smallest eigenvalue
    _, eigvecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    normals = eigvecs[..., 0]  # (B, N, 3)
    # orient toward the viewpoint (origin): flip if n . (vp - p) < 0
    flip = jnp.sum(normals * (-pc), axis=-1, keepdims=True) < 0
    return jnp.where(flip, -normals, normals)


def darboux_features(
    p1: jax.Array, n1: jax.Array, p2: jax.Array, n2: jax.Array
) -> jax.Array:
    """(alpha, phi, theta) angle features between oriented point pairs
    (reference calcHistArray math, utils/pfh.py:303-349). Inputs broadcast;
    returns (..., 3)."""
    d = p2 - p1
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12
    u = n1
    v = jnp.cross(d / dist, u)
    w = jnp.cross(u, v)
    alpha = jnp.sum(v * n2, axis=-1)
    phi = jnp.sum(u * d, axis=-1) / dist[..., 0]
    theta = jnp.arctan2(jnp.sum(w * n2, axis=-1), jnp.sum(u * n2, axis=-1))
    return jnp.stack([alpha, phi, theta], axis=-1)


def _bin_features(feats: jax.Array, div: int) -> jax.Array:
    """Histogram the 3 angle features into div bins each, concatenated
    (SPFH binning; the reference's full-PFH uses div^3 joint bins — the
    concatenated marginal variant is the standard FPFH formulation)."""
    # feature ranges: alpha, phi in [-1, 1]; theta in [-pi, pi]
    lo = jnp.array([-1.0, -1.0, -np.pi])
    hi = jnp.array([1.0, 1.0, np.pi])
    scaled = (feats - lo) / (hi - lo)  # (..., K, 3) in [0, 1]
    bins = jnp.clip((scaled * div).astype(jnp.int32), 0, div - 1)
    onehots = jax.nn.one_hot(bins, div)  # (..., K, 3, div)
    hist = jnp.mean(onehots, axis=-3)  # (..., 3, div)
    return hist.reshape(hist.shape[:-2] + (3 * div,))


def pfh_joint(pc: jax.Array, normals: jax.Array, k: int = 8, div: int = 5) -> jax.Array:
    """Full PFH: div**3 JOINT histogram over all C(k+1, 2) point pairs inside
    each point's {self + k neighbors} neighborhood — parity with the
    reference's calcHistArray/calc_pfh_hist (utils/pfh.py:303-349, :497-520):

    - pair orientation is canonicalized by the smaller normal/connecting-vector angle
      (arccos is decreasing, so the reference condition
      ``arccos(n_a.(p_b-p_a)) <= arccos(n_b.(p_a-p_b))`` is the comparison of
      the dot products);
    - theta uses ``arctan`` (range -pi/2..pi/2), not arctan2 — reference :341;
    - bins: alpha, phi thresholds at -1 + i*2/div, theta at -pi/2 + i*pi/div,
      joint index ``b_alpha + b_phi*div + b_theta*div**2`` (reference :505-518);
    - histogram normalized by C(k+1, 2) (reference :347).

    (B, N, 3) -> (B, N, div**3).
    """
    B, N, _ = pc.shape
    # neighborhood = {self + k distinct neighbors}: knn_indices is
    # self-inclusive (self is each point's nearest at distance 0), so asking
    # for k+1 yields exactly the reference's p_list = [i] + indNeigh[i]
    # (reference utils/pfh.py:267 pops self from the neighbor list before
    # prepending it). Prepending self to a self-inclusive kNN would
    # double-count it and drop one true neighbor.
    members = knn_indices(pc, k + 1)  # (B, N, n), n = k+1
    mp = index_points(pc, members)  # (B, N, n, 3)
    mn = index_points(normals, members)
    n = k + 1

    pa = mp[:, :, :, None, :]
    pb = mp[:, :, None, :, :]
    na = mn[:, :, :, None, :]
    nb = mn[:, :, None, :, :]
    cond = (
        jnp.sum(na * (pb - pa), axis=-1) >= jnp.sum(nb * (pa - pb), axis=-1)
    )[..., None]
    ps = jnp.where(cond, pa, pb)
    pt = jnp.where(cond, pb, pa)
    ns = jnp.where(cond, na, nb)
    nt = jnp.where(cond, nb, na)

    d = pt - ps
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12
    u = ns
    dhat = d / dist
    v = jnp.cross(dhat, u)
    w = jnp.cross(u, v)
    alpha = jnp.sum(v * nt, axis=-1)
    phi = jnp.sum(u * dhat, axis=-1)
    theta = jnp.arctan(
        jnp.sum(w * nt, axis=-1) / (jnp.sum(u * nt, axis=-1) + 1e-12)
    )  # (B, N, n, n)

    t_ap = -1.0 + jnp.arange(1, div) * (2.0 / div)  # alpha & phi thresholds
    t_th = -np.pi / 2 + jnp.arange(1, div) * (np.pi / div)
    b_a = jnp.sum(alpha[..., None] >= t_ap, axis=-1)
    b_p = jnp.sum(phi[..., None] >= t_ap, axis=-1)
    b_t = jnp.sum(theta[..., None] >= t_th, axis=-1)
    joint = b_a + b_p * div + b_t * div * div  # (B, N, n, n)

    pair_mask = jnp.triu(jnp.ones((n, n), jnp.float32), k=1)[None, None]
    onehot = jax.nn.one_hot(joint, div**3) * pair_mask[..., None]
    n_features = n * (n - 1) / 2.0
    return jnp.sum(onehot, axis=(2, 3)) / n_features  # (B, N, div**3)


def spfh(pc: jax.Array, normals: jax.Array, k: int = 8, div: int = 5) -> jax.Array:
    """Simplified PFH per point: angle features against the k neighbors,
    binned. (B, N, 3) -> (B, N, 3*div)."""
    idx = knn_indices(pc, k)
    nbr_p = index_points(pc, idx)  # (B, N, k, 3)
    nbr_n = index_points(normals, idx)
    feats = darboux_features(
        pc[:, :, None, :], normals[:, :, None, :], nbr_p, nbr_n
    )  # (B, N, k, 3)
    return _bin_features(feats, div)


def fpfh(pc: jax.Array, normals: jax.Array, k: int = 8, div: int = 5) -> jax.Array:
    """Fast PFH: SPFH + inverse-distance-weighted neighbor SPFH average
    (reference FPFH.calcHistArray, utils/pfh.py:597+)."""
    s = spfh(pc, normals, k, div)  # (B, N, D)
    idx = knn_indices(pc, k)
    nbr_s = index_points(s, idx)  # (B, N, k, D)
    nbr_p = index_points(pc, idx)
    dist = jnp.linalg.norm(nbr_p - pc[:, :, None, :], axis=-1) + 1e-6
    w = 1.0 / dist  # (B, N, k)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return s + jnp.einsum("bnk,bnkd->bnd", w, nbr_s)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def pfh_descriptor_batch(
    pc: jax.Array, method: str = "FPFH", k: int = 8, div: int = 5
) -> jax.Array:
    """Per-cloud pooled descriptor: mean of per-point histograms.
    (B, N, 3) -> (B, 3*div) for SPFH/FPFH, (B, div**3) for full PFH."""
    normals = estimate_normals(pc, k)
    if method == "FPFH":
        per_point = fpfh(pc, normals, k, div)
    elif method == "PFH":
        per_point = pfh_joint(pc, normals, k, div)
    else:
        per_point = spfh(pc, normals, k, div)
    return jnp.mean(per_point, axis=1)


def get_pfh_descriptor(pcs: np.ndarray, method: str = "PFH", k: int = 8, div: int = 5):
    """Reference driver parity (utils/pfh.py:116-144): descriptor per cloud
    over a full dataset array — batched on device instead of a process pool."""
    pcs = np.asarray(pcs, dtype=np.float32)[..., :3]
    out = []
    B = 64
    for i in range(0, len(pcs), B):
        out.append(np.asarray(pfh_descriptor_batch(jnp.asarray(pcs[i : i + B]), method, k, div)))
    return np.concatenate(out)


def pfh_hist_distance(histS: np.ndarray, histT: np.ndarray) -> float:
    """Chi-square histogram distance between pooled descriptors
    (reference utils/pfh.py:146-160)."""
    s = np.asarray(histS, dtype=np.float64).mean(0) if histS.ndim > 1 else histS
    t = np.asarray(histT, dtype=np.float64).mean(0) if histT.ndim > 1 else histT
    denom = s + t
    denom[denom == 0] = 1.0
    return float(0.5 * np.sum((s - t) ** 2 / denom))
