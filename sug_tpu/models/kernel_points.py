"""Kernel-point dispositions for KPConv, via spherical Lloyd relaxation.

Reference: model/KPConv_kernels.py (Lloyd / gradient-descent optimization of
kernel point positions in a sphere, cached as .ply assets and loaded with a
random rotation + jitter). Here the disposition is computed once per
(count, dim, fixed) at import time with a deterministic seed and cached
in-process — no disk assets, no load-time randomness, so jitted graphs are
reproducible.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def kernel_point_disposition(
    num_kpoints: int = 15,
    dimension: int = 3,
    fixed: str = "center",
    radius: float = 1.0,
    seed: int = 42,
) -> np.ndarray:
    """Lloyd-optimized kernel point positions in the unit sphere, scaled to
    ``radius``. ``fixed='center'`` pins the first point at the origin.

    Returns (num_kpoints, dimension) float32.
    """
    rng = np.random.default_rng(seed)

    # initialize: random points in the sphere (rejection sampling)
    kp = np.zeros((num_kpoints, dimension))
    count = 1 if fixed == "center" else 0
    while count < num_kpoints:
        cand = rng.uniform(-1, 1, (num_kpoints * 4, dimension))
        cand = cand[np.sum(cand**2, axis=1) < 1.0]
        take = min(len(cand), num_kpoints - count)
        kp[count : count + take] = cand[:take]
        count += take

    # dense sample of the sphere volume for the Lloyd assignment step
    samples = rng.uniform(-1, 1, (30000, dimension))
    samples = samples[np.sum(samples**2, axis=1) < 1.0]

    for _ in range(120):
        d2 = np.sum((samples[:, None, :] - kp[None, :, :]) ** 2, axis=2)
        assign = np.argmin(d2, axis=1)
        for k in range(num_kpoints):
            if fixed == "center" and k == 0:
                continue
            sel = samples[assign == k]
            if len(sel):
                kp[k] = sel.mean(axis=0)
        if fixed == "verticals" and dimension == 3 and num_kpoints >= 3:
            kp[1] = [0, 0, kp[1][2]]
            kp[2] = [0, 0, kp[2][2]]

    # normalize so the mean distance-to-center of the non-fixed points is
    # ~0.66 of the radius (cells fill the sphere; matches the reference's
    # spherical_Lloyd normalization intent)
    norms = np.linalg.norm(kp[1:] if fixed == "center" else kp, axis=1)
    scale = 0.66 / max(np.mean(norms), 1e-9)
    kp = kp * scale
    if fixed == "center":
        kp[0] = 0.0
    return (kp * radius).astype(np.float32)
