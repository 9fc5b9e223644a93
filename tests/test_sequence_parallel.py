"""Point-axis (sequence) parallelism correctness on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from sug_tpu.ops.geometry import chamfer_distance, knn_indices
from sug_tpu.parallel.mesh import make_mesh
from sug_tpu.parallel.sequence_parallel import chamfer_sp, knn_sp


def test_chamfer_sp_matches_single_device(rng):
    mesh = make_mesh(8)
    pc1 = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
    pc2 = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
    got = np.asarray(chamfer_sp(mesh, pc1, pc2))
    expect = np.asarray(chamfer_distance(pc1, pc2))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_knn_sp_matches_single_device(rng):
    mesh = make_mesh(8)
    x = jnp.asarray(rng.normal(size=(2, 128, 4)), jnp.float32)
    got = np.asarray(knn_sp(mesh, x, 8))
    expect = np.asarray(knn_indices(x, 8))
    d = np.asarray(
        ((np.asarray(x)[:, :, None] - np.asarray(x)[:, None]) ** 2).sum(-1)
    )
    for b in range(2):
        for n in range(0, 128, 17):
            assert set(got[b, n].tolist()) == set(np.argsort(d[b, n])[:8].tolist())
