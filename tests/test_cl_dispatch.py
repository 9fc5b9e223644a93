"""Contrastive (CL) alignment dispatch in the DG trainer."""

import jax
import jax.numpy as jnp
import numpy as np

from sug_tpu.engine.dg_trainer import DGTrainer
from sug_tpu.losses.mmd import contrastive_loss_weighted
from sug_tpu.utils.config import ConfigDict

B, N = 8, 128

CL_CFG = ConfigDict(
    {
        "METHODS": {
            "MMD_WEIGHT": 1.0,
            "CLS_WEIGHT": 1.0,
            "GEO_MMD": [{"NAME": "CL", "GEO_SCALE": 1}],
            "SEM_MMD": [{"NAME": "CL", "SEM_SCALE": 1}],
            "TARGET_LOSS": 0.0,
            "SRC_LOSS_WEIGHT": 1.0,
            "ADV_WEIGHT": 0.0,
            "PURE_CLS_EPOCH": 0,
            "GRL": False,
        },
        "OPTIMIZATION": {"NUM_EPOCHES": 10, "LR": 1e-3, "LR_SCALER": 1.0, "WEIGHT_DECAY": 5e-4},
    }
)


def test_contrastive_loss_math(rng):
    f = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
    ls = jnp.asarray([0, 1, 2, 0, 1, 2])
    # same labels, same features -> cos=1 -> loss 0 for the 'same' branch
    v = float(contrastive_loss_weighted(ls, f, ls, f))
    # all pairs same class: loss = mean(1 - 1) = 0
    assert v < 1e-5
    # different labels with identical features -> pushed: max(0, 1 - margin)
    lt = jnp.asarray([1, 2, 0, 1, 2, 0])
    v2 = float(contrastive_loss_weighted(ls, f, lt, f))
    np.testing.assert_allclose(v2, 0.8, atol=1e-5)


def test_dg_step_with_cl_alignment(rng):
    trainer = DGTrainer(CL_CFG, model_name="Pointnet", augment=False)
    state = trainer.init_state(seed=0, batch_size=B, num_points=N)
    ds = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    dt = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    ls = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    lt = jnp.asarray(rng.integers(0, 10, B), jnp.int32)
    _, metrics = trainer.train_step(
        state, ds, ls, dt, lt, jax.random.key(0), 1e-3, 1e-3, 1e-3
    )
    assert np.isfinite(float(metrics["loss_geo"]))
    assert np.isfinite(float(metrics["loss_sem"]))
