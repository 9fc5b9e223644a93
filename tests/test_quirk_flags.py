"""Bug-parity flags: TARGET_LOSS_USES_SOURCE_LABELS and GRL gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sug_tpu.engine.dg_trainer import DGTrainer
from sug_tpu.utils.config import ConfigDict

B, N = 8, 96


def make_cfg(**method_overrides):
    methods = {
        "MMD_WEIGHT": 0.0,  # cls-only so the label pairing is the only diff
        "CLS_WEIGHT": 1.0,
        "GEO_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 1.0, "GEO_SCALE": 1}],
        "SEM_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 1.0, "LABEL_WEIGHT": 0.5, "SEM_SCALE": 0}],
        "TARGET_LOSS": 1.0,
        "SRC_LOSS_WEIGHT": 1.0,
        "ADV_WEIGHT": 0.0,
        "PURE_CLS_EPOCH": 0,
        "GRL": False,
    }
    methods.update(method_overrides)
    return ConfigDict(
        {
            "METHODS": methods,
            "OPTIMIZATION": {"NUM_EPOCHES": 10, "LR": 1e-3, "LR_SCALER": 1.0, "WEIGHT_DECAY": 5e-4},
        }
    )


def run_step(cfg, rng):
    trainer = DGTrainer(cfg, model_name="Pointnet", augment=False)
    state = trainer.init_state(seed=0, batch_size=B, num_points=N)
    ds = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    dt = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    ls = jnp.asarray(np.arange(B) % 10, jnp.int32)
    lt = jnp.asarray((np.arange(B) + 3) % 10, jnp.int32)  # different pairing
    _, metrics = trainer.train_step(
        state, ds, ls, dt, lt, jax.random.key(0), 1e-3, 1e-3, 1e-3, mmd_on=False
    )
    return float(metrics["loss_cls"])


@pytest.mark.slow
def test_target_label_flag_changes_loss(rng):
    fixed = run_step(make_cfg(), rng)
    bug_parity = run_step(make_cfg(TARGET_LOSS_USES_SOURCE_LABELS=True), rng)
    # labels differ between the splits, so the pairing choice must matter
    assert abs(fixed - bug_parity) > 1e-6


@pytest.mark.slow
def test_grl_flag_changes_generator_grads(rng):
    """With GRL on, the target-CE gradient into the generator is reversed —
    one step from identical inits must move g differently."""

    def step(grl):
        cfg = make_cfg(GRL=grl)
        trainer = DGTrainer(cfg, model_name="Pointnet", augment=False)
        state = trainer.init_state(seed=0, batch_size=B, num_points=N)
        ds = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        dt = ds + 0.01
        ls = jnp.asarray(np.arange(B) % 10, jnp.int32)
        new_state, _ = trainer.train_step(
            state, ds, ls, dt, ls, jax.random.key(0), 1e-3, 1e-3, 0.0,
            grl_const=1.0, mmd_on=False,
        )
        return jax.tree.leaves(new_state.params["g"])[0]

    a = np.asarray(step(False))
    b = np.asarray(step(True))
    assert not np.allclose(a, b)
