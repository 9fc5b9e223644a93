"""Tests for the alternating (UDA / naive-MMD) trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sug_tpu.engine.alternating_trainer import AlternatingTrainer
from sug_tpu.utils.config import ConfigDict

B, N = 8, 128

NAIVE_CFG = ConfigDict(
    {
        "METHODS": {
            "CLASS_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 1.0}],
            "TARGET_LOSS": 1.0,
            "SRC_LOSS_WEIGHT": 1.0,
        }
    }
)


@pytest.fixture
def batch(rng):
    return (
        jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32),
        jnp.asarray(rng.integers(0, 10, B), jnp.int32),
        jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32),
        jnp.asarray(rng.integers(0, 10, B), jnp.int32),
    )


@pytest.mark.slow
@pytest.mark.parametrize("mode,cfg", [("uda", None), ("naive", NAIVE_CFG)])
def test_alternating_step(batch, mode, cfg):
    trainer = AlternatingTrainer(model_name="Pointnet", mode=mode, cfg=cfg)
    state = trainer.init_state(seed=0, batch_size=B, num_points=N)
    ds, ls, dt, lt = batch
    new_state, metrics = trainer.train_step(
        state, ds, ls, dt, lt, jax.random.key(0), 1e-3, 1e-3, 1e-3, cons=0.5
    )
    for k in ("loss_s", "loss_adv", "loss_node"):
        assert np.isfinite(float(metrics[k])), k
    # phase A updates heads; phase B updates attentions
    def changed(prefix):
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params[prefix],
            new_state.params[prefix],
        )
        return max(jax.tree.leaves(diffs))

    assert changed("c1") > 0
    assert changed("attention_s") > 0
    assert changed("g") > 0


def test_grl_reverses_into_generator(batch):
    """With GRL on, the adversarial gradient through the target forward is
    reversed — the step must still be finite and move params."""
    trainer = AlternatingTrainer(model_name="Pointnet", mode="uda", use_grl=True)
    state = trainer.init_state(seed=0, batch_size=B, num_points=N)
    ds, ls, dt, lt = batch
    _, metrics = trainer.train_step(
        state, ds, ls, dt, lt, jax.random.key(0), 1e-3, 1e-3, 1e-3, cons=1.0
    )
    assert np.isfinite(float(metrics["loss_adv"]))
