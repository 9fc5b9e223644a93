"""Sanitizer layer (SUG_DETECT_ANOMALY): the checkify analog of the
reference's torch.autograd.set_detect_anomaly(True) (train_dg.py:266).

Off: checkify_jit is exactly jax.jit (no error plumbing compiled in).
On: the first NaN/inf produced by any primitive inside the step raises
JaxRuntimeError naming the offending primitive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sug_tpu.utils.sanitize import checkify_jit, detect_anomaly_enabled


def _nan_maker(x):
    # sqrt of a negative lane -> NaN only for bad inputs
    return jnp.sum(jnp.sqrt(x) * 2.0)


class TestCheckifyJit:
    def test_off_is_plain_jit(self, monkeypatch):
        monkeypatch.delenv("SUG_DETECT_ANOMALY", raising=False)
        assert not detect_anomaly_enabled()
        fn = checkify_jit(_nan_maker)
        # NaN passes through silently, exactly like jax.jit
        out = fn(jnp.array([-1.0, 4.0]))
        assert np.isnan(float(out))

    def test_on_raises_on_nan_with_location(self, monkeypatch):
        monkeypatch.setenv("SUG_DETECT_ANOMALY", "1")
        from jax.experimental import checkify

        fn = checkify_jit(_nan_maker)
        with pytest.raises(checkify.JaxRuntimeError, match="nan"):
            fn(jnp.array([-1.0, 4.0]))
        # clean inputs run normally through the same wrapper
        assert float(fn(jnp.array([1.0, 4.0]))) == pytest.approx(6.0)

    def test_on_catches_backward_nan(self, monkeypatch):
        """detect_anomaly parity: the NaN appears only in the BACKWARD pass
        (d/dx sqrt(x) = inf at 0 -> 0*inf = NaN in the chain product)."""
        monkeypatch.setenv("SUG_DETECT_ANOMALY", "1")
        from jax.experimental import checkify

        def loss(x):
            return jnp.sum(jnp.sqrt(x) * x)  # finite at x=0; grad is NaN

        g = checkify_jit(jax.grad(loss))
        with pytest.raises(checkify.JaxRuntimeError):
            g(jnp.array([0.0, 1.0]))

    def test_user_checks_fire(self, monkeypatch):
        monkeypatch.setenv("SUG_DETECT_ANOMALY", "1")
        from jax.experimental import checkify

        def fn(x):
            checkify.check(jnp.all(x > 0), "non-positive input")
            return x * 2

        wrapped = checkify_jit(fn)
        with pytest.raises(checkify.JaxRuntimeError, match="non-positive"):
            wrapped(jnp.array([-1.0]))


class TestTrainerIntegration:
    def _cfg(self):
        from sug_tpu.utils.config import ConfigDict

        return ConfigDict(
            {
                "METHODS": {
                    "MMD_WEIGHT": 1.0,
                    "GEO_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 50,
                                 "GEO_WEIGHTS": "mean2one", "GEO_SCALE": 1}],
                    "SEM_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 5,
                                 "SEM_WEIGHTS": "mean2one", "LABEL_WEIGHT": 0.5,
                                 "SEM_SCALE": 1}],
                    "TARGET_LOSS": 1.0,
                    "PURE_CLS_EPOCH": 0,
                },
                "OPTIMIZATION": {"NUM_EPOCHES": 5, "LR": 1e-3, "LR_SCALER": 1.0,
                                 "WEIGHT_DECAY": 5e-4},
            }
        )

    def test_trainer_steps_are_checkified_when_enabled(self, monkeypatch):
        """Wiring: with the sanitizer on, the trainer's compiled steps are the
        checkify wrappers, not bare jitted callables. (Executing a checkified
        FULL DG step is deliberately not tested — checkify threads error state
        through every primitive of the fused step, which makes the trace/
        compile orders of magnitude heavier; it is a debug mode.)"""
        from sug_tpu.engine.dg_trainer import DGTrainer

        monkeypatch.setenv("SUG_DETECT_ANOMALY", "1")
        t_on = DGTrainer(self._cfg(), model_name="Pointnet", augment=False)
        assert getattr(t_on._train_step_full, "_checkified", False)

        monkeypatch.delenv("SUG_DETECT_ANOMALY")
        t_off = DGTrainer(self._cfg(), model_name="Pointnet", augment=False)
        assert not getattr(t_off._train_step_full, "_checkified", False)

    def test_model_grad_nan_caught_through_real_backbone(self, monkeypatch):
        """The sanitizer catches a NaN flowing through the real NetMDA
        forward + loss + backward (model-level, not the full fused DG step)."""
        monkeypatch.setenv("SUG_DETECT_ANOMALY", "1")
        from jax.experimental import checkify

        from sug_tpu.models.net_mda import NetMDA

        model = NetMDA(model_name="Pointnet", num_class=10)
        rng = np.random.default_rng(0)
        d = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, d,
            train=False,
        )

        def loss(params, x):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=False,
            )
            return jnp.sum(out["logits1"] ** 2)

        g = checkify_jit(jax.grad(loss))
        bad = d.at[0, 0, 0].set(jnp.nan)
        with pytest.raises(checkify.JaxRuntimeError):
            jax.tree.leaves(g(variables["params"], bad))[0].block_until_ready()
        # finite inputs pass through the same checkified gradient
        leaves = jax.tree.leaves(g(variables["params"], d))
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
