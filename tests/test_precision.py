"""bf16 mixed-precision policy (models/precision.py).

Asserts: params stay f32, forward/backward stay finite, bf16 activations
track the f32 forward within bf16 tolerance, and neighbor selection is
identical to the f32 path (the policy must not touch kNN/ball-query inputs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sug_tpu.models.precision import compute_dtype, set_compute_dtype


@pytest.fixture
def bf16_policy():
    set_compute_dtype("bf16")
    yield
    set_compute_dtype(None)


def _init_and_forward(model_name, B=2, N=64, seed=0):
    from sug_tpu.models.net_mda import NetMDA

    model = NetMDA(model_name=model_name, num_class=10)
    pc = jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, N, 3)), jnp.float32
    )
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        pc, True, domain="both",
    )

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            pc, True, domain="both",
            rngs={"dropout": jax.random.key(2)},
            mutable=["batch_stats"],
        )[0]
        return jnp.sum(out["logits1"] ** 2) + jnp.sum(out["node_attn"] ** 2), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    return variables, out, loss, grads


class TestPrecisionPolicy:
    def test_set_and_read(self):
        set_compute_dtype("bf16")
        assert compute_dtype() == jnp.bfloat16
        set_compute_dtype("f32")
        assert compute_dtype() is None
        set_compute_dtype(None)
        with pytest.raises(ValueError):
            set_compute_dtype("fp8")

    @pytest.mark.slow
    @pytest.mark.parametrize("model_name", ["Pointnet", "PTran"])
    def test_bf16_params_stay_f32_and_finite(self, model_name, bf16_policy):
        variables, out, loss, grads = _init_and_forward(model_name)
        for leaf in jax.tree.leaves(variables["params"]):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(grads):
            assert leaf.dtype == jnp.float32
            assert np.isfinite(np.asarray(leaf)).all()
        assert np.isfinite(float(loss))
        # MMD-feeding outputs are f32 (CALayer BN promotes back)
        assert out["node_attn"].dtype == jnp.float32

    def test_bf16_tracks_f32_forward(self):
        set_compute_dtype(None)
        _, out32, loss32, _ = _init_and_forward("Pointnet")
        set_compute_dtype("bf16")
        try:
            _, out16, loss16, _ = _init_and_forward("Pointnet")
        finally:
            set_compute_dtype(None)
        l1 = np.asarray(out32["logits1"])
        l2 = np.asarray(out16["logits1"])
        # bf16 has ~3 decimal digits; demand agreement at that scale
        assert np.max(np.abs(l1 - l2)) < 0.15 * (np.abs(l1).max() + 1.0)

    def test_neighbor_selection_unaffected(self, bf16_policy):
        """kNN consumes raw xyz — identical indices under either policy."""
        from sug_tpu.ops.geometry import knn_indices

        pc = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 128, 3)), jnp.float32
        )
        idx_bf16 = np.asarray(knn_indices(pc, 8))
        set_compute_dtype(None)
        idx_f32 = np.asarray(knn_indices(pc, 8))
        np.testing.assert_array_equal(idx_bf16, idx_f32)

    @pytest.mark.slow
    def test_ptran_trainstep_bf16(self, bf16_policy):
        """One full DG train step under bf16 compiles and stays finite."""
        from sug_tpu.engine.dg_trainer import DGTrainer
        from sug_tpu.utils.config import ConfigDict

        cfg = ConfigDict(
            {
                "PRECISION": "bf16",
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
        trainer = DGTrainer(cfg, model_name="PTran", augment=True)
        state = trainer.init_state(seed=0, batch_size=4, num_points=64)
        rng = np.random.default_rng(0)
        d = lambda: jnp.asarray(rng.normal(size=(4, 64, 3)), jnp.float32)
        l = lambda: jnp.asarray(rng.integers(0, 10, 4), jnp.int32)
        new_state, metrics = trainer.train_step(
            state, d(), l(), d(), l(), jax.random.key(0), 1e-3, 1e-3, 1e-3,
            mmd_on=True,
        )
        assert np.isfinite(float(metrics["loss_total"]))
        for leaf in jax.tree.leaves(new_state.params):
            assert leaf.dtype == jnp.float32
