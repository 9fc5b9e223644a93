"""Tests for the Point Transformer and KPConv backbones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sug_tpu.models.kernel_points import kernel_point_disposition
from sug_tpu.models.kpconv import (
    KPConvClassifier,
    KPConvGenerator,
    KPConvOp,
    InstanceNorm,
    radius_neighbors_masked,
)
from sug_tpu.models.ptran import (
    PointTransformerClassifier,
    PointTransformerGenerator,
    VectorAttentionBlock,
)
from sug_tpu.models.net_mda import NetMDA

B, N = 2, 256


@pytest.fixture
def pc(rng):
    return jnp.asarray(rng.normal(size=(B, N, 3)) * 0.5, dtype=jnp.float32)


def init_apply(module, *args):
    variables = module.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, *args
    )
    out, _ = module.apply(
        variables, *args, rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats", "regularizers"],
    )
    return out


class TestKernelPoints:
    def test_disposition_properties(self):
        kp = kernel_point_disposition(15, 3, "center", radius=1.0)
        assert kp.shape == (15, 3)
        np.testing.assert_allclose(kp[0], 0.0)  # fixed center
        norms = np.linalg.norm(kp[1:], axis=1)
        assert (norms > 0.1).all() and (norms < 1.0).all()
        # points are spread out: min pairwise distance is substantial
        d = np.linalg.norm(kp[:, None] - kp[None, :], axis=-1)
        d[np.eye(15, dtype=bool)] = 1e9
        assert d.min() > 0.2

    def test_cached(self):
        a = kernel_point_disposition(15, 3, "center")
        b = kernel_point_disposition(15, 3, "center")
        assert a is b


class TestRadiusNeighbors:
    def test_mask_correct(self, rng):
        pts = jnp.asarray(rng.uniform(-1, 1, (1, 64, 3)), jnp.float32)
        idx, mask = radius_neighbors_masked(0.5, 16, pts, pts[:, :8])
        d = np.asarray(
            ((np.asarray(pts)[:, :8, None] - np.asarray(pts)[:, None]) ** 2).sum(-1)
        )
        for q in range(8):
            n_in = (d[0, q] <= 0.25).sum()
            assert int(np.asarray(mask)[0, q].sum()) == min(n_in, 16)


class TestKPConvOp:
    def test_shapes_and_finite(self, rng):
        q = jnp.asarray(rng.normal(size=(2, 16, 3)) * 0.3, jnp.float32)
        s = jnp.asarray(rng.normal(size=(2, 32, 3)) * 0.3, jnp.float32)
        x = jnp.asarray(rng.normal(size=(2, 32, 8)), jnp.float32)
        idx, mask = radius_neighbors_masked(0.6, 12, s, q)
        op = KPConvOp(out_channels=16, kp_extent=0.3, radius=0.6)
        variables = op.init(jax.random.key(0), q, s, idx, mask, x)
        out = op.apply(variables, q, s, idx, mask, x)
        assert out.shape == (2, 16, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_masked_neighbors_ignored(self, rng):
        """Changing the features of out-of-radius points must not change the
        output (shadow semantics)."""
        q = jnp.zeros((1, 1, 3), jnp.float32)
        s = jnp.asarray(
            np.array([[[0.01, 0, 0], [0.02, 0, 0], [5.0, 5.0, 5.0]]]), jnp.float32
        )
        x1 = jnp.asarray(rng.normal(size=(1, 3, 4)), jnp.float32)
        x2 = np.asarray(x1).copy()
        x2[0, 2] = 99.0  # mutate the far-away point
        idx, mask = radius_neighbors_masked(0.5, 3, s, q)
        op = KPConvOp(out_channels=4, kp_extent=0.25, radius=0.5)
        variables = op.init(jax.random.key(0), q, s, idx, mask, x1)
        o1 = op.apply(variables, q, s, idx, mask, x1)
        o2 = op.apply(variables, q, s, idx, mask, jnp.asarray(x2))
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    def test_deformable_sows_regularizers(self, rng):
        q = jnp.asarray(rng.normal(size=(1, 8, 3)) * 0.3, jnp.float32)
        x = jnp.asarray(rng.normal(size=(1, 8, 4)), jnp.float32)
        idx, mask = radius_neighbors_masked(0.8, 8, q, q)
        op = KPConvOp(out_channels=4, kp_extent=0.4, radius=0.8, deformable=True)
        variables = op.init(jax.random.key(0), q, q, idx, mask, x)
        out, state = op.apply(
            variables, q, q, idx, mask, x, mutable=["regularizers"]
        )
        assert "regularizers" in state
        from sug_tpu.models.kpconv import p2p_fitting_regularizer

        reg = p2p_fitting_regularizer(state["regularizers"])
        assert np.isfinite(float(reg))


def test_instance_norm(rng):
    x = jnp.asarray(rng.normal(size=(2, 32, 8)) * 3 + 1, jnp.float32)
    out = InstanceNorm().apply({}, x)
    np.testing.assert_allclose(np.asarray(out).mean(1), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out).std(1), 1.0, atol=1e-2)


class TestPTran:
    def test_vector_attention(self, rng):
        xyz = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(2, 32, 16)), jnp.float32)
        blk = VectorAttentionBlock(16, 64, 8)
        variables = blk.init(jax.random.key(0), xyz, feats)
        out = blk.apply(variables, xyz, feats)
        assert out.shape == (2, 32, 16)

    @pytest.mark.slow
    def test_generator_shapes(self, pc):
        out = init_apply(PointTransformerGenerator(), pc, True)
        feat, node_fea, _ = out
        assert feat.shape == (B, 512)
        assert node_fea.reshape(B, -1).shape == (B, 4096)

    def test_classifier(self, pc):
        logits, mid = init_apply(PointTransformerClassifier(10), pc, True)
        assert logits.shape == (B, 10)
        assert mid.shape == (B, 256)


class TestKPConvModel:
    def test_generator_shapes(self, pc):
        out = init_apply(KPConvGenerator(), pc, True)
        feat, node_fea, _ = out
        assert feat.shape == (B, 1024)
        assert node_fea.shape == (B, 64, 64)
        assert np.isfinite(np.asarray(feat)).all()

    def test_classifier(self, pc):
        logits, mid = init_apply(KPConvClassifier(10), pc, True)
        assert logits.shape == (B, 10)
        assert mid.shape == (B, 256)


@pytest.mark.parametrize("model_name", ["PTran", "KPConv"])
def test_net_mda_with_stretch_backbones(pc, model_name):
    model = NetMDA(model_name=model_name)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        pc, True, domain="both",
    )
    out, _ = model.apply(
        variables, pc, True, domain="both",
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats", "regularizers"],
    )
    assert out["logits1"].shape == (B, 10)
    assert out["node_attn"].shape == (B, 4096)


class TestKPConvStackedForward:
    """The stacked both-domains forward (NetMDA._stacked, KPConv-only fast
    path) must match the sequential source-then-target choreography exactly:
    the generator is batch-decoupled (InstanceNorm only) and the KPConv
    heads have no norm or dropout."""

    def test_stacked_equals_sequential(self, rng):
        import os

        from sug_tpu.engine.dg_trainer import DGTrainer
        from sug_tpu.utils.config import ConfigDict

        cfg = ConfigDict({
            "METHODS": {"GRL": False, "ADV_WEIGHT": 0.5, "MMD_WEIGHT": 1.0,
                        "CLS_WEIGHT": 1.0, "PURE_CLS_EPOCH": 0,
                        "TARGET_LOSS": 1.0, "SRC_LOSS_WEIGHT": 1.0,
                        "GEO_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 50,
                                     "GEO_WEIGHTS": "mean2one", "GEO_SCALE": 1}],
                        "SEM_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 5,
                                     "SEM_WEIGHTS": "mean2one",
                                     "LABEL_WEIGHT": 0.5, "SEM_SCALE": 1}]},
            "OPTIMIZATION": {"WEIGHT_DECAY": 0.0, "LR": 1e-3,
                             "LR_SCALER": 1.0, "NUM_EPOCHES": 2},
        })
        trainer = DGTrainer(cfg, model_name="KPConv", augment=False)
        state = trainer.init_state(seed=0, batch_size=4, num_points=64)
        data_s = jnp.asarray(rng.uniform(-1, 1, size=(4, 64, 3)), jnp.float32)
        data_t = jnp.asarray(rng.uniform(-1, 1, size=(4, 64, 3)), jnp.float32)
        key = jax.random.key(3)

        outs = {}
        for mode in ("1", "0"):
            os.environ["SUG_KPCONV_STACKED"] = mode
            try:
                out_s, out_t, stats, _ = trainer._forward_both(
                    state.params, state.batch_stats, data_s, data_t, key,
                    jnp.float32(0.0), train=True,
                )
            finally:
                os.environ.pop("SUG_KPCONV_STACKED", None)
            outs[mode] = (out_s, out_t, stats)

        for i in range(2):
            a, b = outs["1"][i], outs["0"][i]
            for k in ("logits1", "logits2", "sem1", "sem2", "node_flat",
                      "node_attn", "global_feat"):
                np.testing.assert_allclose(
                    np.asarray(a[k]), np.asarray(b[k]), rtol=1e-6, atol=1e-6,
                    err_msg=f"{'st'[i]} {k}",
                )
        # BN running stats of the per-domain CALayers must match too
        fa = {jax.tree_util.keystr(kp): v for kp, v
              in jax.tree_util.tree_leaves_with_path(outs["1"][2])}
        fb = {jax.tree_util.keystr(kp): v for kp, v
              in jax.tree_util.tree_leaves_with_path(outs["0"][2])}
        assert fa.keys() == fb.keys()
        for k in fa:
            np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                       rtol=1e-6, atol=1e-7, err_msg=k)
