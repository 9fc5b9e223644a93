"""Shape / sanity tests for backbones and the composite Net_MDA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sug_tpu.models import (
    NetMDA,
    PointNetClassifier,
    DGCNNClassifier,
    PointNet2Classifier,
    PointNetGenerator,
    DGCNNGenerator,
    PointNet2Generator,
    SelfAdaptiveNodeModule,
    TransformNet,
    CALayer,
    grad_reverse,
)

B, N = 4, 256  # small cloud for fast CPU tests


@pytest.fixture
def pc(rng):
    return jnp.asarray(rng.normal(size=(B, N, 3)), dtype=jnp.float32)


def init_and_apply(module, pc, **kwargs):
    variables = module.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        pc,
        True,
        **kwargs,
    )
    out, mutated = module.apply(
        variables,
        pc,
        True,
        **kwargs,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    return out, variables


def test_transform_net(pc):
    tn = TransformNet(3)
    variables = tn.init(jax.random.key(0), pc, True)
    t, _ = tn.apply(variables, pc, True, mutable=["batch_stats"])
    assert t.shape == (B, 3, 3)
    # identity-biased at init: close to eye for random small init
    assert np.isfinite(np.asarray(t)).all()


def test_sa_node_module(pc, rng):
    feats = jnp.asarray(rng.normal(size=(B, N, 64)), dtype=jnp.float32)
    m = SelfAdaptiveNodeModule()
    variables = m.init(jax.random.key(0), feats, pc, True)
    (out, node_fea, node_off), _ = m.apply(
        variables, feats, pc, True, mutable=["batch_stats"]
    )
    assert out.shape == (B, N, 128)
    assert node_fea.shape == (B, 64, 64)
    assert node_off.shape == (B, 64, 3)


def test_ca_layer(rng):
    x = jnp.asarray(rng.normal(size=(B, 4096)), dtype=jnp.float32)
    m = CALayer()
    variables = m.init(jax.random.key(0), x, True)
    out, _ = m.apply(variables, x, True, mutable=["batch_stats"])
    assert out.shape == (B, 4096)


def test_grad_reverse():
    x = jnp.ones((3,))
    lam = jnp.asarray(0.7)
    y, vjp = jax.vjp(lambda a: grad_reverse(a, lam), x)
    np.testing.assert_allclose(np.asarray(y), 1.0)
    (gx,) = vjp(jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(gx), -0.7, rtol=1e-6)


@pytest.mark.parametrize(
    "gen_cls,gdim",
    [(PointNetGenerator, 1024), (DGCNNGenerator, 1024), (PointNet2Generator, 1024)],
)
def test_generators(pc, gen_cls, gdim):
    (feat, node_fea, _), _ = init_and_apply(gen_cls(), pc)
    assert feat.shape == (B, gdim)
    assert node_fea.reshape(B, -1).shape == (B, 4096)
    assert np.isfinite(np.asarray(feat)).all()


@pytest.mark.parametrize(
    "cls", [PointNetClassifier, DGCNNClassifier, PointNet2Classifier]
)
def test_classifiers(pc, cls):
    (logits, mid), _ = init_and_apply(cls(num_class=10), pc)
    assert logits.shape == (B, 10)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("model_name", ["Pointnet", "DGCNN", "Pointnet2"])
def test_net_mda_forward(pc, model_name):
    model = NetMDA(model_name=model_name)
    out, variables = init_and_apply(model, pc, domain="both")
    assert out["logits1"].shape == (B, 10)
    assert out["logits2"].shape == (B, 10)
    assert out["sem1"].shape == (B, 256)
    assert out["node_flat"].shape == (B, 4096)
    assert out["node_attn"].shape == (B, 4096)
    assert out["node_attn_t"].shape == (B, 4096)
    # twin heads have independent params -> different outputs
    assert not np.allclose(np.asarray(out["logits1"]), np.asarray(out["logits2"]))


def test_net_mda_eval_deterministic(pc):
    model = NetMDA(model_name="Pointnet")
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, pc, True, domain="both"
    )
    o1 = model.apply(variables, pc, False)
    o2 = model.apply(variables, pc, False)
    np.testing.assert_allclose(
        np.asarray(o1["logits1"]), np.asarray(o2["logits1"]), atol=1e-6
    )


def test_net_mda_jit(pc):
    model = NetMDA(model_name="Pointnet")
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, pc, True, domain="both"
    )

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, False)["logits1"]

    out = fwd(variables, pc)
    assert out.shape == (B, 10)
