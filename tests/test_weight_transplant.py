"""Full-model weight-transplant parity: reference Net_MDA -> NetMDA.

The strongest accuracy-parity evidence available without real PointDA-10
data (zero-egress environment): build the reference ``Net_MDA``
(model/Model.py:452-520) on torch CPU, randomize every normalization
parameter/statistic so nothing matches by default-init accident, transplant
its ``state_dict`` through :mod:`sug_tpu.utils.torch_convert`, run both
models on identical clouds, and require logits, 256-d semantic features,
4096-d node features and both attended node vectors to agree.

FPS determinism: the reference starts FPS at ``torch.randint(0, N, (B,))``
(model/point_utils.py:17, model/pointnet2_utils.py:72); both sides are
pinned to start index 0 (patching torch.randint / NetMDA's default).
"""

from __future__ import annotations

import contextlib
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from test_torch_parity import _REF_TOPLEVEL, REF_ROOT, _make_chamfer_stub, cuda_as_cpu

from sug_tpu.models.net_mda import NetMDA
from sug_tpu.utils.torch_convert import (
    NODE_PERM,
    convert_net_mda,
    state_dict_to_numpy,
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules, isolated from this repo's namespaces."""
    stashed = {}
    for name in list(sys.modules):
        if name.split(".")[0] in _REF_TOPLEVEL:
            stashed[name] = sys.modules.pop(name)
    sys.modules["chamfer_distance"] = _make_chamfer_stub()
    sys.path.insert(0, REF_ROOT)
    try:
        import model.Model as Model
        import model.mmd as mmd
        import utils.train_utils as train_utils

        ns = types.SimpleNamespace(Model=Model, mmd=mmd, train_utils=train_utils)
    finally:
        sys.path.remove(REF_ROOT)
        for name in list(sys.modules):
            if name.split(".")[0] in _REF_TOPLEVEL:
                del sys.modules[name]
        sys.modules.update(stashed)
    return ns


@contextlib.contextmanager
def fps_start_zeros():
    """Pin the reference's random FPS start point to index 0."""
    orig = torch.randint

    def patched(low, high=None, size=None, **kw):
        if high is not None and size is not None:
            return torch.zeros(size, dtype=kw.get("dtype", torch.long))
        return orig(low, high, size, **kw)

    torch.randint = patched
    try:
        yield
    finally:
        torch.randint = orig


def _randomize_norms(model: tnn.Module, seed: int) -> None:
    """Randomize every norm's affine params and running stats (sign-flipping
    ~20% of BN scales, which exercises the fused EdgeConv's min-path)."""
    g = torch.Generator().manual_seed(seed)

    def u(like, lo, hi):
        return torch.empty_like(like).uniform_(lo, hi, generator=g)

    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                sign = torch.where(
                    torch.rand(m.weight.shape, generator=g) < 0.2, -1.0, 1.0
                )
                m.weight.copy_(u(m.weight, 0.5, 1.5) * sign)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.05
                )
                m.running_var.copy_(u(m.running_var, 0.5, 1.5))
            elif isinstance(m, tnn.LayerNorm):
                m.weight.copy_(u(m.weight, 0.8, 1.2))
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.05)


def _tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = tuple(np.shape(v))
    return out


def _run_reference(ref, model_name: str, pc: np.ndarray, seed: int):
    torch.manual_seed(seed)
    with cuda_as_cpu():
        model = ref.Model.Net_MDA(model_name=model_name)
        _randomize_norms(model, seed + 1)
        model.eval()
        inp = torch.from_numpy(pc.transpose(0, 2, 1)[..., None])  # (B, 3, N, 1)
        with torch.no_grad(), fps_start_zeros():
            gfeat, node = model(inp, mid_feat=True)
            node_s = model(inp, node_adaptation_s=True)
            node_t = model(inp, node_adaptation_t=True)
            y1, y2, sem1, sem2 = model(inp, semantic_adaption=True)
    B = pc.shape[0]
    return model, {
        "global_feat": gfeat.numpy(),
        "node_flat": node.reshape(B, -1).numpy(),
        "node_attn": node_s.numpy(),
        "node_attn_t": node_t.numpy(),
        "logits1": y1.numpy(),
        "logits2": y2.numpy(),
        "sem1": sem1.numpy(),
        "sem2": sem2.numpy(),
    }


def _run_mine(model_name: str, variables, pc: np.ndarray):
    net = NetMDA(model_name=model_name)
    fwd = jax.jit(
        lambda v, x: net.apply(v, x, train=False, domain="both"),
    )
    out = fwd(variables, jnp.asarray(pc))
    return {k: np.asarray(v) for k, v in out.items() if v is not None}


BACKBONES = ["Pointnet", "DGCNN", "Pointnet2", "PTran"]


@pytest.mark.parametrize("model_name", BACKBONES)
def test_transplant_structure_matches_init(ref, model_name):
    """The converter emits exactly the variable tree NetMDA initializes —
    every path present, every shape equal (catches silent converter drift:
    flax ignores extra params during apply)."""
    torch.manual_seed(0)
    with cuda_as_cpu():
        model = ref.Model.Net_MDA(model_name=model_name)
    variables = convert_net_mda(state_dict_to_numpy(model.state_dict()), model_name)

    net = NetMDA(model_name=model_name)
    pc = jnp.zeros((2, 1024, 3), jnp.float32)
    init_vars = net.init(jax.random.PRNGKey(0), pc, train=False, domain="both")

    for col in ("params", "batch_stats"):
        want = _tree_paths(init_vars[col])
        got = _tree_paths(variables[col])
        assert got == want, (
            f"{col} mismatch:\n missing={sorted(set(want) - set(got))}\n"
            f" extra={sorted(set(got) - set(want))}\n"
            f" shape_diff={ {k: (got[k], want[k]) for k in set(got) & set(want) if got[k] != want[k]} }"
        )


# DGCNN stacks four feature-space kNN graphs + a 1024-point mean pool; f32
# accumulation-order noise between torch and XLA reaches ~2e-4 on isolated
# elements (measured: 1/4096 global-feat elements at 1.8e-4 abs / 9e-4 rel).
# The MLP-over-geometry backbones agree at 1e-4. PTran chains 5 vector-
# attention softmaxes + 4 FPS/kNN pyramids; accumulation-order noise on the
# deepest (4-point-mean) features reaches ~2e-4.
TOL = {"Pointnet": 1e-4, "Pointnet2": 1e-4, "DGCNN": 5e-4, "PTran": 1e-3}


@pytest.mark.parametrize("model_name", BACKBONES)
def test_transplant_forward_parity(ref, model_name):
    rng = np.random.default_rng(42)
    # PTran's XLA path materializes (B, 1024, 16, 512) per-edge tensors on
    # both frameworks — B=2 keeps the torch side inside this box's RAM
    B, N = (2 if model_name == "PTran" else 4), 1024
    pc = rng.uniform(-1.0, 1.0, size=(B, N, 3)).astype(np.float32)

    model, want = _run_reference(ref, model_name, pc, seed=7)
    variables = convert_net_mda(state_dict_to_numpy(model.state_dict()), model_name)
    got = _run_mine(model_name, variables, pc)

    perm = NODE_PERM
    tol = TOL[model_name]
    np.testing.assert_allclose(
        got["global_feat"], want["global_feat"], rtol=tol, atol=tol,
        err_msg="global feature",
    )
    np.testing.assert_allclose(
        got["node_flat"], want["node_flat"][:, perm], rtol=tol, atol=tol,
        err_msg="4096-d node features",
    )
    np.testing.assert_allclose(
        got["node_attn"], want["node_attn"][:, perm], rtol=tol, atol=tol,
        err_msg="attended node features (source)",
    )
    np.testing.assert_allclose(
        got["node_attn_t"], want["node_attn_t"][:, perm], rtol=tol, atol=tol,
        err_msg="attended node features (target)",
    )
    for k in ("sem1", "sem2", "logits1", "logits2"):
        np.testing.assert_allclose(
            got[k], want[k], rtol=tol, atol=tol, err_msg=k
        )


# ---------------------------------------------------------------------------
# DG train-step loss parity: the full composite loss (cls + adv + geo MMD +
# sem MMD, DG_unified_loss.yaml weights) computed by DGTrainer._loss on
# transplanted weights vs the reference choreography
# (train_dg_single_gpu.py:258-327) on the torch model — deterministic mode
# (FPS start 0, dropout off, running BN stats) on both sides.
# ---------------------------------------------------------------------------

LOSS_CFG = {
    "METHODS": {
        "MMD_WEIGHT": 1.0,
        "CLS_WEIGHT": 1.0,
        "GEO_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 50,
                     "GEO_WEIGHTS": "mean2one", "GEO_SCALE": 1}],
        "SEM_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 5,
                     "SEM_WEIGHTS": "mean2one", "LABEL_WEIGHT": 0.5,
                     "SEM_SCALE": 1}],
        "TARGET_LOSS": 0.0,
        "SRC_LOSS_WEIGHT": 1.0,
        "ADV_WEIGHT": 0.7,
        "GRL": False,
        "PURE_CLS_EPOCH": 0,
    },
    "OPTIMIZATION": {"WEIGHT_DECAY": 0.0005, "LR": 1e-4, "LR_SCALER": 1.0,
                     "NUM_EPOCHES": 2, "CLS_LOSS": "CrossEntropyLoss"},
    "DATASET": {"NUM_CLASS": 10},
}


def _reference_dg_losses(ref, model, pc_s, label_s, pc_t, label_t):
    """The reference loss choreography (train_dg_single_gpu.py:258-327) in
    deterministic mode. ADV ordering follows the documented fix: the
    reference adds loss_adv at :276 BEFORE loss_s exists (UnboundLocalError
    when ADV_WEIGHT > 0); here it is added after the head average."""
    m = LOSS_CFG["METHODS"]
    criterion = torch.nn.CrossEntropyLoss()
    inp_s = torch.from_numpy(pc_s.transpose(0, 2, 1)[..., None])
    inp_t = torch.from_numpy(pc_t.transpose(0, 2, 1)[..., None])
    lab_s = torch.from_numpy(label_s).long()
    lab_t = torch.from_numpy(label_t).long()
    with torch.no_grad(), cuda_as_cpu(), fps_start_zeros():
        pred_s1, pred_s2, sem_s1, sem_s2 = model(inp_s, semantic_adaption=True)
        pred_t1, pred_t2, sem_t1, sem_t2 = model(inp_t, semantic_adaption=True)
        loss_s = 0.5 * criterion(pred_s1, lab_s) + 0.5 * criterion(pred_s2, lab_s)
        loss_adv = -m["ADV_WEIGHT"] * ref.train_utils.discrepancy(pred_t1, pred_t2)
        loss_s = loss_s + loss_adv
        loss_cls = m["CLS_WEIGHT"] * m["SRC_LOSS_WEIGHT"] * loss_s

        feat_node_s = model(inp_s, node_adaptation_s=True)
        feat_node_t = model(inp_t, node_adaptation_t=True)
        geo_cfg = m["GEO_MMD"][0]
        loss_geo = m["MMD_WEIGHT"] * geo_cfg["GEO_SCALE"] * ref.mmd.mmd_cal(
            lab_s, feat_node_s, lab_t, feat_node_t, geo_cfg,
            data_s=torch.from_numpy(pc_s), data_t=torch.from_numpy(pc_t),
        )
        sem_cfg = m["SEM_MMD"][0]
        l1 = sem_cfg["SEM_SCALE"] * ref.mmd.mmd_cal(
            lab_s, sem_s1, lab_t, sem_t1, sem_cfg, data_s=pred_s1, data_t=pred_t1
        )
        l2 = sem_cfg["SEM_SCALE"] * ref.mmd.mmd_cal(
            lab_s, sem_s2, lab_t, sem_t2, sem_cfg, data_s=pred_s2, data_t=pred_t2
        )
        loss_sem = m["MMD_WEIGHT"] * (0.5 * l1 + 0.5 * l2)
    return {
        "loss_cls": float(loss_cls),
        "loss_adv": float(loss_adv),
        "loss_geo": float(loss_geo),
        "loss_sem": float(loss_sem),
        "loss_total": float(loss_cls + loss_geo + loss_sem),
    }


@pytest.mark.parametrize("stacked", [False, True])
@pytest.mark.parametrize("model_name", ["Pointnet", "DGCNN"])
def test_dg_loss_parity_with_transplant(ref, model_name, stacked, monkeypatch):
    """stacked=True additionally proves SUG_STACKED_FORWARD=1 reproduces the
    reference's losses exactly in deterministic mode (train=False: BN eval
    stats, no dropout — the only stacked-vs-sequential deviation channel)."""
    if stacked:
        monkeypatch.setenv("SUG_STACKED_FORWARD", "1")
    from sug_tpu.engine.dg_trainer import DGTrainer

    rng = np.random.default_rng(3)
    B, N = 8, 1024
    pc_s = rng.uniform(-1.0, 1.0, size=(B, N, 3)).astype(np.float32)
    pc_t = rng.uniform(-1.0, 1.0, size=(B, N, 3)).astype(np.float32)
    label_s = rng.integers(0, 10, B).astype(np.int64)
    label_t = rng.integers(0, 10, B).astype(np.int64)

    torch.manual_seed(11)
    with cuda_as_cpu():
        model = ref.Model.Net_MDA(model_name=model_name)
        _randomize_norms(model, 12)
        model.eval()
    want = _reference_dg_losses(ref, model, pc_s, label_s, pc_t, label_t)

    variables = convert_net_mda(state_dict_to_numpy(model.state_dict()), model_name)
    cfg = dict(LOSS_CFG, Model=model_name)
    trainer = DGTrainer(cfg, model_name=model_name, mesh=None, augment=False)
    _, (_, metrics) = trainer._loss(
        variables["params"], variables["batch_stats"],
        jnp.asarray(pc_s), jnp.asarray(label_s, jnp.int32),
        jnp.asarray(pc_t), jnp.asarray(label_t, jnp.int32),
        jax.random.key(0), jnp.float32(0.0), True, train=False,
    )
    got = {k: float(v) for k, v in metrics.items()}

    tol = TOL[model_name]
    for k in ("loss_cls", "loss_adv", "loss_geo", "loss_sem", "loss_total"):
        np.testing.assert_allclose(got[k], want[k], rtol=10 * tol, atol=tol,
                                   err_msg=k)


def test_ptran_transplant_fused_kernel_parity(ref, monkeypatch):
    """Transplanted PTran through the FUSED vector-attention kernel
    (interpret mode on CPU, f32-faithful + 3-pass MLP matmuls) must match
    the torch reference too — proving the transplant holds on the path
    production actually runs, not just the XLA formulation."""
    rng = np.random.default_rng(43)
    B, N = 2, 1024
    pc = rng.uniform(-1.0, 1.0, size=(B, N, 3)).astype(np.float32)

    model, want = _run_reference(ref, "PTran", pc, seed=9)
    variables = convert_net_mda(state_dict_to_numpy(model.state_dict()), "PTran")

    monkeypatch.setenv("SUG_FUSED_VECATTN", "interpret")
    monkeypatch.setenv("SUG_VECATTN_F32_MM", "3pass")
    got = _run_mine("PTran", variables, pc)

    perm = NODE_PERM
    # 3-pass matmuls are ~f32 but not bit-f32; the looser 2e-3 bound still
    # catches any wiring/permutation error (those are O(1), not O(1e-3))
    tol = 2e-3
    np.testing.assert_allclose(
        got["global_feat"], want["global_feat"], rtol=tol, atol=tol,
        err_msg="global feature (fused kernel)",
    )
    np.testing.assert_allclose(
        got["node_flat"], want["node_flat"][:, perm], rtol=tol, atol=tol,
        err_msg="node features (fused kernel)",
    )
    for k in ("sem1", "sem2", "logits1", "logits2"):
        np.testing.assert_allclose(
            got[k], want[k], rtol=tol, atol=tol, err_msg=f"{k} (fused kernel)"
        )


# ---------------------------------------------------------------------------
# KPConv block-level parity: identical precomputed neighbor inputs through the
# reference KPConv (model/KPConv_blocks.py:208-453, stacked rows + shadow
# index) and KPConvOp (batched + mask), with the reference's actual (random-
# rotated) kernel-point dispositions injected. Covers rigid (linear/gaussian/
# constant x sum/closest), deformable, and modulated-deformable, plus the
# p2p fitting/repulsive regularizer value (model/KPConv_model.py:282-315).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_kp():
    """Import the reference KPConv blocks, isolated like the ``ref`` fixture."""
    stashed = {}
    for name in list(sys.modules):
        if name.split(".")[0] in _REF_TOPLEVEL:
            stashed[name] = sys.modules.pop(name)
    sys.path.insert(0, REF_ROOT)
    cwd = os.getcwd()
    os.makedirs("/tmp/kpconv_ref_cache", exist_ok=True)
    os.chdir("/tmp/kpconv_ref_cache")  # load_kernels caches dispositions in cwd
    try:
        import model.KPConv_blocks as KPB

        ns = types.SimpleNamespace(KPConv=KPB.KPConv)
    finally:
        os.chdir(cwd)
        sys.path.remove(REF_ROOT)
        for name in list(sys.modules):
            if name.split(".")[0] in _REF_TOPLEVEL:
                del sys.modules[name]
        sys.modules.update(stashed)
    return ns


def _kp_problem(seed, Q=24, S=48, k=10, Cin=8, radius=0.05):
    """Random queries + supports clustered inside ``radius`` balls, neighbor
    indices with genuine shadow slots (== S), and POSITIVE features (the
    reference's neighbor-count normalization counts rows with positive
    feature sums, KPConv_blocks.py:445-449 — positive features make that
    equal to the valid-slot count on both sides)."""
    rng = np.random.default_rng(seed)
    q_pts = rng.uniform(-0.5, 0.5, size=(Q, 3)).astype(np.float32)
    # supports: for each query a few points inside its radius ball
    base = np.repeat(q_pts, 2, axis=0)[:S]
    s_pts = (base + rng.uniform(-0.6, 0.6, size=(S, 3)) * radius).astype(np.float32)
    d = np.sum((q_pts[:, None] - s_pts[None]) ** 2, -1)
    idx = np.argsort(d, axis=1)[:, :k].astype(np.int64)
    # shadow out the slots beyond each row's radius (keep >= 1 real neighbor)
    within = np.take_along_axis(d, idx, 1) < (radius * 1.5) ** 2
    within[:, 0] = True
    idx = np.where(within, idx, S)
    x = rng.uniform(0.1, 1.0, size=(S, Cin)).astype(np.float32)
    return q_pts, s_pts, idx, x


def _run_kp_pair(ref_kp, monkeypatch, *, influence, aggregation,
                 deformable=False, modulated=False, seed=5):
    from sug_tpu.models import kpconv as kp_mod
    from sug_tpu.models.kpconv import KPConvOp

    K, Cin, Cout, radius, extent = 15, 8, 16, 0.05, 0.04
    q_pts, s_pts, idx, x = _kp_problem(seed, Cin=Cin, radius=radius)

    torch.manual_seed(seed)
    cwd = os.getcwd()
    os.chdir("/tmp/kpconv_ref_cache")
    try:
        conv = ref_kp.KPConv(
            K, 3, Cin, Cout, extent, radius,
            KP_influence=influence, aggregation_mode=aggregation,
            deformable=deformable, modulated=modulated,
        )
    finally:
        os.chdir(cwd)
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        conv.weights.uniform_(-0.5, 0.5, generator=g)
        if deformable:
            # small real offsets: keep every valid neighbor within KP_extent
            # of some deformed kernel point, so the reference's in-range
            # re-gather keeps them all (the normalization count matches)
            conv.offset_conv.weights.uniform_(-0.02, 0.02, generator=g)
            conv.offset_bias.uniform_(-0.01, 0.01, generator=g)

    with torch.no_grad():
        want = conv(
            torch.from_numpy(q_pts), torch.from_numpy(s_pts),
            torch.from_numpy(idx), torch.from_numpy(x),
        ).numpy()

    # inject the reference's kernel dispositions (random rotation included);
    # KPConvOp calls load_kernels for the OUTER conv first, then offset_conv
    kps = [np.asarray(conv.kernel_points.numpy(), np.float32)]
    if deformable:
        kps.append(np.asarray(conv.offset_conv.kernel_points.numpy(), np.float32))
    queue = list(kps)
    monkeypatch.setattr(
        kp_mod, "load_kernels", lambda *a, **kw: queue.pop(0)
    )

    op = KPConvOp(
        Cout, extent, radius, K, influence=influence, aggregation=aggregation,
        deformable=deformable, modulated=modulated,
    )
    mask = (idx < s_pts.shape[0]).astype(np.float32)
    idx_c = np.where(idx < s_pts.shape[0], idx, 0).astype(np.int32)
    params = {"weights": jnp.asarray(conv.weights.detach().numpy())}
    if deformable:
        params["offset_bias"] = jnp.asarray(conv.offset_bias.detach().numpy())
        params["offset_conv"] = {
            "weights": jnp.asarray(conv.offset_conv.weights.detach().numpy())
        }
    got, sown = op.apply(
        {"params": params},
        jnp.asarray(q_pts)[None], jnp.asarray(s_pts)[None],
        jnp.asarray(idx_c)[None], jnp.asarray(mask)[None],
        jnp.asarray(x)[None],
        mutable=["regularizers"],
    )
    assert not queue, "load_kernels call-order drifted from the reference"
    return want, np.asarray(got[0]), conv, sown


@pytest.mark.parametrize(
    "influence,aggregation",
    [("linear", "sum"), ("gaussian", "sum"), ("constant", "sum"),
     ("linear", "closest")],
)
def test_kpconv_block_rigid_parity(ref_kp, monkeypatch, influence, aggregation):
    want, got, _, _ = _run_kp_pair(
        ref_kp, monkeypatch, influence=influence, aggregation=aggregation
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("modulated", [False, True])
def test_kpconv_block_deformable_parity(ref_kp, monkeypatch, modulated):
    want, got, conv, sown = _run_kp_pair(
        ref_kp, monkeypatch, influence="linear", aggregation="sum",
        deformable=True, modulated=modulated, seed=9,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # regularizer value parity (model/KPConv_model.py:282-315, one layer)
    from sug_tpu.models.kpconv import p2p_fitting_regularizer

    got_reg = float(p2p_fitting_regularizer(sown["regularizers"],
                                            deform_fitting_power=1.0,
                                            repulse_extent=1.2))
    ext = 0.04
    with torch.no_grad():
        kp_min_d2 = conv.min_d2 / (ext ** 2)
        fitting = torch.nn.functional.l1_loss(
            kp_min_d2, torch.zeros_like(kp_min_d2)
        )
        kp_locs = conv.deformed_KP / ext
        repulsive = torch.zeros(())
        K = kp_locs.shape[1]
        for i in range(K):
            other = torch.cat([kp_locs[:, :i], kp_locs[:, i + 1:]], dim=1)
            dd = torch.sqrt(torch.sum((other - kp_locs[:, i:i + 1]) ** 2, dim=2))
            rep = torch.sum(torch.clamp_max(dd - 1.2, max=0.0) ** 2, dim=1)
            repulsive = repulsive + torch.nn.functional.l1_loss(
                rep, torch.zeros_like(rep)) / K
        want_reg = float(2 * fitting + repulsive)
    np.testing.assert_allclose(got_reg, want_reg, rtol=1e-4, atol=1e-6)
