"""Coverage for remaining config branches: multi-splitter rotation, the
entropy train-time loader, and a golden-value regression of the DG loss."""

import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sug_tpu.data.datasets import make_synthetic_pointda
from sug_tpu.data.offline_splitter import spliter_cls_data
from sug_tpu.data.splitter import split_dataset
from sug_tpu.engine.dg_trainer import DGTrainer
from sug_tpu.utils.config import ConfigDict


def test_entropy_trainside_loader(tmp_path, rng):
    """Offline entropy cluster files (4 clusters, cls=-1 with label files)
    -> the train-time Entropy loader's [0] vs [1,2,3] split."""
    pts, labels = make_synthetic_pointda(num_per_class=8, num_points=32)
    droot = tmp_path / "PointDA_data"
    (droot / "modelnet").mkdir(parents=True)
    np.save(droot / "modelnet" / "train_pts.npy", pts)
    np.save(droot / "modelnet" / "train_label.npy", labels)

    clusters = np.asarray(rng.integers(0, 4, len(pts)), dtype=float)
    spliter_cls_data(
        pts_all=pts, cluster_labels=clusters, cls=-1, method="entropy",
        dataset_type="modelnet", raw_labels=labels,
        cls_entropy=rng.uniform(0, 1, len(pts)), data_root=str(droot),
    )
    cfg = ConfigDict(
        METHOD="Entropy", SUBSET_FULLSIZE=False, SAMPLE_RATE=0.5,
        TRAIN_BASE=1, RELOAD=False,
    )
    out = split_dataset("modelnet", cfg, data_root=str(droot))
    n1 = out["subset_1"]["pts"].shape[0]
    n2 = out["subset_2"]["pts"].shape[0]
    assert n1 == (clusters == 0).sum()
    assert n2 == (clusters != 0).sum()
    # labels preserved through the label sidecar files
    assert out["subset_1"]["label"].shape[0] == n1


@pytest.mark.slow
def test_multi_splitter_rotation(tmp_path):
    """A LIST of DATASET_SPLITTER configs rotates per epoch
    (reference train_dg_single_gpu.py:75-84, 229-232)."""
    from sug_tpu.engine.dg_loop import run_dg_training

    pts, labels = make_synthetic_pointda(num_per_class=4, num_points=32)
    for ds in ("modelnet", "shapenet", "scannet"):
        d = tmp_path / ds
        d.mkdir(parents=True)
        for split in ("train", "test"):
            np.save(d / f"{split}_pts.npy", pts)
            np.save(d / f"{split}_label.npy", labels)

    cfg = ConfigDict(
        {
            "LOCAL_RANK": 0,
            "EXPERIMENT": "e",
            "EXTRA_TAG": "multi",
            "DATA_ROOT": str(tmp_path),
            "DATASET": {"NUM_CLASS": 10},
            "Model": "Pointnet",
            "METHODS": {
                "MMD_WEIGHT": 0.0,
                "CLS_WEIGHT": 1.0,
                "GEO_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 1, "GEO_SCALE": 1}],
                "SEM_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 1, "LABEL_WEIGHT": 0.5, "SEM_SCALE": 0}],
                "TARGET_LOSS": 0.0,
                "SRC_LOSS_WEIGHT": 1.0,
                "ADV_WEIGHT": 0.0,
                "PURE_CLS_EPOCH": 0,
                "GRL": False,
            },
            "DATASET_SPLITTER": [
                {"METHOD": "Random", "SUBSET_FULLSIZE": False, "SAMPLE_RATE": 0.5,
                 "TRAIN_BASE": 1, "RELOAD": False, "EXTRA_TAG": "a"},
                {"METHOD": "Random", "SUBSET_FULLSIZE": True, "SAMPLE_RATE": 0.5,
                 "TRAIN_BASE": 0, "RELOAD": False, "EXTRA_TAG": "b"},
            ],
            "OPTIMIZATION": {
                "NUM_EPOCHES": 2, "LR": 1e-3, "LR_SCALER": 1.0,
                "WEIGHT_DECAY": 5e-4, "CLS_EVAL": False,
            },
        }
    )
    args = types.SimpleNamespace(
        source="modelnet", batch_size=8, epochs=2, gpu="0", pretrained_model=None,
        ckpt_save_interval=10, max_ckpt_save_num=2, set_cfgs=None, launcher="none",
        tcp_port=0, local_rank=0, fix_random_seed=False, resume=None, num_devices=None,
    )
    best = run_dg_training(args, cfg, num_points=32)
    assert set(best) == {"source", "test1", "test2"}


@pytest.mark.slow
def test_dg_loss_golden_value(rng):
    """Golden regression: fixed seeds -> the full DG loss stack must stay
    numerically stable across refactors (rtol covers platform noise)."""
    cfg = ConfigDict(
        {
            "METHODS": {
                "MMD_WEIGHT": 1.0,
                "CLS_WEIGHT": 1.0,
                "GEO_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 50, "GEO_WEIGHTS": "mean2one", "GEO_SCALE": 1}],
                "SEM_MMD": [{"NAME": "SOFT_MMD", "LABEL_SCALE": 5, "SEM_WEIGHTS": "mean2one",
                             "LABEL_WEIGHT": 0.5, "SEM_SCALE": 1}],
                "TARGET_LOSS": 1.0,
                "SRC_LOSS_WEIGHT": 1.0,
                "ADV_WEIGHT": 0.5,
                "PURE_CLS_EPOCH": 0,
                "GRL": False,
            },
            "OPTIMIZATION": {"NUM_EPOCHES": 10, "LR": 1e-3, "LR_SCALER": 1.0, "WEIGHT_DECAY": 5e-4},
        }
    )
    trainer = DGTrainer(cfg, model_name="Pointnet", augment=False)
    state = trainer.init_state(seed=0, batch_size=8, num_points=64)
    gen = np.random.default_rng(123)
    ds = jnp.asarray(gen.normal(size=(8, 64, 3)), jnp.float32)
    dt = jnp.asarray(gen.normal(size=(8, 64, 3)), jnp.float32)
    ls = jnp.asarray(gen.integers(0, 10, 8), jnp.int32)
    lt = jnp.asarray(gen.integers(0, 10, 8), jnp.int32)
    _, metrics = trainer.train_step(
        state, ds, ls, dt, lt, jax.random.key(7), 1e-3, 1e-3, 1e-3
    )
    # recorded on jax 0.9.0 CPU; update deliberately if the model or loss
    # stack changes on purpose
    assert float(metrics["loss_cls"]) == pytest.approx(2.8734, rel=0.05)
    assert float(metrics["loss_geo"]) == pytest.approx(1.1017, rel=0.05)
    assert float(metrics["loss_sem"]) == pytest.approx(0.8989, rel=0.05)
    assert float(metrics["loss_total"]) == pytest.approx(4.8740, rel=0.05)
