"""Integration tests: the full DG/source training loops end-to-end on tiny
synthetic data (data dirs -> split -> train -> eval -> checkpoint -> resume)."""

import os
import types

import numpy as np
import pytest

from sug_tpu.data.datasets import make_synthetic_pointda
from sug_tpu.engine.dg_loop import run_dg_training
from sug_tpu.engine.source_loop import run_source_training
from sug_tpu.utils.config import ConfigDict


def write_domains(root):
    for i, ds in enumerate(["modelnet", "shapenet", "scannet"]):
        d = root / ds
        d.mkdir(parents=True, exist_ok=True)
        for split, n in (("train", 4), ("test", 2)):
            pts, labels = make_synthetic_pointda(
                num_per_class=n, num_points=64, seed=10 * i + (split == "test"),
                noise=0.01 * (i + 1),
            )
            np.save(d / f"{split}_pts.npy", pts)
            np.save(d / f"{split}_label.npy", labels)


def make_args(**kw):
    base = dict(
        source="modelnet", batch_size=8, epochs=2, gpu="0",
        pretrained_model=None, ckpt_save_interval=1, max_ckpt_save_num=2,
        set_cfgs=None, launcher="none", tcp_port=18888, local_rank=0,
        fix_random_seed=False, resume=None, num_devices=None,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


def dg_cfg(root):
    return ConfigDict(
        {
            "LOCAL_RANK": 0,
            "EXPERIMENT": "test_exp",
            "EXTRA_TAG": "itest",
            "DATA_ROOT": str(root),
            "DATASET": {"NUM_CLASS": 10},
            "Model": "Pointnet",
            "METHODS": {
                "MMD_WEIGHT": 1.0,
                "CLS_WEIGHT": 1.0,
                "GEO_MMD": [
                    {"NAME": "SOFT_MMD", "LABEL_SCALE": 50, "GEO_WEIGHTS": "mean2one", "GEO_SCALE": 1}
                ],
                "SEM_MMD": [
                    {"NAME": "SOFT_MMD", "LABEL_SCALE": 5, "SEM_WEIGHTS": "mean2one",
                     "LABEL_WEIGHT": 0.5, "SEM_SCALE": 1}
                ],
                "TARGET_LOSS": 1.0,
                "SRC_LOSS_WEIGHT": 1.0,
                "CLASS_BALANCE": False,
                "ADV_WEIGHT": 0.5,
                "PURE_CLS_EPOCH": 1,
                "GRL": False,
            },
            "DATASET_SPLITTER": {
                "METHOD": "Random", "SUBSET_FULLSIZE": False, "SAMPLE_RATE": 0.5,
                "TRAIN_BASE": 1, "RELOAD": True,
            },
            "OPTIMIZATION": {
                "NUM_EPOCHES": 2, "LR": 1e-3, "LR_SCALER": 1.0,
                "WEIGHT_DECAY": 5e-4, "MOMENTUM": 0.9, "CLS_LOSS": "ClassWeighting",
                "CLS_WEIGHT": "DLSA", "DLSA_Q": 0.4, "CLS_EVAL": True,
            },
        }
    )


@pytest.mark.slow
def test_dg_loop_end_to_end(tmp_path):
    write_domains(tmp_path)
    cfg = dg_cfg(tmp_path)
    args = make_args()
    best = run_dg_training(args, cfg, num_points=64)
    # all three eval sets tracked; accuracies are valid probabilities
    assert set(best) == {"source", "test1", "test2"}
    for epoch_at, acc in best.values():
        assert 0.0 <= acc <= 1.0
    # a checkpoint was written under the exp tree (save interval 1); the
    # exp root lands at DATA_ROOT[/PointDA_data]/output/<EXTRA_TAG>
    ckpts = [p for p, _, _ in os.walk(tmp_path) if "_checkpoint_epoch_" in p]
    assert ckpts, "expected a checkpoint directory"
    # metrics mirror exists
    jsonls = [
        os.path.join(r, f)
        for r, _, fs in os.walk(tmp_path)
        for f in fs
        if f == "metrics.jsonl"
    ]
    assert jsonls and os.path.getsize(jsonls[0]) > 0


@pytest.mark.slow
def test_source_loop_end_to_end_with_resume(tmp_path):
    write_domains(tmp_path)
    cfg = dg_cfg(tmp_path)
    args = make_args()
    run_source_training(args, cfg, num_points=64)
    ckpts = sorted(
        p for p, _, _ in os.walk(tmp_path) if p.endswith("_checkpoint_epoch_2")
    )
    assert ckpts
    # resume from the saved checkpoint and run one more epoch
    cfg2 = dg_cfg(tmp_path)
    cfg2["OPTIMIZATION"]["NUM_EPOCHES"] = 3
    args2 = make_args(resume=ckpts[0])
    best = run_source_training(args2, cfg2, num_points=64)
    assert set(best) == {"source", "test1", "test2"}
