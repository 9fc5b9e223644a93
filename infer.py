#!/usr/bin/env python
"""Batch inference / zero-shot evaluation from a checkpoint.

The serving-side entry the reference lacks (its only checkpoint consumer is
the offline splitter): loads an orbax checkpoint (DG twin-head or standalone
classifier), runs the jitted predictor over a dataset or an .npy file of
clouds, reports accuracy (if labels exist) and optionally saves predictions.

    python infer.py --ckpt <ckpt_dir> --model DGCNN --dg \
        --dataset scannet --split test [--data_root ...] [--save preds.npy]
    python infer.py --ckpt <ckpt_dir> --model Pointnet --pts clouds.npy
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from sug_tpu.data.datasets import (
    PointCloudDataset,
    create_single_dataset,
    normalize_pc_np,
)
from sug_tpu.engine.checkpoint import restore_checkpoint
from sug_tpu.engine.evaluation import Evaluator
from sug_tpu.data.sampler import BatchIterator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint directory")
    ap.add_argument("--model", default="Pointnet")
    ap.add_argument("--dg", action="store_true", help="DG twin-head checkpoint (ensembled)")
    ap.add_argument("--dataset", default=None, help="scannet/shapenet/modelnet")
    ap.add_argument("--split", default="test")
    ap.add_argument("--pts", default=None, help=".npy file of raw clouds instead of a dataset")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--num_points", type=int, default=1024)
    ap.add_argument("--save", default=None, help="write predicted labels to this .npy")
    args = ap.parse_args()

    if args.dg:
        from sug_tpu.engine.dg_trainer import DGTrainer
        from sug_tpu.utils.config import ConfigDict

        cfg = ConfigDict(
            {
                "METHODS": {"GRL": False},
                "OPTIMIZATION": {"WEIGHT_DECAY": 0.0},
            }
        )
        trainer = DGTrainer(cfg, model_name=args.model)
        state = trainer.init_state(0, args.batch_size, args.num_points)

        def apply_fn(params, batch_stats, data):
            out = trainer.model.apply(
                {"params": params, "batch_stats": batch_stats}, data, False
            )
            return (out["logits1"] + out["logits2"]) / 2.0

    else:
        from sug_tpu.engine.source_trainer import SourceTrainer

        trainer = SourceTrainer(model_name=args.model)
        state = trainer.init_state(0, args.batch_size, args.num_points)
        apply_fn = trainer.eval_apply

    state = restore_checkpoint(args.ckpt, state)["state"]
    predictor = jax.jit(lambda d: jnp.argmax(apply_fn(state.params, state.batch_stats, d), -1))

    if args.pts:
        raw = np.load(args.pts).astype(np.float32)[..., :3]
        ds = PointCloudDataset("modelnet", raw, np.zeros(len(raw)), aug=False,
                               num_points=args.num_points)
        preds = []
        t0 = time.perf_counter()
        for i in range(0, len(ds), args.batch_size):
            batch = ds.pts[i : i + args.batch_size]
            pad = args.batch_size - batch.shape[0]
            if pad:
                batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
            p = np.asarray(predictor(jnp.asarray(batch)))
            preds.append(p[: args.batch_size - pad] if pad else p)
        preds = np.concatenate(preds)
        dt = time.perf_counter() - t0
        print(f"predicted {len(preds)} clouds in {dt:.2f}s ({len(preds)/dt:.0f} clouds/s)")
    else:
        assert args.dataset, "--dataset or --pts required"
        ds = create_single_dataset(
            args.dataset, args.split, model=args.model, data_root=args.data_root,
            pc_num=args.num_points,
        )
        ev = Evaluator(apply_fn)
        loader = BatchIterator(ds, args.batch_size, shuffle=False, drop_last=False)
        t0 = time.perf_counter()
        res = ev.run(state.params, state.batch_stats, loader)
        dt = time.perf_counter() - t0
        print(
            f"{args.dataset}/{args.split}: overall_acc={res['overall_acc']:.4f} "
            f"mean_class_acc={res['mean_class_acc']:.4f} "
            f"({len(ds)/dt:.0f} clouds/s incl. compile)"
        )
        print("per-class acc:", np.round(res["class_acc"], 3))
        preds = None

    if args.save and preds is not None:
        np.save(args.save, preds)
        print(f"saved predictions to {args.save}")


if __name__ == "__main__":
    main()
