#!/usr/bin/env python
"""UDA comparison trainer (PointDAN-style): trains on a labeled source and a
REAL unlabeled target domain with GRL + node-MMD alternating updates.

CLI parity with the reference train_uda.py:29-41 (plain argparse, no YAML):
    python train_uda.py -source scannet -target modelnet -b 64 -e 200
"""

import argparse
import datetime
import math
import os
import time

import jax
import numpy as np

from sug_tpu.data import BatchIterator, create_single_dataset, DATASET_LIST
from sug_tpu.engine.alternating_trainer import AlternatingTrainer
from sug_tpu.engine.evaluation import Evaluator, eval_worker
from sug_tpu.engine.optim import cosine_lr, dis_lr_schedule
from sug_tpu.utils.logging import MetricsWriter, create_logger


def parse_args():
    p = argparse.ArgumentParser(description="Main")
    p.add_argument("-source", "-s", type=str, default="scannet")
    p.add_argument("-target", "-t", type=str, default="modelnet")
    p.add_argument("-batchsize", "-b", type=int, default=64)
    p.add_argument("-gpu", "-g", type=str, default="0")
    p.add_argument("-epochs", "-e", type=int, default=200)
    p.add_argument("-models", "-m", type=str, default="MDA")
    p.add_argument("-lr", type=float, default=0.0001)
    p.add_argument("-scaler", type=float, default=1.0)
    p.add_argument("-weight", type=float, default=1.0, help="weight of src loss")
    p.add_argument("-datadir", type=str, default="./dataset/")
    p.add_argument("-tb_log_dir", type=str, default="./logs")
    p.add_argument("-model_name", type=str, default="Pointnet")
    return p.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.tb_log_dir, exist_ok=True)
    writer = MetricsWriter(args.tb_log_dir)
    logger = create_logger()

    data_root = (
        args.datadir if "data" in args.datadir
        else os.path.join(args.datadir, "PointDA_data/")
    )
    assert args.source in DATASET_LIST and args.target in DATASET_LIST
    seed = 666
    np.random.seed(seed)

    src_train = create_single_dataset(args.source, "train", aug=True, data_root=data_root)
    tgt_train = create_single_dataset(args.target, "train", aug=True, data_root=data_root)
    eval_sets = {
        "source": create_single_dataset(args.source, "test", data_root=data_root),
        "test1": create_single_dataset(args.target, "test", data_root=data_root),
    }

    trainer = AlternatingTrainer(
        model_name=args.model_name, mode="uda", src_weight=args.weight,
        weight_decay=5e-4, use_grl=True,
    )
    state = trainer.init_state(seed=seed, batch_size=args.batchsize, num_points=1024)
    # eval loss = the trainer's criterion (CE here, matching the reference's
    # hardcoded CrossEntropyLoss handed to eval, train_uda.py:96,203)
    evaluator = Evaluator(trainer.eval_apply, criterion=trainer.criterion)

    best_acc = {k: [0, 0.0] for k in eval_sets}
    remain_epoch = 50  # reference cosine horizon pad (train_uda.py optimizer setup)
    rng_key = jax.random.key(seed)
    src_iter = BatchIterator(src_train, args.batchsize, seed=seed)
    tgt_iter = BatchIterator(tgt_train, args.batchsize, seed=seed + 1)

    for epoch in range(args.epochs):
        src_iter.set_epoch(epoch)
        tgt_iter.set_epoch(epoch)
        since = time.time()
        lr_g = cosine_lr(args.lr, epoch, args.epochs + remain_epoch)
        lr_c = cosine_lr(args.lr * 2, epoch, args.epochs + remain_epoch)
        lr_dis = dis_lr_schedule(args.lr, args.scaler, epoch)
        cons = math.sin((epoch + 1) / args.epochs * math.pi / 2)
        writer.add_scalar("lr_g", lr_g, epoch)
        writer.add_scalar("lr_c", lr_c, epoch)
        writer.add_scalar("lr_dis", lr_dis, epoch)

        totals = {"loss_s": 0.0, "loss_adv": 0.0, "loss_node": 0.0}
        n = 0
        for batch_idx, ((ds_, ls_), (dt_, lt_)) in enumerate(zip(src_iter, tgt_iter)):
            rng_key, k = jax.random.split(rng_key)
            state, metrics = trainer.train_step(
                state, ds_, ls_, dt_, lt_, k, lr_g, lr_c, lr_dis, cons
            )
            bs = ds_.shape[0]
            n += bs
            for key in totals:
                totals[key] += float(metrics[key]) * bs
            if (batch_idx + 1) % 10 == 0:
                print(
                    "Train:{} [{}  loss_s: {:.4f}  loss_adv: {:.4f}  "
                    "loss_node_adv: {:.4f}  cons: {:.4f}]".format(
                        epoch, n, totals["loss_s"] / n, totals["loss_adv"] / n,
                        totals["loss_node"] / n, cons,
                    )
                )

        for name, dataset in eval_sets.items():
            loader = BatchIterator(dataset, args.batchsize, shuffle=False, drop_last=False)
            result = eval_worker(
                {
                    "evaluator": evaluator,
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "dataloader": loader,
                    "dataset": name,
                    "dataset_name": name,
                    "epoch": epoch,
                    "best_target_acc": best_acc[name][1],
                    "best_target_acc_epoch": best_acc[name][0],
                },
                logger,
            )
            best_acc[name][1] = result["best_target_acc"]
            best_acc[name][0] = result["best_target_acc_epoch"]
            writer.add_scalar(f"acc/{name}_test_acc", result["best_target_acc"], epoch)

        dt = time.time() - since
        print("The {} epoch takes {:.0f}m {:.0f}s".format(epoch, dt // 60, dt % 60))


if __name__ == "__main__":
    since = time.time()
    main()
