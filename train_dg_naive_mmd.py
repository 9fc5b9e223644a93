#!/usr/bin/env python
"""PointDAN-style DG baseline: alternating (cls + adv) / node-MMD updates on
the two source sub-domains.

CLI parity with the reference train_dg_naive_mmd.py:
    python train_dg_naive_mmd.py --source modelnet \
        --cfg tools/cfgs/cfgs_local/DG_baseline.yaml
"""

import datetime
import math
import os
import time
import warnings

import jax
import numpy as np

from sug_tpu.data import (
    BatchIterator,
    ClassBalancedBatchIterator,
    create_single_dataset,
    create_splitted_dataset,
    DATASET_LIST,
)
from sug_tpu.engine.alternating_trainer import AlternatingTrainer
from sug_tpu.engine.checkpoint import save_checkpoint, wait_for_saves
from sug_tpu.engine.dg_trainer import make_criterion
from sug_tpu.engine.evaluation import Evaluator, eval_worker
from sug_tpu.engine.optim import cosine_lr, dis_lr_schedule
from sug_tpu.utils.config import log_config_to_file, parser_config
from sug_tpu.utils.logging import MetricsWriter, create_logger, exp_log_folder_creator

warnings.filterwarnings("ignore")


def main():
    args, cfg = parser_config()
    from sug_tpu.utils.config import resolve_seed

    seed = resolve_seed(args, cfg)
    np.random.seed(seed)

    output_dir, ckpt_dir = exp_log_folder_creator(cfg, extra_tag=args.source)
    log_name = "log_train_dg_naive%s.txt" % datetime.datetime.now().strftime(
        "%Y%m%d-%H%M%S"
    )
    logger = create_logger(log_file=os.path.join(output_dir, log_name))
    writer = MetricsWriter(os.path.join(output_dir, "tensorboard"))
    log_config_to_file(cfg, logger=logger)

    model_name = cfg.get("Model", "Pointnet")
    test_datasets = [d for d in DATASET_LIST if d != args.source]
    batch_size = args.batch_size

    subsets = create_splitted_dataset(
        dataset_type=args.source, status="train", logger=logger,
        config=cfg["DATASET_SPLITTER"], model=model_name,
        data_root=cfg.get("DATA_ROOT"),
    )
    sc = cfg["DATASET_SPLITTER"]
    src_ds = subsets[sc["TRAIN_BASE"]]
    tgt_ds = subsets[1 - sc["TRAIN_BASE"]]

    def make_iter(ds, s):
        if cfg["METHODS"].get("CLASS_BALANCE", False):
            return ClassBalancedBatchIterator(ds, batch_size, 10, seed=s)
        return BatchIterator(ds, batch_size, seed=s)

    src_iter, tgt_iter = make_iter(src_ds, seed), make_iter(tgt_ds, seed + 1)

    eval_sets = {
        "source": create_single_dataset(args.source, "test", model=model_name,
                                        data_root=cfg.get("DATA_ROOT")),
        "test1": create_single_dataset(test_datasets[0], "test", model=model_name,
                                       data_root=cfg.get("DATA_ROOT")),
        "test2": create_single_dataset(test_datasets[-1], "test", model=model_name,
                                       data_root=cfg.get("DATA_ROOT")),
    }
    remap = {"source": args.source, "test1": test_datasets[0], "test2": test_datasets[1]}

    opt_cfg = cfg["OPTIMIZATION"]
    criterion = make_criterion(opt_cfg, src_ds, cfg["DATASET"]["NUM_CLASS"])
    trainer = AlternatingTrainer(
        model_name=model_name, mode="naive", cfg=cfg, criterion=criterion,
        weight_decay=float(opt_cfg["WEIGHT_DECAY"]), use_grl=True,
    )
    state = trainer.init_state(seed=seed, batch_size=batch_size, num_points=1024)
    evaluator = Evaluator(trainer.eval_apply, criterion=criterion)

    max_epochs = opt_cfg["NUM_EPOCHES"]
    LR = float(opt_cfg["LR"])
    scaler = float(opt_cfg["LR_SCALER"])
    best_acc = {k: [0, 0.0] for k in eval_sets}
    rng_key = jax.random.key(seed)

    for epoch in range(max_epochs):
        src_iter.set_epoch(epoch)
        tgt_iter.set_epoch(epoch)
        since = time.time()
        lr_g = cosine_lr(LR, epoch, max_epochs)
        lr_dis = dis_lr_schedule(LR, scaler, epoch)
        cons = math.sin((epoch + 1) / max_epochs * math.pi / 2)
        writer.add_scalar("lr_g", lr_g, epoch)
        writer.add_scalar("lr_dis", lr_dis, epoch)

        totals = {"loss_s": 0.0, "loss_adv": 0.0, "loss_node": 0.0}
        n = 0
        for batch_idx, ((ds_, ls_), (dt_, lt_)) in enumerate(zip(src_iter, tgt_iter)):
            rng_key, k = jax.random.split(rng_key)
            state, metrics = trainer.train_step(
                state, ds_, ls_, dt_, lt_, k, lr_g, lr_g, lr_dis, cons
            )
            bs = ds_.shape[0]
            n += bs
            for key in totals:
                totals[key] += float(metrics[key]) * bs
            if (batch_idx + 1) % 10 == 0:
                logger.info(f"Train Epoch {epoch} [{n}]")
                logger.info(
                    f"loss_s {totals['loss_s'] / n} loss_adv: {totals['loss_adv'] / n} "
                    f"loss_node_adv {totals['loss_node'] / n}"
                )
        for key in totals:
            writer.add_scalar(f"loss/{key}", totals[key] / max(n, 1), epoch)

        for name, dataset in eval_sets.items():
            loader = BatchIterator(dataset, batch_size, shuffle=False, drop_last=False)
            result = eval_worker(
                {
                    "evaluator": evaluator,
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "dataloader": loader,
                    "dataset": name,
                    "dataset_name": remap[name],
                    "epoch": epoch,
                    "best_target_acc": best_acc[name][1],
                    "best_target_acc_epoch": best_acc[name][0],
                },
                logger,
            )
            best_acc[name][1] = result["best_target_acc"]
            best_acc[name][0] = result["best_target_acc_epoch"]
            tag = f"acc/{name}_{remap[name]}"
            writer.add_scalar(tag + "_best_acc", result["best_target_acc"], epoch)
            writer.add_scalar(tag + "_cur_acc", result["cur_target_acc"], epoch)

        if (epoch + 1) % args.ckpt_save_interval == 0:
            path = save_checkpoint(ckpt_dir, args.source, epoch + 1, state,
                                   max_ckpt_save_num=args.max_ckpt_save_num)
            logger.info(f"Save current ckpt to {path}")

        dt = time.time() - since
        logger.info("The {} epoch takes {:.0f}m {:.0f}s".format(epoch, dt // 60, dt % 60))

    wait_for_saves()  # flush any in-flight async checkpoint write


if __name__ == "__main__":
    main()
