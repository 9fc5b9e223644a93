"""Source-only training loop behind train_source.py.

Reference: train_source.py:23-174 — full source dataset with augmentation,
Adam + cosine, plain CE, per-epoch zero-shot eval on source test + the two
unseen datasets, checkpoint rotation.
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Dict, List

import jax
import numpy as np

from sug_tpu.data import BatchIterator, create_single_dataset, DATASET_LIST
from sug_tpu.engine.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    wait_for_saves,
)
from sug_tpu.engine.evaluation import Evaluator, eval_worker
from sug_tpu.engine.optim import cosine_lr
from sug_tpu.engine.source_trainer import SourceTrainer
from sug_tpu.parallel.mesh import make_mesh
from sug_tpu.utils.config import log_config_to_file
from sug_tpu.utils.logging import MetricsWriter, create_logger, exp_log_folder_creator


def run_source_training(args, cfg, num_points: int = 1024):
    from sug_tpu.utils.config import resolve_seed

    seed = resolve_seed(args, cfg)
    np.random.seed(seed)

    mesh = None
    num_devices = args.num_devices or 1
    if num_devices > 1:
        mesh = make_mesh(args.num_devices)
        num_devices = mesh.devices.size
    batch_size = args.batch_size * max(1, num_devices)

    output_dir, ckpt_dir = exp_log_folder_creator(cfg, extra_tag=args.source)
    log_name = "log_train_source%s.txt" % datetime.datetime.now().strftime(
        "%Y%m%d-%H%M%S"
    )
    logger = create_logger(log_file=os.path.join(output_dir, log_name))
    writer = MetricsWriter(os.path.join(output_dir, "tensorboard"))
    for key, val in vars(args).items():
        logger.info("{:16} {}".format(key, val))
    log_config_to_file(cfg, logger=logger)

    test_datasets = [d for d in DATASET_LIST if d != args.source]
    model_name = cfg.get("Model", "Pointnet")
    num_cls = cfg["DATASET"]["NUM_CLASS"]

    train_dataset = create_single_dataset(
        args.source, "train", aug=True, model=model_name, data_root=cfg.get("DATA_ROOT")
    )
    eval_sets = {
        "source": create_single_dataset(
            args.source, "test", model=model_name, data_root=cfg.get("DATA_ROOT")
        ),
        "test1": create_single_dataset(
            test_datasets[0], "test", model=model_name, data_root=cfg.get("DATA_ROOT")
        ),
        "test2": create_single_dataset(
            test_datasets[-1], "test", model=model_name, data_root=cfg.get("DATA_ROOT")
        ),
    }
    dataset_remapping = {
        "source": args.source, "test1": test_datasets[0], "test2": test_datasets[1]
    }
    logger.info(
        f"num_source_train: {len(train_dataset)}, "
        + ", ".join(f"{k}: {len(v)}" for k, v in eval_sets.items())
    )

    opt_cfg = cfg["OPTIMIZATION"]
    from sug_tpu.models.precision import configure_from_cfg

    configure_from_cfg(cfg)
    from sug_tpu.models import bn as _bn

    _bn.configure_from_cfg(cfg, 1)
    if model_name == "KPConv":
        from sug_tpu.models.kpconv import check_neighbor_occupancy

        check_neighbor_occupancy(
            train_dataset.pts, cfg.get("MODEL_CFG", None), logger=logger
        )
    trainer = SourceTrainer(
        model_name=model_name,
        num_class=num_cls,
        weight_decay=float(opt_cfg["WEIGHT_DECAY"]),
        mesh=mesh,
        augment=True,
        donate=True,
    )
    state = trainer.init_state(seed=seed, batch_size=batch_size, num_points=num_points)

    start_epoch = 0
    if args.resume:
        restored = restore_checkpoint(args.resume, state)
        state = restored["state"]
        start_epoch = int(restored["epoch"])
        logger.info(f"Resumed from {args.resume} at epoch {start_epoch}")
    elif getattr(args, "pretrained_model", None):
        restored = restore_checkpoint(args.pretrained_model, state)
        state = state.replace(
            params=restored["state"].params,
            batch_stats=restored["state"].batch_stats,
        )
        logger.info(f"Warm-started weights from {args.pretrained_model}")

    # eval loss = the trainer's criterion (reference train_source.py:86,159
    # hardcodes CrossEntropyLoss and hands it to eval — threading the
    # trainer's criterion is identical there and stays faithful if a custom
    # criterion is ever configured)
    evaluator = Evaluator(
        trainer.eval_apply, num_class=num_cls, criterion=trainer.criterion
    )
    max_epoch_num = opt_cfg["NUM_EPOCHES"]
    LR = float(opt_cfg["LR"])
    best_test_acc: Dict[str, List] = {k: [0, 0.0] for k in eval_sets}

    rng_key = jax.random.key(seed)
    train_iter = BatchIterator(train_dataset, batch_size, shuffle=True, seed=seed)
    if os.environ.get("SUG_NATIVE_LOADER") == "1":
        # C++ ingest + prefetching batch assembly (sug_tpu/native); falls back
        # to the Python iterator when the shared library isn't built
        from sug_tpu import native
        from sug_tpu.data.datasets import resolve_data_root

        if native.is_available():
            root = resolve_data_root(cfg.get("DATA_ROOT"))
            nds = native.NativePointCloudDataset(
                os.path.join(root, args.source, "train_pts.npy"),
                os.path.join(root, args.source, "train_label.npy"),
                num_points=num_points,
                fixed_x_rotation=(args.source != "modelnet" and model_name == "DGCNN"),
                seed=seed,
            )
            train_iter = native.NativeBatchIterator(
                nds, batch_size, shuffle=True, seed=seed
            )
            logger.info("Using the native C++ data loader")
        else:
            logger.info("SUG_NATIVE_LOADER requested but library unavailable")

    for epoch in range(start_epoch, max_epoch_num):
        since_e = time.time()
        lr = cosine_lr(LR, epoch, max_epoch_num)
        writer.add_scalar("lr", lr, epoch)
        if hasattr(train_iter, "set_epoch"):
            train_iter.set_epoch(epoch)

        # metrics stay on-device during the hot loop (no per-step sync)
        pending, n_seen = [], 0
        t_epoch = time.perf_counter()
        for batch_idx, (data, label) in enumerate(train_iter):
            rng_key, k = jax.random.split(rng_key)
            state, metrics = trainer.train_step(state, data, label, k, lr)
            pending.append((data.shape[0], metrics["loss"]))
            n_seen += data.shape[0]
        jax.tree.leaves(state.params)[0].block_until_ready()
        epoch_sec = time.perf_counter() - t_epoch
        losses = jax.device_get([l for _, l in pending])  # one batched fetch
        loss_total = sum(float(l) * bs for (bs, _), l in zip(pending, losses))
        logger.info(
            "Train:{} [{} /{}  loss: {:.4f}]  throughput: {:.0f} clouds/sec".format(
                epoch, n_seen, len(train_dataset),
                loss_total / max(n_seen, 1), n_seen / max(epoch_sec, 1e-9),
            )
        )
        writer.add_scalar("loss/train", loss_total / max(n_seen, 1), epoch)
        writer.add_scalar("perf/clouds_per_sec", n_seen / max(epoch_sec, 1e-9), epoch)

        for name, dataset in eval_sets.items():
            loader = BatchIterator(dataset, batch_size, shuffle=False, drop_last=False)
            result = eval_worker(
                {
                    "evaluator": evaluator,
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "dataloader": loader,
                    "dataset": name,
                    "dataset_name": dataset_remapping[name],
                    "epoch": epoch,
                    "best_target_acc": best_test_acc[name][1],
                    "best_target_acc_epoch": best_test_acc[name][0],
                    "cls_eval": True,
                },
                logger,
            )
            best_test_acc[name][1] = result["best_target_acc"]
            best_test_acc[name][0] = result["best_target_acc_epoch"]
            tag = f"acc/{name}_{dataset_remapping[name]}"
            writer.add_scalar(tag + "_best_acc", result["best_target_acc"], epoch)
            writer.add_scalar(tag + "_cur_acc", result["cur_target_acc"], epoch)

        trained_epoch = epoch + 1
        if trained_epoch % args.ckpt_save_interval == 0:
            path = save_checkpoint(
                ckpt_dir, args.source, trained_epoch, state,
                max_ckpt_save_num=args.max_ckpt_save_num,
            )
            logger.info(f"Save current ckpt to {path}")

        dt = time.time() - since_e
        logger.info(
            "The {} epoch takes {:.0f}m {:.0f}s".format(epoch, dt // 60, dt % 60)
        )

    wait_for_saves()  # flush any in-flight async checkpoint write
    writer.close()
    return best_test_acc
