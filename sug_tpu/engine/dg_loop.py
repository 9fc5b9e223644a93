"""Full SUG DG training loop — the engine behind train_dg_single_gpu.py and
(with a mesh) the working replacement for the reference's broken DDP trainer
train_dg.py.

Mirrors the reference epoch structure (train_dg_single_gpu.py:207-399):
per-epoch LR schedules, the sin ramp GRL constant, PURE_CLS_EPOCH gating,
paired source/target-split batches, per-epoch eval on source + 2 unseen
datasets with best-acc tracking, checkpoint rotation.
"""

from __future__ import annotations

import contextlib
import datetime
import math
import os
import time
from typing import Dict, List

import jax
import numpy as np

from sug_tpu.data import (
    BatchIterator,
    ClassBalancedBatchIterator,
    create_single_dataset,
    create_splitted_dataset,
    DATASET_LIST,
)
from sug_tpu.engine.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    wait_for_saves,
)
from sug_tpu.engine.dg_trainer import DGTrainer, make_criterion
from sug_tpu.engine.evaluation import Evaluator, eval_worker
from sug_tpu.engine.optim import cosine_lr, dis_lr_schedule
from sug_tpu.parallel.mesh import batch_sharding, make_mesh
from sug_tpu.utils.config import log_config_to_file
from sug_tpu.utils.logging import MetricsWriter, create_logger, exp_log_folder_creator
from sug_tpu.utils.profiling import trace


def _make_train_iter(dataset, cfg, batch_size, seed):
    """batch_size is the PER-PROCESS batch; under multi-host each process
    iterates its rank's disjoint slice of the shared epoch permutation."""
    class_balance = bool(
        cfg.get("METHODS", {}).get("CLASS_BALANCE", False)
        or cfg.get("CLASS_BALANCE", False)
    )

    # C++ batch assembly + prefetch thread (sug_tpu/native) — the default on
    # this 1-core host whenever the library is built; SUG_NATIVE_LOADER=0
    # opts out. Single-process only: the native iterator has no rank slicing
    # (multi-host keeps the Python iterators' shared-permutation semantics).
    if (
        os.environ.get("SUG_NATIVE_LOADER", "1") != "0"
        and jax.process_count() == 1
    ):
        from sug_tpu import native

        if native.is_available():
            nds = native.NativePointCloudDataset.from_arrays(
                dataset.pts, dataset.labels
            )
            return native.NativeBatchIterator(
                nds, batch_size, shuffle=True, class_balance=class_balance,
                class_per_batch=10, seed=seed,
            )

    kwargs = dict(
        batch_size=batch_size,
        seed=seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    if class_balance:
        return ClassBalancedBatchIterator(dataset, class_per_batch=10, **kwargs)
    return BatchIterator(dataset, shuffle=True, **kwargs)


def run_dg_training(args, cfg, num_points: int = 1024):
    from sug_tpu.utils.config import resolve_seed

    seed = resolve_seed(args, cfg)
    np.random.seed(seed)

    mesh = None
    num_devices = args.num_devices or 1
    if num_devices > 1 or args.launcher not in ("none",) or jax.process_count() > 1:
        mesh = make_mesh(args.num_devices)
        num_devices = mesh.devices.size
    n_proc = jax.process_count()
    batch_size = args.batch_size * max(1, num_devices)  # global batch
    assert batch_size % n_proc == 0, (
        f"global batch {batch_size} not divisible by {n_proc} processes"
    )
    local_batch = batch_size // n_proc  # per-host slice fed by this process

    output_dir, ckpt_dir = exp_log_folder_creator(cfg, extra_tag=args.source)
    log_name = "log_train_dg%s.txt" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    logger = create_logger(log_file=os.path.join(output_dir, log_name))
    writer = MetricsWriter(os.path.join(output_dir, "tensorboard"))

    logger.info("**********************Start logging**********************")
    for key, val in vars(args).items():
        logger.info("{:16} {}".format(key, val))
    log_config_to_file(cfg, logger=logger)
    logger.info(f"The source domain is set to: {args.source}")

    test_datasets = [d for d in DATASET_LIST if d != args.source]
    logger.info(f"The datasets used for testing: {test_datasets}")
    model_name = cfg.get("Model", "Pointnet")
    # None -> reference auto rule (-pi/2 on non-modelnet under DGCNN)
    fixed_rot = cfg.get("DATASET", {}).get("FIXED_X_ROTATION", None)

    # ------------------------------------------------------------- data
    split_config = cfg["DATASET_SPLITTER"]
    multi_spliter = isinstance(split_config, (list, tuple))
    source_train_iters: List = []
    target_train_iters: List = []
    split_configs = list(split_config) if multi_spliter else [split_config]
    source_train_dataset = None
    for sc in split_configs:
        subsets = create_splitted_dataset(
            dataset_type=args.source, status="train", logger=logger, config=sc,
            model=model_name, data_root=cfg.get("DATA_ROOT"),
            fixed_x_rotation=fixed_rot,
        )
        src = subsets[sc["TRAIN_BASE"]]
        tgt = subsets[1 - sc["TRAIN_BASE"]]
        if source_train_dataset is None:
            source_train_dataset = src
        logger.info(
            f"Num of source train: {len(src)}, Num of target train: {len(tgt)}"
        )
        source_train_iters.append(_make_train_iter(src, cfg, local_batch, seed))
        target_train_iters.append(_make_train_iter(tgt, cfg, local_batch, seed + 1))
    from sug_tpu.native import NativeBatchIterator as _NBI

    if source_train_iters and isinstance(source_train_iters[0], _NBI):
        logger.info("Using the native C++ data loader (SUG_NATIVE_LOADER=0 disables)")

    eval_sets = {
        "source": create_single_dataset(
            args.source, "test", model=model_name, data_root=cfg.get("DATA_ROOT"),
            fixed_x_rotation=fixed_rot,
        ),
        "test1": create_single_dataset(
            test_datasets[0], "test", model=model_name, data_root=cfg.get("DATA_ROOT"),
            fixed_x_rotation=fixed_rot,
        ),
        "test2": create_single_dataset(
            test_datasets[-1], "test", model=model_name, data_root=cfg.get("DATA_ROOT"),
            fixed_x_rotation=fixed_rot,
        ),
    }
    dataset_remapping = {
        "source": args.source, "test1": test_datasets[0], "test2": test_datasets[1]
    }
    logger.info(f"batch_size: {batch_size}")

    if model_name == "KPConv" and source_train_dataset is not None:
        # startup neighbor-capacity calibration guard (the reference
        # calibrates at model build, model/KPConv_model.py:848-880)
        from sug_tpu.models.kpconv import check_neighbor_occupancy

        check_neighbor_occupancy(
            source_train_dataset.pts, cfg.get("MODEL_CFG", None), logger=logger
        )

    # ------------------------------------------------------------ model
    opt_cfg = cfg["OPTIMIZATION"]
    criterion = make_criterion(opt_cfg, source_train_dataset, cfg["DATASET"]["NUM_CLASS"])
    trainer = DGTrainer(
        cfg,
        model_name=model_name,
        num_class=cfg["DATASET"]["NUM_CLASS"],
        criterion=criterion,
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
        # warm-start from model weights only (the reference accepts
        # --pretrained_model but no trainer ever loads it, SURVEY.md §5)
        restored = restore_checkpoint(args.pretrained_model, state)
        state = state.replace(
            params=restored["state"].params,
            batch_stats=restored["state"].batch_stats,
        )
        logger.info(f"Warm-started weights from {args.pretrained_model}")

    def eval_apply(params, batch_stats, data):
        out = trainer.model.apply(
            {"params": params, "batch_stats": batch_stats}, data, False
        )
        return (out["logits1"] + out["logits2"]) / 2.0

    from sug_tpu.parallel.mesh import replicated_sharding

    evaluator = Evaluator(
        eval_apply,
        num_class=cfg["DATASET"]["NUM_CLASS"],
        criterion=criterion,
        sharding=replicated_sharding(mesh) if (mesh is not None and n_proc > 1) else None,
    )

    max_epoch_num = opt_cfg["NUM_EPOCHES"]
    LR = float(opt_cfg["LR"])
    scaler = float(opt_cfg["LR_SCALER"])
    pure_cls_epoch = int(cfg["METHODS"].get("PURE_CLS_EPOCH", 0))
    mmd_weight = float(cfg["METHODS"].get("MMD_WEIGHT", 0.0))
    cls_eval = bool(opt_cfg.get("CLS_EVAL", True))

    best_test_acc: Dict[str, List] = {k: [0, 0.0] for k in eval_sets}
    rng_key = jax.random.key(seed)

    # preemption-aware checkpointing: SIGTERM/SIGINT requests a save at the
    # next epoch boundary (TPU-pod preemptions send SIGTERM; the reference
    # had no recovery story — SURVEY.md §5 failure detection)
    import signal

    preempted = {"flag": False}

    def _on_signal(signum, frame):
        preempted["flag"] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except ValueError:
            pass  # not the main thread

    for epoch in range(start_epoch, max_epoch_num):
        since_e = time.time()
        lr_g = cosine_lr(LR, epoch, max_epoch_num)
        lr_c = lr_g
        lr_dis = dis_lr_schedule(LR, scaler, epoch)
        writer.add_scalar("lr_g", lr_g, epoch)
        writer.add_scalar("lr_c", lr_c, epoch)
        writer.add_scalar("lr_dis", lr_dis, epoch)
        cons = math.sin((epoch + 1) / max_epoch_num * math.pi / 2)
        mmd_on = (epoch >= pure_cls_epoch) and (mmd_weight > 0)

        idx = epoch % len(source_train_iters)
        src_iter, tgt_iter = source_train_iters[idx], target_train_iters[idx]
        # epoch-seeded shuffles, identical on every process (the reference's
        # sampler.set_epoch, train_dg.py:268-270)
        src_iter.set_epoch(epoch)
        tgt_iter.set_epoch(epoch)

        # Hot loop: metrics stay on-device (no per-step host sync — steps
        # pipeline behind async dispatch); they're pulled once per epoch.
        pending = []  # (batch_size, device-metrics dict)
        n_seen = 0
        t_epoch = time.perf_counter()
        epoch_trace = trace() if epoch == start_epoch else contextlib.nullcontext()
        from sug_tpu.data.sampler import prefetch_to_device

        def paired():
            for (ds_, ls_), (dt_, lt_) in zip(src_iter, tgt_iter):
                yield ds_, ls_, dt_, lt_

        batch_sh = batch_sharding(mesh) if mesh is not None else None
        put_fn = None
        if n_proc > 1:
            from sug_tpu.parallel.mesh import assemble_global_batch

            put_fn = lambda *arrs: assemble_global_batch(mesh, *arrs)  # noqa: E731
        with epoch_trace:
            for batch_idx, (ds_, ls_, dt_, lt_) in enumerate(
                prefetch_to_device(paired(), sharding=batch_sh, put_fn=put_fn)
            ):
                rng_key, step_key = jax.random.split(rng_key)
                state, metrics = trainer.train_step(
                    state, ds_, ls_, dt_, lt_, step_key, lr_g, lr_c, lr_dis,
                    grl_const=cons, mmd_on=mmd_on,
                )
                bs = ds_.shape[0]
                n_seen += bs
                pending.append((bs, metrics))
        jax.tree.leaves(state.params)[0].block_until_ready()
        epoch_sec = time.perf_counter() - t_epoch

        totals = {"loss_cls": 0.0, "loss_adv": 0.0, "loss_geo": 0.0, "loss_sem": 0.0}
        # single batched device->host transfer for all step metrics
        fetched = jax.device_get([m for _, m in pending])
        for (bs, _), metrics in zip(pending, fetched):
            for k in totals:
                if k in metrics:
                    totals[k] += float(metrics[k]) * bs
        if pending:
            logger.info(
                f"Train Epoch {epoch} [{n_seen}] loss_cls {totals['loss_cls'] / n_seen}"
            )
            if mmd_on:
                logger.info(
                    f"loss_adv: {totals['loss_adv'] / n_seen} "
                    f"loss_geo_mmd {totals['loss_geo'] / n_seen} "
                    f"loss_sem_mmd {totals['loss_sem'] / n_seen}"
                )

        denom = max(n_seen, 1)
        writer.add_scalar("loss/cls", totals["loss_cls"] / denom, epoch)
        writer.add_scalar("loss/adv", totals["loss_adv"] / denom, epoch)
        writer.add_scalar("loss/mmd_geo", totals["loss_geo"] / denom, epoch)
        writer.add_scalar("loss/mmd_sem", totals["loss_sem"] / denom, epoch)
        if n_seen and epoch_sec > 0:
            cps = 2 * n_seen / epoch_sec / max(num_devices, 1)
            ms = epoch_sec / max(len(pending), 1) * 1000.0
            writer.add_scalar("perf/clouds_per_sec_per_chip", cps, epoch)
            writer.add_scalar("perf/ms_per_step", ms, epoch)
            logger.info(f"throughput: {cps:.0f} clouds/sec/chip ({ms:.1f} ms/step)")

        # ------------------------------------------------------- evaluation
        prev_best_t1 = best_test_acc["test1"][1]
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
                    "cls_eval": cls_eval,
                },
                logger,
            )
            best_test_acc[name][1] = result["best_target_acc"]
            best_test_acc[name][0] = result["best_target_acc_epoch"]
            tag = f"acc/{name}_{dataset_remapping[name]}"
            writer.add_scalar(tag + "_best_acc", result["best_target_acc"], epoch)
            writer.add_scalar(tag + "_cur_acc", result["cur_target_acc"], epoch)

        # best-checkpoint export: keep a stable 'best' copy whenever the
        # primary transfer accuracy improves (the reference only rotates
        # periodic snapshots; its best model was never saved)
        if best_test_acc["test1"][1] > prev_best_t1:
            best_path = save_checkpoint(
                os.path.join(ckpt_dir, "best"), args.source, 0, state,
                extra={"best_acc": {k: v[1] for k, v in best_test_acc.items()},
                       "epoch": epoch},
                max_ckpt_save_num=1,
            )
            logger.info(f"New best test1 acc — exported {best_path}")

        trained_epoch = epoch + 1
        if trained_epoch % args.ckpt_save_interval == 0 or preempted["flag"]:
            path = save_checkpoint(
                ckpt_dir, args.source, trained_epoch, state,
                max_ckpt_save_num=args.max_ckpt_save_num,
            )
            logger.info(f"Save current ckpt to {path}")
        if preempted["flag"]:
            wait_for_saves()  # the process is about to exit: commit the write
            logger.info(
                "Preemption signal received — checkpoint saved, exiting "
                f"(resume with --resume {ckpt_dir}/...)"
            )
            break

        dt = time.time() - since_e
        logger.info(
            "The {} epoch takes {:.0f}m {:.0f}s".format(epoch, dt // 60, dt % 60)
        )
        logger.info("****************Finished One Epoch****************")

    wait_for_saves()  # flush any in-flight async checkpoint write
    writer.close()
    return best_test_acc
