from sug_tpu.engine.optim import (
    ThreeGroupOptimizer,
    cosine_lr,
    dis_lr_schedule,
    param_group_masks,
)
from sug_tpu.engine.dg_trainer import DGTrainer, make_criterion
from sug_tpu.engine.source_trainer import SourceTrainer
from sug_tpu.engine.alternating_trainer import AlternatingTrainer
from sug_tpu.engine.evaluation import eval_worker, Evaluator
from sug_tpu.engine.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint,
    wait_for_saves,
)

__all__ = [
    "ThreeGroupOptimizer",
    "cosine_lr",
    "dis_lr_schedule",
    "param_group_masks",
    "DGTrainer",
    "make_criterion",
    "SourceTrainer",
    "AlternatingTrainer",
    "eval_worker",
    "Evaluator",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
    "wait_for_saves",
]
