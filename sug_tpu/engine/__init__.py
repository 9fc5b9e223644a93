from sug_tpu.engine.optim import (
    ThreeGroupOptimizer,
    cosine_lr,
    dis_lr_schedule,
    param_group_masks,
)
from sug_tpu.engine.dg_trainer import DGTrainer
from sug_tpu.engine.source_trainer import SourceTrainer
from sug_tpu.engine.evaluation import eval_worker, Evaluator

__all__ = [
    "ThreeGroupOptimizer",
    "cosine_lr",
    "dis_lr_schedule",
    "param_group_masks",
    "DGTrainer",
    "SourceTrainer",
    "eval_worker",
    "Evaluator",
]
