"""Training: state, jitted step functions, epoch loop, checkpointing, metrics."""

from .checkpoint import CheckpointManager, load_config_from_dir
from .loop import EvalDriver, Trainer, make_eval_fn, make_step_fns
from .metrics import MeanMeter, MetricWriter, TimeMeter
from .state import TrainState, create_train_state, make_lr_schedule, make_optimizer

__all__ = [
    "CheckpointManager",
    "EvalDriver",
    "make_eval_fn",
    "MeanMeter",
    "MetricWriter",
    "TimeMeter",
    "Trainer",
    "TrainState",
    "create_train_state",
    "load_config_from_dir",
    "make_lr_schedule",
    "make_optimizer",
    "make_step_fns",
]
