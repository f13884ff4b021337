from dpfx.train.loss import elbo_loss
from dpfx.train.trainer import (
    CheckpointManager,
    Trainer,
    TrainState,
    init_state,
    make_eval_step,
    make_optimizer,
    make_resident_multi_step,
    make_schedule,
    make_train_step,
    restore_for_eval,
)

__all__ = [
    "make_resident_multi_step",
    "elbo_loss",
    "CheckpointManager",
    "Trainer",
    "TrainState",
    "init_state",
    "make_eval_step",
    "make_optimizer",
    "make_schedule",
    "make_train_step",
    "restore_for_eval",
]
