"""Training: the single configurable trainer replacing the reference's 111
copy-paste experiment scripts, plus training-control utilities."""

from .monitoring import EarlyStopping, early_stopping
from .schedulers import (
    NoamSchedule,
    ReduceLROnPlateau,
    noam_opt,
    polynomial_decay_lambda,
)
from .losses import bce_loss, multitask_bce_ce_loss, polyphony_targets
from .trainer import Trainer, TrainConfig, TrainState

__all__ = [
    "EarlyStopping",
    "early_stopping",
    "NoamSchedule",
    "ReduceLROnPlateau",
    "noam_opt",
    "polynomial_decay_lambda",
    "bce_loss",
    "multitask_bce_ce_loss",
    "polyphony_targets",
    "Trainer",
    "TrainConfig",
    "TrainState",
]
