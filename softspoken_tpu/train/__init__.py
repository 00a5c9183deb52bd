from . import augment, targets
from .loop import (
    TrainState,
    create_train_state,
    loss_fn,
    make_sharded_train_step,
    make_train_step,
)

__all__ = [
    "augment",
    "targets",
    "TrainState",
    "create_train_state",
    "loss_fn",
    "make_train_step",
    "make_sharded_train_step",
]
