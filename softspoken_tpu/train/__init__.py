from . import augment, data, targets
from .fit import fit, fit_synthetic, list_wavs
from .loop import (
    TrainState,
    create_train_state,
    loss_fn,
    make_sharded_train_step,
    make_train_step,
)

__all__ = [
    "augment",
    "data",
    "targets",
    "fit",
    "fit_synthetic",
    "list_wavs",
    "TrainState",
    "create_train_state",
    "loss_fn",
    "make_train_step",
    "make_sharded_train_step",
]
