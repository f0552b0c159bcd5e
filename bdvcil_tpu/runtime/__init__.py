from .train_state import TrainState
from .steps import (
    make_train_step,
    make_multi_train_step,
    make_eval_step,
    make_multi_eval_step,
)
from .loops import train_epochs, run_inference
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "TrainState",
    "make_train_step",
    "make_multi_train_step",
    "make_eval_step",
    "make_multi_eval_step",
    "train_epochs",
    "run_inference",
    "save_checkpoint",
    "load_checkpoint",
]
