"""Training harness: optimizer groups, jitted train step, checkpointing."""
from .optim import (
    expon_lr_schedule,
    group_label_tree,
    make_optimizer,
    staged_decay_schedule,
    zero_scene_moments,
)
from .loop import TrainState, densify_step, init_train_state, train_step
from .checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "expon_lr_schedule",
    "group_label_tree",
    "make_optimizer",
    "staged_decay_schedule",
    "zero_scene_moments",
    "TrainState",
    "densify_step",
    "init_train_state",
    "train_step",
    "load_checkpoint",
    "save_checkpoint",
]
