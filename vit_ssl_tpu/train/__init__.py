from .schedules import lr_schedule_from_config, reference_lr_schedule
from .state import TrainState, create_train_state, make_optimizer
from .steps import (
    make_criterion,
    make_dino_steps,
    make_inference_fn,
    make_simmim_steps,
    make_supervised_steps,
)
from .trainers import BaseTrainer, DINOTrainer, SimMIMTrainer, SupervisedTrainer

__all__ = [
    "lr_schedule_from_config",
    "reference_lr_schedule",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_criterion",
    "make_dino_steps",
    "make_inference_fn",
    "make_simmim_steps",
    "make_supervised_steps",
    "BaseTrainer",
    "DINOTrainer",
    "SimMIMTrainer",
    "SupervisedTrainer",
]
