from .checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    load_torch_state_dict,
    save_checkpoint,
)
from .history import TrainingHistory
from .logger import Logger
from .metrics import MetricHandler

__all__ = [
    "checkpoint_exists",
    "load_checkpoint",
    "load_torch_state_dict",
    "save_checkpoint",
    "TrainingHistory",
    "Logger",
    "MetricHandler",
]
