from .checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    load_torch_state_dict,
    save_checkpoint,
)
from .history import TrainingHistory
from .logger import Logger
from .memory import device_memory_stats, format_memory_stats, peak_hbm_gb
from .metrics import MetricHandler

__all__ = [
    "device_memory_stats",
    "format_memory_stats",
    "peak_hbm_gb",
    "checkpoint_exists",
    "load_checkpoint",
    "load_torch_state_dict",
    "save_checkpoint",
    "TrainingHistory",
    "Logger",
    "MetricHandler",
]
