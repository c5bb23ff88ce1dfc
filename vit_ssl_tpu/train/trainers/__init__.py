from .base import BaseTrainer
from .dino import DINOTrainer
from .simmim import SimMIMTrainer
from .supervised import SupervisedTrainer

__all__ = ["BaseTrainer", "DINOTrainer", "SimMIMTrainer", "SupervisedTrainer"]
