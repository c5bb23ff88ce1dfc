from .dino import (
    DINOHead,
    DINONetwork,
    ViTBackbone,
    WeightNormDense,
    cosine_momentum_schedule,
    dino_loss,
    momentum_update,
    teacher_temp_schedule,
    update_center,
)
from .simmim import SimMIMViT, make_random_mask, masked_l1_loss
from .vit import ViT

__all__ = [
    "DINOHead",
    "DINONetwork",
    "ViTBackbone",
    "WeightNormDense",
    "cosine_momentum_schedule",
    "dino_loss",
    "momentum_update",
    "teacher_temp_schedule",
    "update_center",
    "SimMIMViT",
    "make_random_mask",
    "masked_l1_loss",
    "ViT",
]
