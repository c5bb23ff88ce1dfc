from .builder import prepare_dataloaders
from .datasets import (
    CIFAR10Dataset,
    Dataset,
    STL10Dataset,
    STL10DINODataset,
    STL10UnsupervisedDataset,
    Subset,
)
from .loader import DataLoader
from .transforms import (
    TRANSFORM_REGISTRY,
    Compose,
    build_pipeline,
    build_transform,
    get_transforms,
)

__all__ = [
    "prepare_dataloaders",
    "CIFAR10Dataset",
    "Dataset",
    "STL10Dataset",
    "STL10DINODataset",
    "STL10UnsupervisedDataset",
    "Subset",
    "DataLoader",
    "TRANSFORM_REGISTRY",
    "Compose",
    "build_pipeline",
    "build_transform",
    "get_transforms",
]
