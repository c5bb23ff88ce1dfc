"""Dataloader construction — `prepare_dataloaders` parity.

Mirrors `/root/reference/data/data_builder.py:15-151`: mode-keyed dataset
dispatch (including eval modes), seeded train/val split by
``data.val_split``, re-attaching ``num_global_views`` onto subsets, and
train-only shuffling. Supervised train/val get separate transform
pipelines; SimMIM/DINO share one dataset object for train and val
(`data_builder.py:34-61`).
"""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import numpy as np

from ..config import is_list
from .datasets import (
    CIFAR10Dataset,
    ImageFolderDataset,
    STL10Dataset,
    STL10DINODataset,
    STL10UnsupervisedDataset,
    Subset,
)
from .loader import DataLoader

logger = logging.getLogger(__name__)


def _get_dataset(config, mode: str, transforms: Dict):
    section = config.get("eval", {}) if "eval" in mode else config.get("data", {})
    dataset_name = str(
        section.get("dataset_name", config.get("data", {}).get("dataset_name", ""))
    ).lower()
    data_dir = section.get("data_dir", config.get("data", {}).get("data_dir"))
    data_csv = section.get("data_csv", config.get("data", {}).get("data_csv"))

    device_augment = "eval" not in mode and bool(
        config.get("data", {}).get("device_augment", False)
    )
    cache = bool(config.get("data", {}).get("cache_decoded", False))
    native_decode = bool(config.get("data", {}).get("native_decode", False))

    def _raw_pipeline():
        # host does decode + resize only; augmentation happens on device
        from .transforms import Compose, Resize

        img = int(config["data"]["img_size"])
        return Compose([Resize([img, img])])

    if mode in ["supervised", "finetune", "eval_knn", "eval_linear", "eval_umap"]:
        train_t = _raw_pipeline() if device_augment else transforms["train"]
        val_t = transforms["val"] if not device_augment else _raw_pipeline()
        if dataset_name == "cifar10":
            return (
                CIFAR10Dataset(data_csv, data_dir, transform=train_t, cache=cache),
                CIFAR10Dataset(data_csv, data_dir, transform=val_t, cache=cache),
            )
        if dataset_name == "stl10":
            return (
                STL10Dataset(data_csv, data_dir, transform=train_t, cache=cache),
                STL10Dataset(data_csv, data_dir, transform=val_t, cache=cache),
            )
        if dataset_name in ("imagefolder", "imagenet"):
            return (
                ImageFolderDataset(data_dir, transform=train_t),
                ImageFolderDataset(data_dir, transform=val_t),
            )
        raise ValueError(f"Unknown supervised/labeled dataset: {dataset_name}")

    if mode == "simmim":
        if dataset_name == "stl10":
            train_t = _raw_pipeline() if device_augment else transforms["train"]
            dataset = STL10UnsupervisedDataset(
                data_dir, transform=train_t, cache=cache,
                native_decode=native_decode,
            )
            return dataset, dataset
        raise ValueError(f"Unknown unsupervised dataset: {dataset_name}")

    if mode in ["dino", "eval_dino"]:
        if dataset_name == "stl10":
            if mode == "dino" and bool(
                config.get("data", {}).get("device_augment", False)
            ):
                # device-side augmentation: host only decodes (and resizes
                # to the base size); all views are generated on chip inside
                # the train step, uint8 over the wire
                from .transforms import Compose, Resize

                img = int(config["data"]["img_size"])
                base = Compose([Resize([img, img])])
                dataset = STL10UnsupervisedDataset(
                    data_dir, transform=base, cache=cache,
                    native_decode=native_decode,
                )
                dataset.num_global_views = int(config.training.num_global_views)
                return dataset, dataset
            dataset = STL10DINODataset(
                data_dir,
                transforms=transforms,
                num_all_views=config.training.num_all_views,
                num_global_views=config.training.num_global_views,
            )
            return dataset, dataset
        raise ValueError(f"Unknown DINO dataset: {dataset_name}")

    raise ValueError(f"Unknown mode for dataset creation: {mode}")


def _check_label_range(config, mode: str, dataset) -> None:
    """Fail at startup when the labeled dataset has more classes than the
    model head. Out-of-range integer labels make
    ``optax.softmax_cross_entropy_with_integer_labels`` return NaN
    *silently* (torch's CE would assert on device), so a class-count
    mismatch otherwise surfaces as an inexplicable ``Loss=nan`` with
    healthy-looking accuracy. TPU-native addition — the reference has no
    startup check (`/root/reference/data/data_builder.py:15-151`)."""
    if mode not in ("supervised", "finetune"):
        return
    classes = getattr(dataset, "classes", None)
    num_classes = config.get("model", {}).get("num_classes", None)
    if classes is None or num_classes is None:
        return
    n_data, n_model = len(classes), int(num_classes)
    if n_data > n_model:
        from ..config.schemas import ConfigValidationError

        raise ConfigValidationError(
            f"Dataset at '{config.get('data', {}).get('data_dir')}' has "
            f"{n_data} classes {sorted(map(str, classes))[:8]} but "
            f"model.num_classes={n_model}; labels >= {n_model} would make "
            "the cross-entropy loss silently NaN. Set model.num_classes="
            f"{n_data} or point data.data_csv at a {n_model}-class index."
        )
    if n_data < n_model:
        logger.warning(
            "Dataset has %d classes but model.num_classes=%d — the extra "
            "head outputs will never receive positive labels.",
            n_data, n_model,
        )


def prepare_dataloaders(config, transforms, mode) -> Tuple[DataLoader, DataLoader]:
    """Single entry point for train/eval dataloaders (`data_builder.py:70`)."""
    if is_list(mode):
        data_loading_mode = mode[0]
        logger.info("Multiple evaluation modes detected: %s", mode)
    else:
        data_loading_mode = str(mode).lower()
    if "eval" in data_loading_mode:
        # eval_* modes read eval.data_dir/eval.data_csv (reference
        # convention), falling back to data.* — surface the resolved path
        # so a shadowed data.* override is visible
        resolved = config.get("eval", {}).get(
            "data_dir", config.get("data", {}).get("data_dir")
        )
        logger.info(
            "Preparing dataloaders for mode: '%s' (eval.data_dir -> %s)",
            data_loading_mode, resolved,
        )
    else:
        logger.info("Preparing dataloaders for mode: '%s'", data_loading_mode)

    train_full, val_full = _get_dataset(config, data_loading_mode, transforms)
    _check_label_range(config, data_loading_mode, train_full)

    total = len(train_full)
    val_split = float(config.data.val_split)
    if val_split <= 0 or val_split >= 1:
        train_size, val_size = total, 0
    else:
        val_size = int(total * val_split)
        train_size = total - val_size

    seed = int(config.training.random_seed) if "training" in config else 0

    if val_size > 0:
        perm = np.random.default_rng(seed).permutation(total)
        train_dataset = Subset(train_full, perm[:train_size])
        val_dataset = Subset(val_full, perm[train_size:])
    else:
        train_dataset, val_dataset = train_full, None

    batch_size = config.get("training", {}).get(
        "batch_size", config.get("eval", {}).get("batch_size")
    )
    num_workers = int(config.data.num_workers)

    # multi-host: every process builds the same datasets/seeds but loads
    # only its interleaved slice of each global batch
    process_shard = None
    import jax

    if jax.process_count() > 1:
        process_shard = (jax.process_index(), jax.process_count())
        logger.info(
            "Multi-host data sharding: process %d/%d loads %d of every "
            "%d-sample global batch",
            process_shard[0], process_shard[1],
            int(batch_size) // process_shard[1], batch_size,
        )

    train_loader = DataLoader(
        train_dataset,
        batch_size=batch_size,
        shuffle=True,
        num_workers=num_workers,
        seed=seed,
        prefetch_factor=2,
        process_shard=process_shard,
    )
    val_loader = None
    if val_dataset is not None:
        val_loader = DataLoader(
            val_dataset,
            batch_size=batch_size,
            shuffle=False,
            num_workers=num_workers,
            seed=seed,
            prefetch_factor=2,
            process_shard=process_shard,
        )
    return train_loader, val_loader
