"""Dataset classes.

Parity with `/root/reference/data/datasets.py`: CSV-indexed CIFAR10 folder,
JSON-indexed STL10 folder, sorted-glob unlabeled STL10, and the DINO
multi-crop dataset that materialises ``num_global_views`` global crops plus
``num_all_views - num_global_views`` local crops per image through the
'globals'/'locals' transform pipelines.

Datasets return numpy arrays (HWC float32 after ToTensor) and plain int
labels — the loader stacks them into NHWC batches.
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Dict, List, Optional

import cv2
import numpy as np
import pandas as pd


class Dataset:
    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int):
        raise NotImplementedError


def _load_image(path: str) -> np.ndarray:
    """Decode to RGB uint8 HWC via OpenCV's native (C++) decoders — ~2-4x
    faster than PIL on this single-CPU host; PIL fallback for exotic
    formats."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:  # pragma: no cover - corrupt/unsupported file
        from PIL import Image

        with Image.open(path) as pil:
            return np.asarray(pil.convert("RGB"))
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class _DecodeCache:
    """Optional in-memory decoded-sample cache (uint8 HWC arrays).

    With device-side augmentation the per-sample host work is just
    decode+resize, which repeats identically every epoch; caching removes
    it entirely after epoch 1. When the dataset's transform pipeline is
    deterministic (`transforms.is_deterministic` — the device-augment
    contract), the *post-transform* sample is cached, so epoch ≥ 2 pays
    neither decode nor resize and holds only img_size-bytes per sample.
    Random pipelines fall back to caching the raw decode. Enable with
    ``data.cache_decoded: true`` (budget: uint8 bytes — STL10 unlabeled
    resized to 96px is ~1.3 GB)."""

    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self._store: Dict[str, np.ndarray] = {}

    def load(self, path: str) -> np.ndarray:
        if not self.enabled:
            return _load_image(path)
        hit = self._store.get(path)
        if hit is None:
            hit = _load_image(path)
            self._store[path] = hit
        return hit

    def load_transformed(self, path: str, transform, rng):
        """Decode + transform with the sample cached at the latest
        deterministic stage."""
        if not self.enabled:
            image = _load_image(path)
            return transform(image, rng) if transform else image
        from .transforms import is_deterministic

        if transform is None or not is_deterministic(transform):
            image = self.load(path)
            return transform(image, rng) if transform else image
        hit = self._store.get(path)
        if hit is None:
            hit = transform(_load_image(path), rng)
            self._store[path] = hit
        return hit


class CIFAR10Dataset(Dataset):
    """CSV-indexed PNG folder (`datasets.py:11-32`): column 0 is the file
    stem, column 1 the class name; labels are indices into the sorted class
    list."""

    def __init__(self, csv_file: str, root_dir: str, transform: Optional[Callable] = None,
                 cache: bool = False):
        self.data = pd.read_csv(csv_file)
        self.root_dir = root_dir
        self.transform = transform
        self._cache = _DecodeCache(cache)
        self.classes = sorted(self.data.iloc[:, 1].unique().tolist())
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx, rng: Optional[np.random.Generator] = None):
        name = str(self.data.iloc[idx, 0])
        image = self._cache.load_transformed(
            os.path.join(self.root_dir, f"{name}.png"), self.transform, rng
        )
        label = self.class_to_idx[self.data.iloc[idx, 1]]
        return image, label


class STL10Dataset(Dataset):
    """JSON-indexed labeled folder (`datasets.py:35-58`)."""

    def __init__(self, json_file: str, root_dir: str, transform: Optional[Callable] = None,
                 cache: bool = False):
        self.data = pd.read_json(json_file)
        self.root_dir = root_dir
        self.transform = transform
        self._cache = _DecodeCache(cache)
        self.classes = sorted(self.data.iloc[:, 1].unique().tolist())
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx, rng: Optional[np.random.Generator] = None):
        name = str(self.data.iloc[idx, 0]).split("/")[-1]
        image = self._cache.load_transformed(
            os.path.join(self.root_dir, name), self.transform, rng
        )
        label = self.class_to_idx[self.data.iloc[idx, 1]]
        return image, label


class STL10UnsupervisedDataset(Dataset):
    """Sorted glob of ``*.png``, image-only (`datasets.py:61-77`)."""

    def __init__(self, root_dir: str, transform: Optional[Callable] = None,
                 cache: bool = False, native_decode: bool = False):
        self.root_dir = root_dir
        self.transform = transform
        self.files = sorted(glob.glob(f"{root_dir}/*.png"))
        self._cache = _DecodeCache(cache)
        self.native_decode = native_decode

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx, rng: Optional[np.random.Generator] = None):
        return self._cache.load_transformed(self.files[idx], self.transform, rng)

    def _native_size(self):
        """(h, w) when the pipeline is decode+Resize only (the device-
        augment contract), else None — gates the C++ batch fast-path."""
        from .transforms import Compose, Resize

        t = self.transform
        if isinstance(t, Compose) and len(t.transforms) == 1:
            t = t.transforms[0]
        if isinstance(t, Resize) and isinstance(t.size, (list, tuple)):
            return int(t.size[0]), int(t.size[1])
        return None

    def native_batch(self, indices):
        """Decode+resize a whole batch in one C++ call (csrc/fastloader).
        Returns a list of uint8 HWC arrays, or None to use the per-sample
        python path (library missing, unsupported pipeline, cache on, or
        any file failed to decode)."""
        if not self.native_decode or self._cache.enabled:
            # opt-in (data.native_decode): measured neutral on a 1-core
            # host where cv2-python already releases the GIL; wins when
            # multiple cores can decode one batch in parallel. The cache
            # path is faster than either after epoch 1.
            return None
        size = self._native_size()
        if size is None:
            return None
        from .native import decode_batch

        result = decode_batch([self.files[int(i)] for i in indices], *size)
        if result is None:
            return None
        out, ok = result
        if not ok.all():
            return None
        return list(out)


class STL10DINODataset(Dataset):
    """Multi-crop dataset (`datasets.py:80-123`): per item, returns a list
    of ``num_all_views`` view arrays — globals first, then locals."""

    def __init__(
        self,
        root_dir: str,
        transforms: Optional[Dict[str, Callable]] = None,
        num_all_views: Optional[int] = None,
        num_global_views: Optional[int] = None,
    ):
        self.root_dir = root_dir
        self.transforms = transforms
        self.files = sorted(glob.glob(f"{root_dir}/*.png"))
        self.num_all_views = num_all_views
        self._num_global_views = num_global_views
        self._cache = _DecodeCache(False)

    @property
    def num_global_views(self) -> int:
        return self._num_global_views

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx, rng: Optional[np.random.Generator] = None) -> List[np.ndarray]:
        arr = self._cache.load(self.files[idx])
        views = [
            self.transforms["globals"](arr, rng) for _ in range(self.num_global_views)
        ]
        num_local = self.num_all_views - self.num_global_views
        views.extend(self.transforms["locals"](arr, rng) for _ in range(num_local))
        return views


class ImageFolderDataset(Dataset):
    """Class-per-subdirectory layout (ImageNet-style), labeled:

        <root>/<class_name>/*.{png,jpg,jpeg}

    Extension beyond the reference's dataset zoo for the ViT-B/ImageNet
    stretch config (BASELINE.json config 5)."""

    EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")

    def __init__(self, root_dir: str, transform: Optional[Callable] = None):
        self.root_dir = root_dir
        self.transform = transform
        self.classes = sorted(
            d for d in os.listdir(root_dir)
            if os.path.isdir(os.path.join(root_dir, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: List = []
        for cls in self.classes:
            cls_dir = os.path.join(root_dir, cls)
            for name in sorted(os.listdir(cls_dir)):
                if name.lower().endswith(self.EXTENSIONS):
                    self.samples.append((os.path.join(cls_dir, name), self.class_to_idx[cls]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx, rng: Optional[np.random.Generator] = None):
        path, label = self.samples[idx]
        image = _load_image(path)
        if self.transform:
            image = self.transform(image, rng)
        return image, label


class Subset(Dataset):
    """Index-restricted view of a dataset (torch.utils.data.Subset parity,
    used by the seeded train/val split in `data_builder.py:107-118`)."""

    def __init__(self, dataset: Dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)
        if hasattr(dataset, "num_global_views"):
            self.num_global_views = dataset.num_global_views
        if hasattr(dataset, "classes"):
            self.classes = dataset.classes

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx, rng: Optional[np.random.Generator] = None):
        return self.dataset.__getitem__(self.indices[idx], rng)

    def native_batch(self, indices):
        inner = getattr(self.dataset, "native_batch", None)
        if inner is None:
            return None
        return inner([self.indices[int(i)] for i in indices])
