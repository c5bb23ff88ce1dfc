"""Data layer tests: transforms semantics, datasets (reference on-disk
layouts), loader batching/padding/reproducibility, and prepare_dataloaders
mode dispatch.
"""

import numpy as np
import pytest

from vit_ssl_tpu.config import Config
from vit_ssl_tpu.data import (
    CIFAR10Dataset,
    DataLoader,
    STL10Dataset,
    STL10DINODataset,
    STL10UnsupervisedDataset,
    build_pipeline,
    prepare_dataloaders,
)
from vit_ssl_tpu.data.transforms import (
    ColorJitter,
    Compose,
    GaussianBlur,
    RandomGrayscale,
    RandomHorizontalFlip,
    RandomResizedCrop,
    Resize,
    ToTensor,
)

from make_synthetic_data import make


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return make(str(tmp_path_factory.mktemp("synth")), n=24, size=64, num_classes=3)


def _rng():
    return np.random.default_rng(0)


def test_resize_int_is_shorter_side():
    img = np.zeros((40, 80, 3), dtype=np.uint8)
    out = Resize(20)(img, _rng())
    assert out.shape == (20, 40, 3)


def test_resize_pair_exact():
    img = np.zeros((40, 80, 3), dtype=np.uint8)
    out = Resize([32, 32])(img, _rng())
    assert out.shape == (32, 32, 3)


def test_to_tensor_range_and_layout():
    img = (np.arange(48).reshape(4, 4, 3) * 5).astype(np.uint8)
    out = ToTensor()(img, _rng())
    assert out.dtype == np.float32
    assert out.shape == (4, 4, 3)  # HWC (NHWC framework layout)
    assert out.max() <= 1.0 and out.min() >= 0.0


def test_random_resized_crop_output_size():
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    out = RandomResizedCrop(32, scale=(0.5, 1.0))(img, _rng())
    assert out.shape == (32, 32, 3)


def test_horizontal_flip_deterministic_rng():
    img = np.random.default_rng(0).integers(0, 255, (8, 8, 3), dtype=np.uint8)
    t = RandomHorizontalFlip(p=1.0)
    out = t(img, _rng())
    np.testing.assert_array_equal(out, img[:, ::-1])


def test_color_jitter_stays_uint8():
    img = np.random.default_rng(0).integers(0, 255, (16, 16, 3), dtype=np.uint8)
    out = ColorJitter(0.4, 0.4, 0.2, 0.1)(img, _rng())
    assert out.dtype == np.uint8
    assert out.shape == img.shape


def test_grayscale_all_channels_equal():
    img = np.random.default_rng(0).integers(0, 255, (8, 8, 3), dtype=np.uint8)
    out = RandomGrayscale(p=1.0)(img, _rng())
    np.testing.assert_array_equal(out[..., 0], out[..., 1])
    np.testing.assert_array_equal(out[..., 1], out[..., 2])


def test_gaussian_blur_smooths():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    out = GaussianBlur(7, sigma=(2.0, 2.0))(img, _rng())
    assert out.shape == img.shape
    assert out.astype(np.float32).std() < img.astype(np.float32).std()


def test_build_pipeline_from_config_entries():
    pipeline = build_pipeline(
        [
            {"name": "Resize", "params": {"size": [32, 32]}},
            {"name": "ToTensor"},
        ]
    )
    img = np.zeros((64, 48, 3), dtype=np.uint8)
    out = pipeline(img, _rng())
    assert out.shape == (32, 32, 3) and out.dtype == np.float32


def test_unknown_transform_raises():
    with pytest.raises(ValueError, match="Unknown transform"):
        build_pipeline([{"name": "NotATransform"}])


# --- datasets -------------------------------------------------------------

def _tensor_pipeline(size=32):
    return Compose([Resize([size, size]), ToTensor()])


def test_stl10_dataset(data_root):
    ds = STL10Dataset(
        f"{data_root}/train_labels.json", f"{data_root}/train_images", _tensor_pipeline()
    )
    assert len(ds) == 24
    img, label = ds.__getitem__(0, _rng())
    assert img.shape == (32, 32, 3)
    assert 0 <= label < 3
    assert len(ds.classes) == 3


def test_cifar10_dataset(data_root):
    ds = CIFAR10Dataset(
        f"{data_root}/cifar_labels.csv", f"{data_root}/cifar_images", _tensor_pipeline()
    )
    assert len(ds) == 24
    img, label = ds.__getitem__(3, _rng())
    assert img.shape == (32, 32, 3)
    assert isinstance(label, int) and 0 <= label < 3


def test_unsupervised_dataset(data_root):
    ds = STL10UnsupervisedDataset(f"{data_root}/unlabeled_images", _tensor_pipeline())
    assert len(ds) == 24
    img = ds.__getitem__(0, _rng())
    assert img.shape == (32, 32, 3)


def test_dino_dataset_views(data_root):
    transforms = {
        "globals": Compose([RandomResizedCrop(32, scale=(0.5, 1.0)), ToTensor()]),
        "locals": Compose([RandomResizedCrop(16, scale=(0.08, 0.4)), ToTensor()]),
    }
    ds = STL10DINODataset(
        f"{data_root}/unlabeled_images",
        transforms=transforms,
        num_all_views=6,
        num_global_views=2,
    )
    views = ds.__getitem__(0, _rng())
    assert len(views) == 6
    assert views[0].shape == (32, 32, 3)
    assert views[1].shape == (32, 32, 3)
    for v in views[2:]:
        assert v.shape == (16, 16, 3)
    assert ds.num_global_views == 2


# --- loader ---------------------------------------------------------------

def test_loader_pads_last_batch(data_root):
    ds = STL10Dataset(
        f"{data_root}/train_labels.json", f"{data_root}/train_images", _tensor_pipeline()
    )
    loader = DataLoader(ds, batch_size=10, shuffle=False, num_workers=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["image"].shape == (10, 32, 32, 3)
    np.testing.assert_array_equal(batches[-1]["weight"], [1, 1, 1, 1] + [0] * 6)
    assert batches[0]["weight"].sum() == 10


def test_loader_shuffle_reproducible(data_root):
    ds = STL10Dataset(
        f"{data_root}/train_labels.json", f"{data_root}/train_images", _tensor_pipeline()
    )
    l1 = DataLoader(ds, batch_size=8, shuffle=True, seed=7, num_workers=0)
    l2 = DataLoader(ds, batch_size=8, shuffle=True, seed=7, num_workers=0)
    l1.set_epoch(3)
    l2.set_epoch(3)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["label"], b2["label"])
    np.testing.assert_allclose(b1["image"], b2["image"])
    l2.set_epoch(4)
    b3 = next(iter(l2))
    assert not np.array_equal(b1["label"], b3["label"])


def test_loader_workers_match_sync(data_root):
    ds = STL10Dataset(
        f"{data_root}/train_labels.json", f"{data_root}/train_images", _tensor_pipeline()
    )
    sync = list(DataLoader(ds, batch_size=8, shuffle=True, seed=1, num_workers=0))
    threaded = list(DataLoader(ds, batch_size=8, shuffle=True, seed=1, num_workers=4))
    assert len(sync) == len(threaded)
    for a, b in zip(sync, threaded):
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_allclose(a["image"], b["image"])


def test_loader_multicrop_collation(data_root):
    transforms = {
        "globals": Compose([RandomResizedCrop(32, scale=(0.5, 1.0)), ToTensor()]),
        "locals": Compose([RandomResizedCrop(16, scale=(0.08, 0.4)), ToTensor()]),
    }
    ds = STL10DINODataset(
        f"{data_root}/unlabeled_images", transforms, num_all_views=4, num_global_views=2
    )
    loader = DataLoader(ds, batch_size=6, shuffle=False, num_workers=2)
    batch = next(iter(loader))
    assert len(batch["views"]) == 4
    assert batch["views"][0].shape == (6, 32, 32, 3)
    assert batch["views"][3].shape == (6, 16, 16, 3)


# --- prepare_dataloaders --------------------------------------------------

def _supervised_config(data_root):
    return Config(
        {
            "data": {
                "dataset_name": "stl10",
                "data_csv": f"{data_root}/train_labels.json",
                "data_dir": f"{data_root}/train_images",
                "val_split": 0.25,
                "num_workers": 0,
                "img_size": 32,
            },
            "training": {"random_seed": 0, "batch_size": 8},
        }
    )


def test_prepare_dataloaders_supervised(data_root):
    transforms = {"train": _tensor_pipeline(), "val": _tensor_pipeline()}
    train_loader, val_loader = prepare_dataloaders(
        _supervised_config(data_root), transforms, "supervised"
    )
    assert len(train_loader.dataset) == 18
    assert len(val_loader.dataset) == 6
    batch = next(iter(train_loader))
    assert batch["image"].shape == (8, 32, 32, 3)


def test_prepare_dataloaders_split_disjoint(data_root):
    transforms = {"train": _tensor_pipeline(), "val": _tensor_pipeline()}
    train_loader, val_loader = prepare_dataloaders(
        _supervised_config(data_root), transforms, "supervised"
    )
    train_idx = set(train_loader.dataset.indices)
    val_idx = set(val_loader.dataset.indices)
    assert not (train_idx & val_idx)
    assert len(train_idx | val_idx) == 24


def test_label_range_preflight(data_root):
    """A labeled dataset with more classes than model.num_classes must
    fail at startup (out-of-range labels silently NaN the optax CE),
    while an oversized head only warns."""
    from vit_ssl_tpu.config.schemas import ConfigValidationError

    transforms = {"train": _tensor_pipeline(), "val": _tensor_pipeline()}
    cfg = _supervised_config(data_root)  # data_root has 3 classes

    cfg["model"] = {"num_classes": 2}
    with pytest.raises(ConfigValidationError, match="num_classes"):
        prepare_dataloaders(cfg, transforms, "supervised")

    cfg["model"] = {"num_classes": 3}
    train_loader, _ = prepare_dataloaders(cfg, transforms, "supervised")
    assert len(train_loader.dataset) == 18

    cfg["model"] = {"num_classes": 6}  # oversized head: allowed, warns
    train_loader, _ = prepare_dataloaders(cfg, transforms, "supervised")
    assert len(train_loader.dataset) == 18


def test_prepare_dataloaders_dino(data_root):
    cfg = Config(
        {
            "data": {
                "dataset_name": "stl10",
                "data_dir": f"{data_root}/unlabeled_images",
                "val_split": 0.2,
                "num_workers": 0,
                "img_size": 32,
            },
            "training": {
                "random_seed": 0,
                "batch_size": 4,
                "num_all_views": 4,
                "num_global_views": 2,
            },
        }
    )
    transforms = {
        "globals": Compose([RandomResizedCrop(32, scale=(0.5, 1.0)), ToTensor()]),
        "locals": Compose([RandomResizedCrop(16, scale=(0.08, 0.4)), ToTensor()]),
    }
    train_loader, val_loader = prepare_dataloaders(cfg, transforms, "dino")
    assert train_loader.dataset.num_global_views == 2
    assert val_loader.dataset.num_global_views == 2
    batch = next(iter(train_loader))
    assert len(batch["views"]) == 4


def test_imagefolder_dataset(tmp_path):
    import os

    from PIL import Image

    from vit_ssl_tpu.data.datasets import ImageFolderDataset

    for cls in ["cat", "dog"]:
        os.makedirs(tmp_path / cls)
        for i in range(3):
            Image.fromarray(
                np.full((16, 16, 3), 100 if cls == "cat" else 200, np.uint8)
            ).save(tmp_path / cls / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path), _tensor_pipeline(16))
    assert len(ds) == 6
    assert ds.classes == ["cat", "dog"]
    img, label = ds.__getitem__(0, _rng())
    assert img.shape == (16, 16, 3)
    assert label in (0, 1)


def test_loader_uint8_passthrough(data_root):
    from vit_ssl_tpu.data.transforms import Compose, Resize

    ds = STL10UnsupervisedDataset(
        f"{data_root}/unlabeled_images", Compose([Resize([16, 16])])
    )
    batch = next(iter(DataLoader(ds, batch_size=4, num_workers=0)))
    assert batch["image"].dtype == np.uint8  # device-augment contract


def test_decode_cache_hits(data_root, monkeypatch):
    import vit_ssl_tpu.data.datasets as ds_mod

    calls = {"n": 0}
    real = ds_mod._load_image

    def counting(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(ds_mod, "_load_image", counting)
    ds = ds_mod.STL10UnsupervisedDataset(
        f"{data_root}/unlabeled_images", _tensor_pipeline(16), cache=True
    )
    ds.__getitem__(0, _rng())
    ds.__getitem__(0, _rng())
    ds.__getitem__(1, _rng())
    assert calls["n"] == 2  # second access to index 0 served from cache


def test_native_batch_decoder_matches_python_path(data_root):
    from vit_ssl_tpu.data import native
    from vit_ssl_tpu.data.transforms import Compose, Resize

    if not native.available():
        pytest.skip("native decoder not built")
    ds = STL10UnsupervisedDataset(
        f"{data_root}/unlabeled_images", Compose([Resize([32, 32])]),
        native_decode=True,
    )
    batch_native = ds.native_batch([0, 1, 2])
    assert batch_native is not None and len(batch_native) == 3
    for i, arr in enumerate(batch_native):
        assert arr.shape == (32, 32, 3) and arr.dtype == np.uint8
        py = ds.__getitem__(i, _rng())
        # same decode + resize maths (both cv2), bit-identical
        np.testing.assert_array_equal(arr, py)


def test_native_loader_end_to_end(data_root):
    from vit_ssl_tpu.data import native
    from vit_ssl_tpu.data.transforms import Compose, Resize

    if not native.available():
        pytest.skip("native decoder not built")
    ds = STL10UnsupervisedDataset(
        f"{data_root}/unlabeled_images", Compose([Resize([16, 16])]),
        native_decode=True,
    )
    loader = DataLoader(ds, batch_size=8, shuffle=False, num_workers=2)
    batch = next(iter(loader))
    assert batch["image"].dtype == np.uint8
    assert batch["image"].shape == (8, 16, 16, 3)


class TestDecodeCache:
    """Epoch-over-epoch sample cache (VERDICT r1 item 10): with a
    deterministic host pipeline, epoch >= 2 pays neither decode nor
    transform."""

    def _dataset(self, tmp_path, cache):
        import cv2
        import numpy as np

        from vit_ssl_tpu.data.datasets import STL10UnsupervisedDataset
        from vit_ssl_tpu.data.transforms import Compose, Resize

        rs = np.random.RandomState(0)
        for i in range(6):
            cv2.imwrite(str(tmp_path / f"img_{i}.png"),
                        (rs.rand(48, 48, 3) * 255).astype(np.uint8))
        return STL10UnsupervisedDataset(
            str(tmp_path), transform=Compose([Resize([32, 32])]), cache=cache
        )

    def test_epoch2_hits_cache(self, tmp_path, monkeypatch):
        import vit_ssl_tpu.data.datasets as ds_mod

        ds = self._dataset(tmp_path, cache=True)
        calls = {"decode": 0}
        real = ds_mod._load_image

        def counting(path):
            calls["decode"] += 1
            return real(path)

        monkeypatch.setattr(ds_mod, "_load_image", counting)
        first = [ds[i] for i in range(len(ds))]
        assert calls["decode"] == len(ds)
        second = [ds[i] for i in range(len(ds))]
        assert calls["decode"] == len(ds)  # zero new decodes in epoch 2
        for a, b in zip(first, second):
            import numpy as np

            np.testing.assert_array_equal(a, b)
        # post-transform shape cached (resize not re-run)
        assert first[0].shape == (32, 32, 3)

    def test_random_pipeline_not_sample_cached(self, tmp_path):
        import numpy as np

        from vit_ssl_tpu.data.datasets import STL10UnsupervisedDataset
        from vit_ssl_tpu.data.transforms import Compose, RandomHorizontalFlip, Resize

        ds = self._dataset(tmp_path, cache=True)
        ds.transform = Compose([Resize([32, 32]), RandomHorizontalFlip()])
        r1 = ds.__getitem__(0, np.random.default_rng(1))
        r2 = ds.__getitem__(0, np.random.default_rng(2))
        # different rng streams may flip differently — the cache must NOT
        # freeze the first epoch's random outcome
        r3 = ds.__getitem__(0, np.random.default_rng(1))
        np.testing.assert_array_equal(r1, r3)
        assert r1.shape == r2.shape

    def test_is_deterministic_predicate(self):
        from vit_ssl_tpu.data.transforms import (
            Compose, GaussianBlur, Normalize, RandomResizedCrop, Resize,
            ToTensor, is_deterministic,
        )

        assert is_deterministic(Compose([Resize([8, 8]), ToTensor()]))
        assert is_deterministic(Compose([Resize([8, 8]), Normalize([0.5]*3, [0.5]*3)]))
        assert not is_deterministic(Compose([RandomResizedCrop(8)]))
        assert not is_deterministic(Compose([Resize([8, 8]), GaussianBlur(3)]))
        assert is_deterministic(None)
