"""Device-side augmentation tests: shape/range contracts, HSV round trip,
statistical agreement with the host (cv2/numpy) pipeline, and the fused
multi-crop generator used by the DINO step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ssl_tpu.data.device_augment import (
    build_device_pipeline,
    color_jitter,
    gaussian_blur,
    hsv_to_rgb,
    make_multicrop_fn,
    random_grayscale,
    random_hflip,
    random_resized_crop,
    rgb_to_hsv,
    supports_pipeline,
)


def _img(h=32, w=32, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).rand(h, w, 3).astype(np.float32)
    )


def test_hsv_roundtrip():
    img = _img()
    back = hsv_to_rgb(rgb_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


def test_random_resized_crop_shape_and_range():
    out = random_resized_crop(jax.random.PRNGKey(0), _img(), 16, (0.5, 1.0))
    assert out.shape == (16, 16, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_random_resized_crop_full_scale_is_resize():
    img = _img()
    out = random_resized_crop(jax.random.PRNGKey(0), img, 32, (1.0, 1.0), ratio=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=0.05)


def test_hflip():
    img = _img()
    flipped = random_hflip(jax.random.PRNGKey(0), img, p=1.0)
    np.testing.assert_array_equal(np.asarray(flipped), np.asarray(img)[:, ::-1])
    same = random_hflip(jax.random.PRNGKey(0), img, p=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(img))


def test_grayscale_channels_equal():
    out = random_grayscale(jax.random.PRNGKey(0), _img(), p=1.0)
    out = np.asarray(out)
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)


def test_gaussian_blur_smooths():
    img = _img()
    out = gaussian_blur(jax.random.PRNGKey(0), img, 7, (2.0, 2.0))
    assert float(jnp.std(out)) < float(jnp.std(img))
    assert out.shape == img.shape


def test_color_jitter_range_and_variety():
    img = _img()
    outs = [
        np.asarray(color_jitter(jax.random.PRNGKey(i), img, 0.4, 0.4, 0.2, 0.1))
        for i in range(4)
    ]
    for o in outs:
        assert o.min() >= 0.0 and o.max() <= 1.0
    assert not np.allclose(outs[0], outs[1])


def test_brightness_statistics_match_host():
    """Mean brightness factor over many draws ≈ 1 (both implementations
    sample U(1-b, 1+b))."""
    img = _img()
    base = float(img.mean())
    means = [
        float(color_jitter(jax.random.PRNGKey(i), img, 0.4, 0, 0, 0).mean())
        for i in range(64)
    ]
    assert abs(np.mean(means) / base - 1.0) < 0.08


def test_supports_pipeline():
    assert supports_pipeline(
        [{"name": "RandomResizedCrop", "params": {"size": 16}}, {"name": "ToTensor"}]
    )
    assert not supports_pipeline([{"name": "SomethingElse"}])


def test_build_pipeline_from_dino_config():
    seq = [
        {"name": "RandomResizedCrop", "params": {"size": 16, "scale": [0.5, 1.0]}},
        {"name": "RandomHorizontalFlip", "params": {}},
        {"name": "ColorJitter", "params": {"brightness": 0.4, "contrast": 0.4, "saturation": 0.2, "hue": 0.1}},
        {"name": "RandomGrayscale", "params": {"p": 0.2}},
        {"name": "GaussianBlur", "params": {"kernel_size": 7, "sigma": [0.1, 2.0]}},
        {"name": "ToTensor"},
    ]
    fn = build_device_pipeline(seq)
    out = fn(jax.random.PRNGKey(0), _img())
    assert out.shape == (16, 16, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_multicrop_fn_shapes_and_dtype():
    globals_seq = [{"name": "RandomResizedCrop", "params": {"size": 32, "scale": [0.5, 1.0]}}]
    locals_seq = [{"name": "RandomResizedCrop", "params": {"size": 16, "scale": [0.08, 0.4]}}]
    fn = jax.jit(make_multicrop_fn(globals_seq, locals_seq, 2, 4))
    images = jnp.asarray(
        (np.random.RandomState(0).rand(6, 32, 32, 3) * 255).astype(np.uint8)
    )
    views = fn(jax.random.PRNGKey(0), images)
    assert len(views) == 4
    assert views[0].shape == (6, 32, 32, 3) and views[0].dtype == jnp.float32
    assert views[3].shape == (6, 16, 16, 3)
    # views differ (different rng streams)
    assert not np.allclose(np.asarray(views[0]), np.asarray(views[1]))
    # uint8 input correctly scaled to [0, 1]
    assert float(views[0].max()) <= 1.0


def test_multicrop_views_vary_per_sample():
    globals_seq = [{"name": "RandomResizedCrop", "params": {"size": 16, "scale": [0.3, 0.6]}}]
    fn = make_multicrop_fn(globals_seq, globals_seq, 1, 2)
    images = jnp.broadcast_to(_img(32, 32), (4, 32, 32, 3))
    views = fn(jax.random.PRNGKey(0), images)
    v = np.asarray(views[0])
    # same source image, but per-sample rng → different crops
    assert not np.allclose(v[0], v[1])
