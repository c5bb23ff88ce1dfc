"""Device-side (jitted) image augmentation.

The TPU-native input pipeline the north star prescribes: the host only
decodes images and ships one uint8 array per batch; random resized crops,
flips, colour jitter, grayscale, and gaussian blur all run on device as
part of the compiled train step. At DINO's config this cuts per-batch
host→HBM traffic ~12× (one (B, 96, 96, 3) uint8 tensor instead of six
fp32 view tensors) and turns a host-bound pipeline into a compute-bound
one (this machine has a single CPU core).

Semantics follow torchvision's ops (the reference's pipeline,
`/root/reference/configs/dino/globals.yaml`) with two documented
divergences chosen for XLA-compatible static control flow:

- RandomResizedCrop clamps the sampled crop box into the image instead of
  torchvision's 10-attempt rejection loop (same support, slightly
  different distribution near the scale extremes);
- ColorJitter applies brightness→contrast→saturation→hue in fixed order
  with random factors (torchvision also randomises the op order).

Every op is a pure function of a PRNG key and vmapped over the batch, so
the whole pipeline fuses into the training program.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# colour-space helpers (tf.image-style HSV round trip)
# ---------------------------------------------------------------------------


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    safe_delta = jnp.where(delta > 0, delta, 1.0)
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)

    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _grayscale(img: jnp.ndarray) -> jnp.ndarray:
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


# ---------------------------------------------------------------------------
# per-sample ops (image: (H, W, C) float32 in [0, 1])
# ---------------------------------------------------------------------------


def random_resized_crop(rng, img, out_size: int, scale: Tuple[float, float],
                        ratio: Tuple[float, float] = (3 / 4, 4 / 3)):
    h, w = img.shape[0], img.shape[1]
    k_area, k_ratio, k_top, k_left = jax.random.split(rng, 4)
    area = h * w * jax.random.uniform(k_area, minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        k_ratio, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, w)
    ch = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, h)
    top = jax.random.uniform(k_top) * (h - ch)
    left = jax.random.uniform(k_left) * (w - cw)

    # crop+resize in one pass: out[y, x] samples img at
    # (top + y·ch/out, left + x·cw/out)
    sy = ch / out_size
    sx = cw / out_size
    out = jax.image.scale_and_translate(
        img,
        (out_size, out_size, img.shape[2]),
        spatial_dims=(0, 1),
        scale=jnp.array([1.0 / sy, 1.0 / sx]),
        translation=jnp.array([-top / sy, -left / sx]),
        method="linear",
    )
    return jnp.clip(out, 0.0, 1.0)


def random_hflip(rng, img, p: float = 0.5):
    return jnp.where(jax.random.uniform(rng) < p, img[:, ::-1, :], img)


def color_jitter(rng, img, brightness=0.4, contrast=0.4, saturation=0.2, hue=0.1):
    kb, kc, ks, kh = jax.random.split(rng, 4)
    if brightness:
        f = jax.random.uniform(kb, minval=max(0.0, 1 - brightness), maxval=1 + brightness)
        img = img * f
    if contrast:
        f = jax.random.uniform(kc, minval=max(0.0, 1 - contrast), maxval=1 + contrast)
        mean = _grayscale(jnp.clip(img, 0, 1)).mean()
        img = f * img + (1.0 - f) * mean
    if saturation:
        f = jax.random.uniform(ks, minval=max(0.0, 1 - saturation), maxval=1 + saturation)
        gray = _grayscale(jnp.clip(img, 0, 1))[..., None]
        img = f * img + (1.0 - f) * gray
    if hue:
        f = jax.random.uniform(kh, minval=-hue, maxval=hue)
        hsv = rgb_to_hsv(jnp.clip(img, 0, 1))
        hsv = hsv.at[..., 0].set((hsv[..., 0] + f) % 1.0)
        img = hsv_to_rgb(hsv)
    return jnp.clip(img, 0.0, 1.0)


def random_grayscale(rng, img, p: float = 0.2):
    gray = _grayscale(img)[..., None]
    gray3 = jnp.broadcast_to(gray, img.shape)
    return jnp.where(jax.random.uniform(rng) < p, gray3, img)


def gaussian_blur(rng, img, kernel_size: int = 7, sigma=(0.1, 2.0)):
    k = kernel_size | 1
    s = jax.random.uniform(rng, minval=sigma[0], maxval=sigma[1])
    half = (k - 1) / 2.0
    coords = jnp.arange(k, dtype=jnp.float32) - half
    g = jnp.exp(-(coords**2) / (2.0 * s**2))
    g = g / g.sum()
    # separable depthwise blur
    c = img.shape[-1]
    x = img[None]  # (1, H, W, C)
    kern_h = jnp.broadcast_to(g[:, None, None, None], (k, 1, 1, c))
    kern_w = jnp.broadcast_to(g[None, :, None, None], (1, k, 1, c))
    x = jax.lax.conv_general_dilated(
        x, kern_h, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x, kern_w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return x[0]


def resize(img, out_size: int):
    return jax.image.resize(
        img, (out_size, out_size, img.shape[-1]), method="linear"
    )


# ---------------------------------------------------------------------------
# pipeline construction from config transform lists
# ---------------------------------------------------------------------------

_SUPPORTED = {
    "RandomResizedCrop",
    "RandomHorizontalFlip",
    "ColorJitter",
    "RandomGrayscale",
    "GaussianBlur",
    "Resize",
    "ToTensor",
    "Normalize",
}


def supports_pipeline(sequence) -> bool:
    return all(entry["name"] in _SUPPORTED for entry in sequence)


def build_device_pipeline(sequence) -> Callable:
    """Compile a config transform list into ``fn(rng, img) -> img`` for one
    sample; ToTensor is implicit (inputs arrive as float [0,1])."""
    ops: List[Callable] = []
    for entry in sequence:
        name = entry["name"]
        params = dict(entry.get("params") or {})
        if name == "RandomResizedCrop":
            size = int(params["size"])
            scale = tuple(params.get("scale", (0.08, 1.0)))
            ratio = tuple(params.get("ratio", (3 / 4, 4 / 3)))
            ops.append(
                functools.partial(
                    random_resized_crop, out_size=size, scale=scale, ratio=ratio
                )
            )
        elif name == "RandomHorizontalFlip":
            ops.append(functools.partial(random_hflip, p=float(params.get("p", 0.5))))
        elif name == "ColorJitter":
            ops.append(
                functools.partial(
                    color_jitter,
                    brightness=float(params.get("brightness", 0.0)),
                    contrast=float(params.get("contrast", 0.0)),
                    saturation=float(params.get("saturation", 0.0)),
                    hue=float(params.get("hue", 0.0)),
                )
            )
        elif name == "RandomGrayscale":
            ops.append(functools.partial(random_grayscale, p=float(params.get("p", 0.1))))
        elif name == "GaussianBlur":
            ks = params.get("kernel_size", 7)
            ks = int(ks[0]) if isinstance(ks, (list, tuple)) else int(ks)
            sg = params.get("sigma", (0.1, 2.0))
            sg = (float(sg), float(sg)) if not isinstance(sg, (list, tuple)) else tuple(sg)
            ops.append(functools.partial(gaussian_blur, kernel_size=ks, sigma=sg))
        elif name == "Resize":
            size = params.get("size")
            size = int(size[0]) if isinstance(size, (list, tuple)) else int(size)

            def _resize(rng, img, out_size=size):
                del rng
                return resize(img, out_size)

            ops.append(_resize)
        elif name in ("ToTensor", "Normalize"):
            if name == "Normalize":
                mean = jnp.asarray(params["mean"], jnp.float32)
                std = jnp.asarray(params["std"], jnp.float32)

                def _norm(rng, img, mean=mean, std=std):
                    del rng
                    return (img - mean) / std

                ops.append(_norm)
        else:  # pragma: no cover
            raise ValueError(f"Unsupported device transform '{name}'")

    def sample_fn(rng, img):
        keys = jax.random.split(rng, max(len(ops), 1))
        for op, key in zip(ops, keys):
            img = op(key, img)
        return img

    return sample_fn


def make_multicrop_fn(
    globals_seq: Sequence[Dict],
    locals_seq: Sequence[Dict],
    num_global_views: int,
    num_all_views: int,
) -> Callable:
    """Batched multi-crop view generator: ``fn(rng, images) -> tuple`` where
    images is (B, H, W, C) uint8/float and the output is ``num_all_views``
    view tensors (globals first), matching the loader's multi-crop contract.
    """
    g_fn = build_device_pipeline(globals_seq)
    l_fn = build_device_pipeline(locals_seq)
    num_local = num_all_views - num_global_views

    def fn(rng, images):
        imgs = images.astype(jnp.float32)
        if images.dtype == jnp.uint8:
            imgs = imgs / 255.0
        b = imgs.shape[0]
        keys = jax.random.split(rng, num_all_views)
        views = []
        for v in range(num_global_views):
            per_sample = jax.random.split(keys[v], b)
            views.append(jax.vmap(g_fn)(per_sample, imgs))
        for v in range(num_local):
            per_sample = jax.random.split(keys[num_global_views + v], b)
            views.append(jax.vmap(l_fn)(per_sample, imgs))
        return tuple(views)

    return fn


def make_batch_augment_fn(sequence: Sequence[Dict]) -> Callable:
    """Batched single-view pipeline: ``fn(rng, images) -> images``."""
    sample_fn = build_device_pipeline(sequence)

    def fn(rng, images):
        imgs = images.astype(jnp.float32)
        if images.dtype == jnp.uint8:
            imgs = imgs / 255.0
        per_sample = jax.random.split(rng, imgs.shape[0])
        return jax.vmap(sample_fn)(per_sample, imgs)

    return fn
