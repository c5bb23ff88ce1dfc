"""Patch embedders (convolutional, manual-unfold, dynamic).

Parity with `/root/reference/vit_core/patch_embedding.py`:

- :class:`ConvPatchEmbed` — Conv(k=stride=patch) tokenizer + learnable CLS
  token + learnable positional embedding of length (H/p)²+1 (`:65-96`);
- :class:`ManualPatchEmbed` — unfold+Linear alternative with the same CLS /
  pos-embed scheme (`:99-128`);
- :class:`DynamicPatchEmbed` — conv tokenizer that bicubically interpolates
  positional embeddings for variable input sizes (`:11-63`), which is what
  lets DINO's 96px global and 48px local crops share one backbone.

Images are NHWC throughout (TPU-native layout; the reference is NCHW).
``extract_patches`` flattens each patch in torch-unfold (C, ph, pw) channel
order so SimMIM pixel targets and imported ``projection.weight`` matrices
line up bit-for-bit with the reference.

Note: the reference initialises CLS/pos-embed with ``torch.rand`` (uniform
[0,1)) — kept under ``init_scheme="reference"``; ``"tpu"`` uses
truncated-normal (SURVEY.md §7 quirk list).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .initializers import InitScheme
from .precision import resolve_precision


def extract_patches(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, C·p·p) with torch-unfold channel ordering."""
    b, h, w, c = x.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = x.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, gh, gw, C, p, p)
    return x.reshape(b, gh * gw, c * p * p)


def patches_to_image(patches: jnp.ndarray, image_hw: Tuple[int, int], patch_size: int, channels: int) -> jnp.ndarray:
    """Inverse of :func:`extract_patches` — (B, N, C·p·p) -> (B, H, W, C)."""
    b, n, _ = patches.shape
    p = patch_size
    gh, gw = image_hw[0] // p, image_hw[1] // p
    x = patches.reshape(b, gh, gw, channels, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, gh, p, gw, p, C)
    return x.reshape(b, gh * p, gw * p, channels)


def _check_divisible(h: int, w: int, patch_size: int) -> None:
    if h % patch_size != 0 or w % patch_size != 0:
        raise ValueError(
            f"Image dimensions H={h}, W={w} must be divisible by "
            f"patch_size={patch_size}"
        )


class ConvPatchEmbed(nn.Module):
    """Conv2d-based patch embedder with CLS token and learned pos-embed."""

    input_shape: Tuple[int, int, int]  # (C, H, W) — reference convention
    embed_dim: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    init_scheme: str = "reference"
    matmul_precision: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c, h, w = self.input_shape
        _check_divisible(h, w, self.patch_size)
        init = InitScheme(self.init_scheme)
        num_patches = (h // self.patch_size) ** 2

        conv = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=resolve_precision(self.matmul_precision),
            kernel_init=init.conv_kernel(),
            bias_init=init.conv_bias(self.patch_size, c),
            name="conv",
        )
        cls_token = self.param(
            "cls_token", init.cls_token(), (1, 1, self.embed_dim), self.param_dtype
        )
        pos_embed = self.param(
            "positional_embedding",
            init.pos_embed(),
            (1, num_patches + 1, self.embed_dim),
            self.param_dtype,
        )

        b = x.shape[0]
        tokens = conv(x.astype(self.dtype))  # (B, gh, gw, D)
        tokens = tokens.reshape(b, -1, self.embed_dim)
        cls = jnp.broadcast_to(
            cls_token.astype(self.dtype), (b, 1, self.embed_dim)
        )
        tokens = jnp.concatenate([cls, tokens], axis=1)
        return tokens + pos_embed.astype(self.dtype)


class ManualPatchEmbed(nn.Module):
    """Unfold + Linear patch embedder (same CLS / pos-embed scheme)."""

    input_shape: Tuple[int, int, int]
    embed_dim: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    init_scheme: str = "reference"
    matmul_precision: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c, h, w = self.input_shape
        _check_divisible(h, w, self.patch_size)
        init = InitScheme(self.init_scheme)
        num_patches = (h // self.patch_size) ** 2
        patch_dim = c * self.patch_size**2

        linear = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=resolve_precision(self.matmul_precision),
            kernel_init=init.linear_kernel(),
            bias_init=init.linear_bias(patch_dim),
            name="linear",
        )
        cls_token = self.param(
            "cls_token", init.cls_token(), (1, 1, self.embed_dim), self.param_dtype
        )
        pos_embed = self.param(
            "positional_embedding",
            init.pos_embed(),
            (1, num_patches + 1, self.embed_dim),
            self.param_dtype,
        )

        b = x.shape[0]
        patches = extract_patches(x.astype(self.dtype), self.patch_size)
        tokens = linear(patches)
        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, self.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        return tokens + pos_embed.astype(self.dtype)


class DynamicPatchEmbed(nn.Module):
    """Patch embedder for variable input sizes via pos-embed interpolation.

    The pos-embed grid is stored at ``input_shape`` resolution and
    bicubically resized (``jax.image.resize``) when the incoming patch grid
    differs — the mechanism behind DINO multi-crop
    (`/root/reference/vit_core/patch_embedding.py:26-48`).
    """

    input_shape: Tuple[int, int, int]
    embed_dim: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    init_scheme: str = "reference"
    matmul_precision: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c, h0, w0 = self.input_shape
        b, h, w, _ = x.shape
        _check_divisible(h, w, self.patch_size)
        init = InitScheme(self.init_scheme)
        grid = (h0 // self.patch_size, w0 // self.patch_size)
        num_patches = grid[0] * grid[1]

        proj = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=resolve_precision(self.matmul_precision),
            kernel_init=init.conv_kernel(),
            bias_init=init.conv_bias(self.patch_size, c),
            name="proj",
        )
        cls_token = self.param(
            "cls_token", init.cls_token(), (1, 1, self.embed_dim), self.param_dtype
        )
        pos_embed = self.param(
            "positional_embedding",
            init.pos_embed(),
            (1, num_patches + 1, self.embed_dim),
            self.param_dtype,
        )

        tokens = proj(x.astype(self.dtype))  # (B, gh, gw, D)
        gh, gw = tokens.shape[1], tokens.shape[2]
        tokens = tokens.reshape(b, gh * gw, self.embed_dim)

        pe = self._interpolate_pos_encoding(pos_embed, grid, gh, gw)
        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, self.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        return tokens + pe.astype(self.dtype)

    def _interpolate_pos_encoding(self, pos_embed, grid, gh: int, gw: int):
        num_patches = grid[0] * grid[1]
        if gh * gw == num_patches and gh == gw:
            return pos_embed
        cls_pe = pos_embed[:, :1]
        patch_pe = pos_embed[:, 1:].reshape(1, grid[0], grid[1], self.embed_dim)
        patch_pe = jax.image.resize(
            patch_pe, (1, gh, gw, self.embed_dim), method="bicubic"
        )
        patch_pe = patch_pe.reshape(1, gh * gw, self.embed_dim)
        return jnp.concatenate([cls_pe, patch_pe], axis=1)
