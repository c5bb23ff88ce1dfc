"""Parameter initializers.

Two schemes, selectable via ``model.init_scheme``:

- ``"reference"`` (default): reproduces the PyTorch reference's effective
  init distributions so training dynamics match at config parity —
  ``nn.Linear``/``nn.Conv2d`` defaults (Kaiming-uniform weights with
  a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)), same-bound uniform
  bias) and the reference's uniform [0,1) CLS/positional embeddings
  (`/root/reference/vit_core/patch_embedding.py:85-88`) and standard-normal
  mask token (`/root/reference/vit_core/ssl/simmim/model.py:31`).
- ``"tpu"``: truncated-normal embeddings / LeCun-normal weights, the usual
  ViT-on-TPU choice (SURVEY.md §7 quirk list recommends offering this).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import random
from jax.nn import initializers as jinit


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on a flax (in, out) kernel."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_conv_kernel(key, shape, dtype=jnp.float32):
    """Torch Conv2d default on a flax (kh, kw, in, out) kernel."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = 1.0 / np.sqrt(fan_in)
    return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_conv_bias(kernel_hw: int, cin: int):
    fan_in = kernel_hw * kernel_hw * cin
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def uniform01(key, shape, dtype=jnp.float32):
    """torch.rand equivalent — the reference's CLS/pos-embed init."""
    return random.uniform(key, shape, dtype)


def normal01(key, shape, dtype=jnp.float32):
    """torch.randn equivalent — the reference's mask-token init."""
    return random.normal(key, shape, dtype)


class InitScheme:
    """Bundle of initializers for one scheme."""

    def __init__(self, name: str = "reference"):
        if name not in ("reference", "tpu"):
            raise ValueError(f"Unknown init scheme: {name}")
        self.name = name

    # linear / conv weights ------------------------------------------------
    def linear_kernel(self):
        if self.name == "reference":
            return torch_linear_kernel
        return jinit.lecun_normal()

    def linear_bias(self, fan_in: int):
        if self.name == "reference":
            return torch_linear_bias(fan_in)
        return jinit.zeros

    def conv_kernel(self):
        if self.name == "reference":
            return torch_conv_kernel
        return jinit.lecun_normal()

    def conv_bias(self, kernel_hw: int, cin: int):
        if self.name == "reference":
            return torch_conv_bias(kernel_hw, cin)
        return jinit.zeros

    # embeddings -----------------------------------------------------------
    def cls_token(self):
        if self.name == "reference":
            return uniform01
        return jinit.truncated_normal(stddev=0.02)

    def pos_embed(self):
        if self.name == "reference":
            return uniform01
        return jinit.truncated_normal(stddev=0.02)

    def mask_token(self):
        if self.name == "reference":
            return normal01
        return jinit.truncated_normal(stddev=0.02)
