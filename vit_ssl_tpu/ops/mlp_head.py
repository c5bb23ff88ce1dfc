"""Classification head: LayerNorm + Linear over the CLS token.

Parity with `/root/reference/vit_core/mlp_head.py:6-15`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .initializers import InitScheme
from .precision import resolve_precision


class MLPHead(nn.Module):
    d_model: int
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    init_scheme: str = "reference"
    matmul_precision: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = InitScheme(self.init_scheme)
        x = nn.LayerNorm(
            epsilon=1e-5,  # torch nn.LayerNorm default (parity)
            dtype=jnp.float32, param_dtype=self.param_dtype, name="norm"
        )(x)
        # Logits in fp32: the final projection feeds softmax-CE directly.
        return nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            precision=resolve_precision(self.matmul_precision),
            kernel_init=init.linear_kernel(),
            bias_init=init.linear_bias(self.d_model),
            name="linear",
        )(x)
