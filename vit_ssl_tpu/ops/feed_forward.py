"""Transformer feed-forward block.

Parity with `/root/reference/vit_core/feed_forward.py:7-28`:
Linear(d_model→d_ff) → exact GELU → Dropout → Linear(d_ff→d_model).

On TPU the whole block can execute as the fused Pallas kernel in
:mod:`.fused_mlp` (``use_fused=True``), keeping the d_ff-wide activation in
VMEM. Parameters are declared directly (w1/b1/w2/b2) so the fused and XLA
paths share one parameter structure, and the dropout keep-mask is drawn
with the module's flax 'dropout' rng so RNG semantics are identical
between the two paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .dropout import keep_mask16
from .fused_mlp import _gelu_exact, default_interpret, fused_mlp
from .initializers import InitScheme
from .precision import resolve_precision


class FeedForwardBlock(nn.Module):
    d_model: int = 512
    d_ff: int = 2048
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_fused: bool = False
    fast_dropout: bool = True
    init_scheme: str = "reference"
    matmul_precision: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        init = InitScheme(self.init_scheme)
        w1 = self.param(
            "w1", init.linear_kernel(), (self.d_model, self.d_ff), self.param_dtype
        )
        b1 = self.param(
            "b1", init.linear_bias(self.d_model), (self.d_ff,), self.param_dtype
        )
        w2 = self.param(
            "w2", init.linear_kernel(), (self.d_ff, self.d_model), self.param_dtype
        )
        b2 = self.param(
            "b2", init.linear_bias(self.d_ff), (self.d_model,), self.param_dtype
        )

        apply_dropout = (not deterministic) and self.dropout > 0.0
        keep_prob = 1.0 - self.dropout

        b, n, d = x.shape
        xc = x.astype(self.dtype)
        w1c, b1c = w1.astype(self.dtype), b1.astype(self.dtype)
        w2c, b2c = w2.astype(self.dtype), b2.astype(self.dtype)

        def keep_mask(rng, shape):
            """uint16-threshold mask (ops/dropout.py) or the reference
            fp32-uniform Bernoulli, per ``fast_dropout``."""
            if self.fast_dropout:
                return keep_mask16(rng, shape, self.dropout)
            return jax.random.bernoulli(rng, keep_prob, shape)

        if self.use_fused:
            flat = xc.reshape(b * n, d)
            mask = None
            if apply_dropout:
                mask = keep_mask(self.make_rng("dropout"), (b * n, self.d_ff))
            out = fused_mlp(
                flat, w1c, b1c, w2c, b2c, mask, keep_prob, default_interpret()
            )
            return out.reshape(b, n, self.d_model)

        prec = resolve_precision(self.matmul_precision)
        h = jnp.dot(xc, w1c, precision=prec) + b1c
        h = _gelu_exact(h)
        if apply_dropout:
            mask = keep_mask(self.make_rng("dropout"), h.shape)
            h = jnp.where(mask, h / keep_prob, 0.0).astype(self.dtype)
        return jnp.dot(h, w2c, precision=prec) + b2c
