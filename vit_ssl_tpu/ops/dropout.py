"""TPU-efficient dropout.

The reference applies ``torch.nn.Dropout`` (rate 0.1) three times per
encoder block (`/root/reference/vit_core/encoder_block.py:20-23,38-50`,
`feed_forward.py:17-27`). The straightforward JAX port
(``jax.random.bernoulli``) draws a fp32 uniform per element — on TPU that
materialises a u32 random-bit tensor the size of the activations *in
4-byte lanes*, and profiling shows the DINO step spends ~11 ms/step in
rng-bit-generation plus mask application.

``dropout16`` instead thresholds raw **uint16** random bits:
``drop ⇔ bits < round(rate·65536)``. Half the random-bit traffic, same
keep/scale semantics. Measured (v5e, (256,145,1536) bf16, fwd+bwd,
chained): 0.559 vs 0.822 ms per dropout — 1.47×.

Behavioral divergence vs the reference (documented per repo convention):
the realized drop probability is quantized to 1/65536 via round-to-nearest
(rate 0.1 → 6554/65536 = 0.1000061, an absolute error of 6.1e-6; the
threshold is clamped to 65535 so rates within 1/131072 of 1.0 still drop
65535/65536 of values instead of wrapping to 0), and the mask stream comes
from ``jax.random.bits`` rather than torch's RNG — the latter is true of
any JAX port. ``fast_dropout=False`` on the model configs restores the
exact ``jax.random.bernoulli`` formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def keep_mask16(rng, shape, rate: float) -> jnp.ndarray:
    """Boolean keep-mask via uint16 threshold (True = keep)."""
    thresh = jnp.uint16(min(round(rate * 65536), 65535))
    return jax.random.bits(rng, shape, jnp.uint16) >= thresh


def dropout16(rng, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout via uint16 threshold; scales kept values by
    1/(1-rate)."""
    if rate <= 0.0:
        return x
    keep = keep_mask16(rng, x.shape, rate)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


def dropout_bernoulli(rng, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Reference formulation: fp32-uniform Bernoulli keep mask."""
    if rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


class Dropout(nn.Module):
    """Drop-in ``nn.Dropout`` replacement dispatching on ``fast``."""

    rate: float
    fast: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        if deterministic or self.rate <= 0.0:
            return x
        rng = self.make_rng("dropout")
        fn = dropout16 if self.fast else dropout_bernoulli
        return fn(rng, x, self.rate)
