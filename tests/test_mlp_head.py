"""MLP head tests — reference surfaces (`/root/reference/tests/test_mlp_head.py`)."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_ssl_tpu.ops import MLPHead


def test_output_shape():
    head = MLPHead(d_model=32, num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    params = head.init(jax.random.PRNGKey(1), x)
    out = head.apply(params, x)
    assert out.shape == (4, 10)
    assert out.dtype == jnp.float32


def test_batch_independence():
    head = MLPHead(d_model=32, num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    params = head.init(jax.random.PRNGKey(1), x)
    batched = head.apply(params, x)
    singles = jnp.concatenate(
        [head.apply(params, x[i : i + 1]) for i in range(4)], axis=0
    )
    np.testing.assert_allclose(np.asarray(batched), np.asarray(singles), atol=1e-5)


def test_layernorm_applied():
    # two inputs that differ only by affine scale/shift produce identical
    # logits because LayerNorm normalises them first
    head = MLPHead(d_model=32, num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32))
    params = head.init(jax.random.PRNGKey(1), x)
    out1 = head.apply(params, x)
    out2 = head.apply(params, x * 3.0 + 7.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)
