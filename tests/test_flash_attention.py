"""Pallas fused-attention kernel vs jnp reference equivalence
(SURVEY.md §4: "Pallas-kernel vs jnp reference-attention equivalence").
Runs in interpreter mode on the CPU test backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ssl_tpu.ops import MultiHeadAttention, fused_attention
from vit_ssl_tpu.ops.attention import scaled_dot_product_attention


def _qkv(key, b=2, h=3, n=17, d=16, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, n, d), dtype)
    k = jax.random.normal(k2, (b, h, n, d), dtype)
    v = jax.random.normal(k3, (b, h, n, d), dtype)
    return q, k, v


@pytest.mark.parametrize("n", [8, 17, 128, 145])
def test_forward_matches_reference(n):
    q, k, v = _qkv(jax.random.PRNGKey(0), n=n)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = fused_attention(q, k, v, scale, True)
    ref, _ = scaled_dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_forward_bfloat16():
    q, k, v = _qkv(jax.random.PRNGKey(1), n=37, dtype=jnp.bfloat16)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = fused_attention(q, k, v, scale, True)
    ref, _ = scaled_dot_product_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        atol=3e-2,
        rtol=3e-2,
    )


@pytest.mark.parametrize("n", [8, 17, 128, 145])
def test_gradients_match_reference(n):
    q, k, v = _qkv(jax.random.PRNGKey(2), n=n)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale, True) ** 2)

    def loss_ref(q, k, v):
        out, _ = scaled_dot_product_attention(q, k, v)
        return jnp.sum(out**2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4, rtol=1e-3)


def test_gradients_bfloat16():
    """bf16 grads from the Pallas backward stay within bf16 tolerance of
    the fp32 reference gradient."""
    q, k, v = _qkv(jax.random.PRNGKey(5), n=24, dtype=jnp.bfloat16)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale, True).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        out, _ = scaled_dot_product_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
        return jnp.sum(out**2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    for gf, gr in zip(g_fused, g_ref):
        assert gf.dtype == jnp.bfloat16
        scale_ref = np.abs(np.asarray(gr)).max() + 1e-6
        err = np.abs(np.asarray(gf, np.float32) - np.asarray(gr)) / scale_ref
        assert err.max() < 0.06, err.max()


def test_mha_flash_path_matches_xla_path():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 64))
    flash = MultiHeadAttention(d_model=64, num_heads=4, use_flash=True)
    xla = MultiHeadAttention(d_model=64, num_heads=4, use_flash=False)
    params = xla.init(jax.random.PRNGKey(0), x)
    out_flash = flash.apply(params, x)
    out_xla = xla.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=2e-5, rtol=1e-4
    )


def test_jit_compiles_fused_path():
    q, k, v = _qkv(jax.random.PRNGKey(4), n=9)
    scale = 1.0 / np.sqrt(q.shape[-1])
    f = jax.jit(lambda q, k, v: fused_attention(q, k, v, scale, True))
    out = f(q, k, v)
    ref, _ = scaled_dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
