"""Blockwise flash attention vs jnp reference — forward, gradients, and
padding/masking behavior. Interpreter mode on the CPU test backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ssl_tpu.ops.attention import scaled_dot_product_attention
from vit_ssl_tpu.ops.flash_blockwise import blockwise_attention


def _qkv(key, b=1, h=2, n=160, d=32, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return (
        jax.random.normal(k1, (b, h, n, d), dtype),
        jax.random.normal(k2, (b, h, n, d), dtype),
        jax.random.normal(k3, (b, h, n, d), dtype),
    )


@pytest.mark.parametrize("n,bq,bk", [(160, 64, 64), (128, 128, 128), (100, 64, 32)])
def test_forward_matches_reference(n, bq, bk):
    q, k, v = _qkv(jax.random.PRNGKey(0), n=n)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = blockwise_attention(q, k, v, scale, bq, bk, True)
    ref, _ = scaled_dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_forward_matches_single_tile_kernel():
    from vit_ssl_tpu.ops.flash_attention import fused_attention

    q, k, v = _qkv(jax.random.PRNGKey(1), n=96)
    scale = 1.0 / np.sqrt(q.shape[-1])
    a = blockwise_attention(q, k, v, scale, 32, 32, True)
    b = fused_attention(q, k, v, scale, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4)


def test_gradients_match_reference():
    q, k, v = _qkv(jax.random.PRNGKey(2), n=96, d=16)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def loss_flash(q, k, v):
        return jnp.sum(blockwise_attention(q, k, v, scale, 32, 32, True) ** 2)

    def loss_ref(q, k, v):
        out, _ = scaled_dot_product_attention(q, k, v)
        return jnp.sum(out**2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_unaligned_seq_len_masked_correctly():
    # n not a multiple of the block: padded keys must contribute nothing
    q, k, v = _qkv(jax.random.PRNGKey(3), n=70)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = blockwise_attention(q, k, v, scale, 64, 64, True)
    ref, _ = scaled_dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_bfloat16_forward():
    q, k, v = _qkv(jax.random.PRNGKey(4), n=128, dtype=jnp.bfloat16)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = blockwise_attention(q, k, v, scale, 64, 64, True)
    ref, _ = scaled_dot_product_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )


def test_bfloat16_gradients():
    """bf16 inputs: the backward's matmul operands stay bf16 (MXU-rate)
    with fp32 accumulation — gradients must still track the fp32 jnp
    reference within bf16 resolution."""
    q, k, v = _qkv(jax.random.PRNGKey(12), n=96, dtype=jnp.bfloat16)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def loss_flash(q, k, v):
        return jnp.sum(
            blockwise_attention(q, k, v, scale, 32, 32, True).astype(jnp.float32) ** 2
        )

    def loss_ref(q, k, v):
        out, _ = scaled_dot_product_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
        return jnp.sum(out**2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    for name, gf, gr in zip("qkv", g_flash, g_ref):
        assert gf.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(gf, np.float32), np.asarray(gr), atol=0.25, rtol=5e-2,
            err_msg=f"d{name} mismatch",
        )


def test_jit_compiles():
    q, k, v = _qkv(jax.random.PRNGKey(5), n=64)
    scale = 1.0 / np.sqrt(q.shape[-1])
    f = jax.jit(lambda q, k, v: blockwise_attention(q, k, v, scale, 32, 32, True))
    out = f(q, k, v)
    ref, _ = scaled_dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_lse_variant_forward_matches_reference():
    from vit_ssl_tpu.ops.flash_blockwise import blockwise_attention_lse

    q, k, v = _qkv(jax.random.PRNGKey(6), n=96, d=16)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out, lse = blockwise_attention_lse(q, k, v, scale, 32, 32, True)
    ref, _ = scaled_dot_product_attention(q, k, v)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    lse_ref = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)
    assert lse.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), atol=3e-5, rtol=1e-4)


def test_lse_variant_gradients_include_lse_cotangent():
    """Gradients flow through BOTH outputs: a loss mixing out and lse must
    match the jnp reference (the dlse cotangent folds into the backward's
    delta term)."""
    from vit_ssl_tpu.ops.flash_blockwise import blockwise_attention_lse

    q, k, v = _qkv(jax.random.PRNGKey(7), n=80, d=16)
    scale = 1.0 / np.sqrt(q.shape[-1])
    w = jax.random.normal(jax.random.PRNGKey(8), (q.shape[0], q.shape[1], q.shape[2]))

    def loss_flash(q, k, v):
        out, lse = blockwise_attention_lse(q, k, v, scale, 32, 32, True)
        return jnp.sum(out**2) + jnp.sum(w * lse)

    def loss_ref(q, k, v):
        out, _ = scaled_dot_product_attention(q, k, v)
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        lse = jax.scipy.special.logsumexp(s, axis=-1)
        return jnp.sum(out**2) + jnp.sum(w * lse)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_mha_dispatches_to_blockwise_for_long_seq():
    """MultiHeadAttention with use_flash routes N>1024 through the
    blockwise kernel and matches the XLA path."""
    from vit_ssl_tpu.ops import MultiHeadAttention

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1088, 32))
    flash = MultiHeadAttention(d_model=32, num_heads=2, use_flash=True)
    xla = MultiHeadAttention(d_model=32, num_heads=2, use_flash=False)
    params = xla.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(flash.apply(params, x)),
        np.asarray(xla.apply(params, x)),
        atol=5e-5,
        rtol=5e-4,
    )
