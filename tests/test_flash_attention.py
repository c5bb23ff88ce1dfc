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


# ---------------------------------------------------------------------------
# NHD-layout kernel (attention_nhd): consumes (B, N, H·D) directly
# ---------------------------------------------------------------------------

from vit_ssl_tpu.ops.flash_attention import (  # noqa: E402
    attention_nhd,
    attention_nhd_feasible,
    attention_nhd_profitable,
)


def _nhd_ref(xq, xk, xv, h, scale):
    """Oracle: split heads, reference attention, merge heads."""
    b, n, hd = xq.shape
    d = hd // h
    t = lambda x: x.reshape(b, n, h, d).transpose(0, 2, 1, 3)  # noqa: E731
    out, _ = scaled_dot_product_attention(t(xq), t(xk), t(xv))
    return out.transpose(0, 2, 1, 3).reshape(b, n, hd)


def _xqkv(key, b, n, hd, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return (jax.random.normal(k1, (b, n, hd), dtype),
            jax.random.normal(k2, (b, n, hd), dtype),
            jax.random.normal(k3, (b, n, hd), dtype))


@pytest.mark.parametrize("b,n,h,hd", [(4, 17, 4, 64), (3, 145, 6, 96),
                                      (2, 37, 2, 32)])
def test_nhd_forward_matches_reference(b, n, h, hd):
    xq, xk, xv = _xqkv(jax.random.PRNGKey(10), b, n, hd)
    scale = 1.0 / np.sqrt(hd // h)
    out = attention_nhd(xq, xk, xv, h, scale, True)
    ref = _nhd_ref(xq, xk, xv, h, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("b,n,h,hd", [(4, 17, 4, 64), (2, 145, 6, 96)])
def test_nhd_gradients_match_reference(b, n, h, hd):
    xq, xk, xv = _xqkv(jax.random.PRNGKey(11), b, n, hd)
    scale = 1.0 / np.sqrt(hd // h)

    def loss_k(a, b_, c):
        return jnp.sum(attention_nhd(a, b_, c, h, scale, True) ** 2)

    def loss_r(a, b_, c):
        return jnp.sum(_nhd_ref(a, b_, c, h, scale) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(xq, xk, xv)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(xq, xk, xv)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3)


def test_nhd_bfloat16_forward_and_grad():
    xq, xk, xv = _xqkv(jax.random.PRNGKey(12), 2, 24, 64, jnp.bfloat16)
    scale = 1.0 / np.sqrt(16)

    out = attention_nhd(xq, xk, xv, 4, scale, True)
    ref = _nhd_ref(xq.astype(jnp.float32), xk.astype(jnp.float32),
                   xv.astype(jnp.float32), 4, scale)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)

    def loss_k(a, b_, c):
        return jnp.sum(attention_nhd(a, b_, c, 4, scale, True)
                       .astype(jnp.float32) ** 2)

    g = jax.grad(loss_k, argnums=(0, 1, 2))(xq, xk, xv)
    gr = jax.grad(lambda a, b_, c: jnp.sum(_nhd_ref(a, b_, c, 4, scale) ** 2),
                  argnums=(0, 1, 2))(
        xq.astype(jnp.float32), xk.astype(jnp.float32), xv.astype(jnp.float32)
    )
    for a, b_ in zip(g, gr):
        assert a.dtype == jnp.bfloat16
        sc = np.abs(np.asarray(b_)).max() + 1e-6
        assert (np.abs(np.asarray(a, np.float32) - np.asarray(b_)) / sc).max() < 0.06


def test_nhd_jit_and_odd_batch():
    """Batch not divisible by the max group still works (group shrinks)."""
    xq, xk, xv = _xqkv(jax.random.PRNGKey(13), 5, 12, 48)
    scale = 1.0 / np.sqrt(12)
    f = jax.jit(lambda a, b, c: attention_nhd(a, b, c, 4, scale, True))
    out = f(xq, xk, xv)
    ref = _nhd_ref(xq, xk, xv, 4, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_nhd_gate():
    # DINO locals: XLA wins -> not profitable
    assert not attention_nhd_profitable(37, 512, 6, 384)
    # DINO globals / supervised: profitable
    assert attention_nhd_profitable(145, 256, 6, 384)
    assert attention_nhd_profitable(145, 128, 6, 384)
    # tiny batch: falls back
    assert not attention_nhd_profitable(145, 16, 6, 384)
    # N=512, H=12: probs don't fit VMEM -> infeasible
    assert not attention_nhd_feasible(8, 512, 12, 768)
    # N=512, H=6 fits (measured 1.43x win)
    assert attention_nhd_feasible(96, 512, 6, 384)


def test_mha_nhd_path_matches_xla_path(monkeypatch):
    """Force the NHD gate open on a small shape and compare against the
    pure-XLA path through the same weights."""
    import vit_ssl_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod, "attention_nhd_profitable",
                        lambda *a, **kw: True)
    x = jax.random.normal(jax.random.PRNGKey(14), (3, 19, 64))
    flash = MultiHeadAttention(d_model=64, num_heads=4, use_flash=True)
    xla = MultiHeadAttention(d_model=64, num_heads=4, use_flash=False)
    params = xla.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(flash.apply(params, x)), np.asarray(xla.apply(params, x)),
        atol=2e-5, rtol=1e-4,
    )


class TestBlockDiagonal:
    """block_size > 0: packed block-diagonal attention (DINO locals
    packing). Oracle = per-block independent attention."""

    @staticmethod
    def _blockwise_ref(xq, xk, xv, h, scale, bs):
        b, n, hd = xq.shape
        nb = n // bs

        def split(x):
            return x.reshape(b * nb, bs, hd)

        out = _nhd_ref(split(xq), split(xk), split(xv), h, scale)
        return out.reshape(b, n, hd)

    def test_forward_matches_per_block(self):
        h, bs = 2, 37
        xq, xk, xv = _xqkv(jax.random.PRNGKey(20), 2, 4 * bs, 64)
        scale = 1.0 / np.sqrt(64 // h)
        out = attention_nhd(xq, xk, xv, h, scale, True, bs)
        ref = self._blockwise_ref(xq, xk, xv, h, scale, bs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_gradients_match_per_block(self):
        h, bs = 2, 19
        xq, xk, xv = _xqkv(jax.random.PRNGKey(21), 2, 3 * bs, 32)
        scale = 1.0 / np.sqrt(32 // h)

        def loss_k(a, b_, c):
            return jnp.sum(attention_nhd(a, b_, c, h, scale, True, bs) ** 2)

        def loss_r(a, b_, c):
            return jnp.sum(self._blockwise_ref(a, b_, c, h, scale, bs) ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(xq, xk, xv)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(xq, xk, xv)
        for a, b_ in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4, rtol=1e-3)

    def test_sdpa_block_mask_matches_per_block(self):
        from vit_ssl_tpu.ops.attention import scaled_dot_product_attention

        h, bs = 2, 5
        b, n, d = 3, 4 * bs, 16
        key = jax.random.PRNGKey(22)
        k1, k2, k3 = jax.random.split(key, 3)
        q = jax.random.normal(k1, (b, h, n, d))
        k = jax.random.normal(k2, (b, h, n, d))
        v = jax.random.normal(k3, (b, h, n, d))
        out, _ = scaled_dot_product_attention(q, k, v, block_size=bs)
        # per-block oracle
        nb = n // bs
        qb = q.reshape(b, h, nb, bs, d)
        kb = k.reshape(b, h, nb, bs, d)
        vb = v.reshape(b, h, nb, bs, d)
        ref, _ = scaled_dot_product_attention(qb, kb, vb)
        ref = ref.reshape(b, h, n, d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
