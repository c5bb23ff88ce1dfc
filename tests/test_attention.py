"""Attention tests — reproduces the reference test surfaces
(`/root/reference/tests/test_attention.py`) with the fixed contract
(single return unless return_attn), plus jit equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ssl_tpu.ops import MultiHeadAttention, scaled_dot_product_attention


@pytest.fixture
def mha():
    return MultiHeadAttention(d_model=64, num_heads=4, use_flash=False)


def _init(module, *args, **kwargs):
    return module.init(jax.random.PRNGKey(0), *args, **kwargs)


def test_sdpa_output_shape():
    q = jnp.ones((2, 10, 32))
    out, probs = scaled_dot_product_attention(q, q, q)
    assert out.shape == (2, 10, 32)
    assert probs is None


def test_sdpa_returns_probs():
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    out, probs = scaled_dot_product_attention(q, q, q, return_attn=True)
    assert probs.shape == (2, 10, 10)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_sdpa_uniform_attention_for_identical_keys():
    # identical keys -> uniform attention -> output == mean of values
    k = jnp.ones((1, 5, 8))
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8))
    q = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 8))
    out, _ = scaled_dot_product_attention(q, k, v)
    expected = jnp.broadcast_to(v.mean(axis=1, keepdims=True), (1, 3, 8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_mha_output_shape(mha):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 64))
    params = _init(mha, x)
    out = mha.apply(params, x)
    assert out.shape == (2, 10, 64)
    assert out.dtype == jnp.float32


def test_mha_return_attn_shape(mha):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 64))
    params = _init(mha, x)
    out, probs = mha.apply(params, x, return_attn=True)
    assert out.shape == (2, 10, 64)
    assert probs.shape == (2, 4, 10, 10)


def test_mha_rejects_indivisible_heads():
    bad = MultiHeadAttention(d_model=65, num_heads=4, use_flash=False)
    x = jnp.ones((1, 4, 65))
    with pytest.raises(ValueError, match="divisible"):
        bad.init(jax.random.PRNGKey(0), x)


def test_mha_batch_independence(mha):
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 64))
    params = _init(mha, x)
    batched = mha.apply(params, x)
    singles = jnp.concatenate(
        [mha.apply(params, x[i : i + 1]) for i in range(4)], axis=0
    )
    np.testing.assert_allclose(np.asarray(batched), np.asarray(singles), atol=1e-5)


def test_mha_jit_matches_eager(mha):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 64))
    params = _init(mha, x)
    eager = mha.apply(params, x)
    jitted = jax.jit(lambda p, a: mha.apply(p, a))(params, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-6)


def test_mha_purity(mha):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 64))
    x_copy = np.asarray(x).copy()
    params = _init(mha, x)
    mha.apply(params, x)
    np.testing.assert_array_equal(np.asarray(x), x_copy)


def test_mha_no_bias_params(mha):
    x = jnp.ones((1, 4, 64))
    params = _init(mha, x)["params"]
    for proj in ("w_query", "w_key", "w_value", "final_linear"):
        assert "bias" not in params[proj], f"{proj} must be bias-free"
        assert params[proj]["kernel"].shape == (64, 64)
