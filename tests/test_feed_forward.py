"""FeedForwardBlock tests — reference surfaces
(`/root/reference/tests/test_feed_forward.py`) plus fused-Pallas-kernel vs
XLA-path equivalence, forward and gradient.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ssl_tpu.ops import FeedForwardBlock


def _make(use_fused, dropout=0.1):
    return FeedForwardBlock(d_model=32, d_ff=64, dropout=dropout, use_fused=use_fused)


def test_output_shape_and_dtype():
    ffn = _make(use_fused=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    params = ffn.init(jax.random.PRNGKey(1), x)
    out = ffn.apply(params, x)
    assert out.shape == (2, 5, 32)
    assert out.dtype == jnp.float32


def test_batch_independence():
    ffn = _make(use_fused=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 5, 32))
    params = ffn.init(jax.random.PRNGKey(1), x)
    batched = ffn.apply(params, x)
    singles = jnp.concatenate(
        [ffn.apply(params, x[i : i + 1]) for i in range(4)], axis=0
    )
    np.testing.assert_allclose(np.asarray(batched), np.asarray(singles), atol=1e-5)


def test_fused_matches_xla_deterministic():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    xla = _make(use_fused=False)
    fused = _make(use_fused=True)
    params = xla.init(jax.random.PRNGKey(1), x)
    out_xla = xla.apply(params, x, deterministic=True)
    out_fused = fused.apply(params, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), atol=2e-5, rtol=1e-4
    )


def test_fused_gradients_match_xla():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    xla = _make(use_fused=False, dropout=0.0)
    fused = _make(use_fused=True, dropout=0.0)
    params = xla.init(jax.random.PRNGKey(1), x)

    def loss(mod):
        def f(p):
            return jnp.sum(mod.apply(p, x, deterministic=True) ** 2)

        return f

    g_xla = jax.grad(loss(xla))(params)
    g_fused = jax.grad(loss(fused))(params)
    flat_x, _ = jax.flatten_util.ravel_pytree(g_xla)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_x), atol=1e-4, rtol=1e-3)


def test_dropout_train_vs_eval():
    ffn = _make(use_fused=False, dropout=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    params = ffn.init(jax.random.PRNGKey(1), x)
    out_eval1 = ffn.apply(params, x, deterministic=True)
    out_eval2 = ffn.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_eval1), np.asarray(out_eval2))
    out_train = ffn.apply(
        params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(out_train), np.asarray(out_eval1))


def test_dropout_deterministic_under_fixed_rng():
    for use_fused in (False, True):
        ffn = _make(use_fused=use_fused, dropout=0.3)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
        params = ffn.init(jax.random.PRNGKey(1), x)
        o1 = ffn.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(7)})
        o2 = ffn.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(7)})
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_fused_dropout_is_unbiased():
    # E[dropout(x)] == x: check the fused kernel's mask/scale plumbing.
    ffn = _make(use_fused=True, dropout=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 32))
    params = ffn.init(jax.random.PRNGKey(1), x)
    outs = [
        np.asarray(
            ffn.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(i)})
        )
        for i in range(64)
    ]
    mean_out = np.mean(outs, axis=0)
    eval_out = np.asarray(ffn.apply(params, x, deterministic=True))
    # loose tolerance: 64 samples of a Bernoulli mean
    np.testing.assert_allclose(mean_out, eval_out, atol=0.4)
