"""uint16-threshold dropout (ops/dropout.py) semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vit_ssl_tpu.ops import Dropout, EncoderBlock, dropout16, dropout_bernoulli


def test_dropout16_statistics():
    """Realized drop rate within 1/65536-quantized tolerance of nominal."""
    x = jnp.ones((512, 512))
    out = dropout16(jax.random.PRNGKey(0), x, 0.1)
    frac = float((out == 0).mean())
    assert abs(frac - 0.1) < 3e-3
    kept = np.asarray(out)[np.asarray(out) != 0]
    np.testing.assert_allclose(kept, 1.0 / 0.9, rtol=1e-6)


def test_dropout16_deterministic_under_rng():
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 64))
    a = dropout16(jax.random.PRNGKey(2), x, 0.3)
    b = dropout16(jax.random.PRNGKey(2), x, 0.3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = dropout16(jax.random.PRNGKey(3), x, 0.3)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_dropout16_zero_rate_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 8))
    np.testing.assert_array_equal(
        np.asarray(dropout16(jax.random.PRNGKey(0), x, 0.0)), np.asarray(x)
    )


def test_slow_path_matches_flax_dropout():
    """fast=False reproduces flax nn.Dropout bit-for-bit (same rng)."""
    x = jax.random.normal(jax.random.PRNGKey(5), (32, 48))
    rng = jax.random.PRNGKey(6)
    ours = Dropout(rate=0.25, fast=False).apply(
        {}, x, False, rngs={"dropout": rng}
    )
    flax_ref = nn.Dropout(rate=0.25, deterministic=False).apply(
        {}, x, rngs={"dropout": rng}
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(flax_ref),
                               atol=1e-6)


def test_module_eval_mode_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(7), (16, 16))
    out = Dropout(rate=0.5, fast=True).apply({}, x, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_encoder_block_fast_flag_changes_mask_stream_only():
    """fast and reference dropout give identical eval outputs and
    same-shape, similarly-scaled train outputs."""
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 10, 32))
    fast = EncoderBlock(d_model=32, num_heads=4, mlp_dim=64, dropout=0.2,
                        use_flash=False, fast_dropout=True)
    slow = EncoderBlock(d_model=32, num_heads=4, mlp_dim=64, dropout=0.2,
                        use_flash=False, fast_dropout=False)
    params = slow.init(jax.random.PRNGKey(0), x)
    # eval: dropout off -> identical
    np.testing.assert_allclose(
        np.asarray(fast.apply(params, x, True)),
        np.asarray(slow.apply(params, x, True)), atol=1e-6,
    )
    # train: both produce finite outputs of the right shape
    rngs = {"dropout": jax.random.PRNGKey(1)}
    of = fast.apply(params, x, False, rngs=rngs)
    os_ = slow.apply(params, x, False, rngs=rngs)
    assert of.shape == os_.shape == x.shape
    assert np.isfinite(np.asarray(of)).all()
    assert np.isfinite(np.asarray(os_)).all()


def test_gradient_flows_through_dropout16():
    x = jax.random.normal(jax.random.PRNGKey(9), (16, 16))

    def loss(x):
        return jnp.sum(dropout16(jax.random.PRNGKey(10), x, 0.5) ** 2)

    g = jax.grad(loss)(x)
    out = dropout16(jax.random.PRNGKey(10), x, 0.5)
    # gradient is 2x/(1-p)^2 where kept, 0 where dropped
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(2 * out / 0.5), atol=1e-5
    )
