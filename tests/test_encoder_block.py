"""Encoder block tests — reference surfaces
(`/root/reference/tests/test_encoder_block.py`): shape, purity, train/eval
dropout semantics, eval determinism; with the fixed return contract.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vit_ssl_tpu.ops import EncoderBlock


def _block(dropout=0.1, **kw):
    return EncoderBlock(
        d_model=32, num_heads=4, mlp_dim=64, dropout=dropout,
        use_flash=False, use_fused_mlp=False, **kw,
    )


def test_output_shape():
    block = _block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    params = block.init(jax.random.PRNGKey(1), x)
    out = block.apply(params, x)
    assert out.shape == (2, 9, 32)


def test_return_attn():
    block = _block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    params = block.init(jax.random.PRNGKey(1), x)
    out, attn = block.apply(params, x, return_attn=True)
    assert out.shape == (2, 9, 32)
    assert attn.shape == (2, 4, 9, 9)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)


def test_purity_no_input_mutation():
    block = _block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    x_np = np.asarray(x).copy()
    params = block.init(jax.random.PRNGKey(1), x)
    block.apply(params, x)
    np.testing.assert_array_equal(np.asarray(x), x_np)


def test_eval_deterministic():
    block = _block(dropout=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    params = block.init(jax.random.PRNGKey(1), x)
    o1 = block.apply(params, x, deterministic=True)
    o2 = block.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_train_dropout_differs_from_eval():
    block = _block(dropout=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    params = block.init(jax.random.PRNGKey(1), x)
    o_eval = block.apply(params, x, deterministic=True)
    o_train = block.apply(
        params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(o_train), np.asarray(o_eval))


def test_zero_dropout_train_equals_eval():
    block = _block(dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    params = block.init(jax.random.PRNGKey(1), x)
    o_eval = block.apply(params, x, deterministic=True)
    o_train = block.apply(
        params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    np.testing.assert_allclose(np.asarray(o_train), np.asarray(o_eval), atol=1e-6)


def test_fused_paths_match_xla_paths():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    xla = _block(dropout=0.0)
    fused = EncoderBlock(
        d_model=32, num_heads=4, mlp_dim=64, dropout=0.0,
        use_flash=True, use_fused_mlp=True,
    )
    params = xla.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, x)),
        np.asarray(xla.apply(params, x)),
        atol=5e-5,
        rtol=1e-4,
    )


def test_bfloat16_compute():
    block = _block(dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    params = block.init(jax.random.PRNGKey(1), x)
    out = block.apply(params, x)
    assert out.dtype == jnp.bfloat16
    # params stay fp32
    assert params["params"]["self_attention"]["w_query"]["kernel"].dtype == jnp.float32
