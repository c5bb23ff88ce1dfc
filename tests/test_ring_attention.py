"""Ring attention (sequence parallelism) on the 8-device virtual CPU mesh:
exact equivalence with single-device attention, forward and backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ssl_tpu.ops.attention import scaled_dot_product_attention
from vit_ssl_tpu.parallel.ring_attention import (
    create_seq_mesh,
    ring_attention_available,
    ring_attention_sharded,
)


def _qkv(key, b=2, h=3, n=64, d=16, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return (
        jax.random.normal(k1, (b, h, n, d), dtype),
        jax.random.normal(k2, (b, h, n, d), dtype),
        jax.random.normal(k3, (b, h, n, d), dtype),
    )


@pytest.mark.parametrize("ring", [2, 4, 8])
def test_forward_matches_full_attention(ring):
    q, k, v = _qkv(jax.random.PRNGKey(0), n=64)
    scale = 1.0 / np.sqrt(q.shape[-1])
    mesh = create_seq_mesh(ring)
    out = ring_attention_sharded(q, k, v, scale, mesh)
    ref, _ = scaled_dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_gradients_match_full_attention():
    q, k, v = _qkv(jax.random.PRNGKey(1), n=32)
    scale = 1.0 / np.sqrt(q.shape[-1])
    mesh = create_seq_mesh(4)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention_sharded(q, k, v, scale, mesh) ** 2)

    def loss_ref(q, k, v):
        out, _ = scaled_dot_product_attention(q, k, v)
        return jnp.sum(out**2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf), atol=1e-4, rtol=1e-3)


def test_jit_and_sharded_inputs():
    """Inputs already sharded along the sequence axis stay sharded —
    no resharding collectives besides the ring itself."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_seq_mesh(8)
    q, k, v = _qkv(jax.random.PRNGKey(2), n=128)
    sh = NamedSharding(mesh, P(None, None, "seq", None))
    q, k, v = (jax.device_put(x, sh) for x in (q, k, v))
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = jax.jit(
        lambda q, k, v: ring_attention_sharded(q, k, v, scale, mesh)
    )(q, k, v)
    assert out.sharding.spec == P(None, None, "seq", None)
    ref, _ = scaled_dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_bfloat16_forward():
    q, k, v = _qkv(jax.random.PRNGKey(3), n=64, dtype=jnp.bfloat16)
    scale = 1.0 / np.sqrt(q.shape[-1])
    mesh = create_seq_mesh(4)
    out = ring_attention_sharded(q, k, v, scale, mesh)
    assert out.dtype == jnp.bfloat16
    ref, _ = scaled_dot_product_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


@pytest.mark.parametrize("ring", [2, 4])
def test_pallas_hop_forward_matches_full_attention(ring):
    """hop_kernel='pallas' runs the blockwise Pallas kernel per ring hop
    (interpret mode on the CPU backend) and stays exact."""
    q, k, v = _qkv(jax.random.PRNGKey(10), n=128, d=16)
    scale = 1.0 / np.sqrt(q.shape[-1])
    mesh = create_seq_mesh(ring)
    out = ring_attention_sharded(q, k, v, scale, mesh, hop_kernel="pallas")
    ref, _ = scaled_dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_pallas_hop_gradients_match_full_attention():
    """Autodiff through the logaddexp hop merge + the kernel's
    differentiable lse output equals full-attention gradients."""
    q, k, v = _qkv(jax.random.PRNGKey(11), n=64, d=16)
    scale = 1.0 / np.sqrt(q.shape[-1])
    mesh = create_seq_mesh(4)

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention_sharded(q, k, v, scale, mesh, hop_kernel="pallas") ** 2
        )

    def loss_ref(q, k, v):
        out, _ = scaled_dot_product_attention(q, k, v)
        return jnp.sum(out**2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf), atol=2e-4, rtol=1e-3)


def test_hop_kernel_auto_gate():
    from vit_ssl_tpu.parallel.ring_attention import (
        RING_PALLAS_MIN_CHUNK,
        _use_pallas_hop,
    )

    assert _use_pallas_hop("pallas", 8)
    assert not _use_pallas_hop("jnp", 1 << 20)
    # auto: never Pallas on the CPU test backend; threshold documented
    assert not _use_pallas_hop("auto", RING_PALLAS_MIN_CHUNK)
    with pytest.raises(ValueError):
        _use_pallas_hop("mosaic", 64)


def test_availability_gate():
    mesh = create_seq_mesh(4)
    assert ring_attention_available(64, mesh)
    assert not ring_attention_available(63, mesh)  # indivisible
    assert not ring_attention_available(64, None)
    assert not ring_attention_available(64, mesh, axis_name="model")
