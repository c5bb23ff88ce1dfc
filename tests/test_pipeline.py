"""Pipeline parallelism (GPipe over encoder blocks) equivalence tests.

Run on the 8-device virtual CPU mesh (conftest): the pipelined forward and
its gradients must match the plain sequential stack bit-for-bit up to fp32
reduction order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ssl_tpu.ops import EncoderBlock
from vit_ssl_tpu.parallel import (
    create_pipe_mesh,
    pipeline_apply,
    stack_block_params,
    unstack_block_params,
)

L, D_MODEL, HEADS, MLP = 4, 32, 4, 64
B, N = 8, 10


@pytest.fixture(scope="module")
def setup():
    block = EncoderBlock(
        d_model=D_MODEL, num_heads=HEADS, mlp_dim=MLP, dropout=0.0,
        use_flash=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D_MODEL))
    params = {
        f"encoder_blocks_{i}": block.init(jax.random.PRNGKey(i + 1), x)["params"]
        for i in range(L)
    }

    def block_fn(layer_params, h):
        return block.apply({"params": layer_params}, h, True)

    def sequential(params, x):
        h = x
        for i in range(L):
            h = block_fn(params[f"encoder_blocks_{i}"], h)
        return h

    return block_fn, params, x, sequential


def test_stack_unstack_roundtrip(setup):
    _, params, _, _ = setup
    stacked = stack_block_params(params, L)
    leaves = jax.tree_util.tree_leaves(stacked)
    assert all(leaf.shape[0] == L for leaf in leaves)
    back = unstack_block_params(stacked, L)
    for i in range(L):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params[f"encoder_blocks_{i}"], back[f"encoder_blocks_{i}"],
        )


@pytest.mark.parametrize("pp,m", [(4, 4), (4, 2), (2, 2)])
def test_pipeline_forward_matches_sequential(setup, pp, m):
    block_fn, params, x, sequential = setup
    mesh = create_pipe_mesh(8, pp=pp)
    stacked = stack_block_params(params, L)
    out = pipeline_apply(block_fn, stacked, x, mesh, num_microbatches=m)
    ref = sequential(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential(setup):
    block_fn, params, x, sequential = setup
    mesh = create_pipe_mesh(8, pp=4)

    def loss_pipe(params, x):
        stacked = stack_block_params(params, L)
        return jnp.sum(pipeline_apply(block_fn, stacked, x, mesh,
                                      num_microbatches=4) ** 2)

    def loss_seq(params, x):
        return jnp.sum(sequential(params, x) ** 2)

    gp = jax.grad(loss_pipe)(params, x)
    gs = jax.grad(loss_seq)(params, x)
    flat_p, _ = jax.tree_util.tree_flatten(gp)
    flat_s, _ = jax.tree_util.tree_flatten(gs)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)


def test_pipeline_with_data_parallel(setup):
    """dp=2 x pp=4: batch sharded over 'data', stages over 'pipe'."""
    block_fn, params, x, sequential = setup
    mesh = create_pipe_mesh(8, pp=4)  # (data=2, pipe=4)
    assert mesh.shape["data"] == 2
    stacked = stack_block_params(params, L)
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    )
    out = pipeline_apply(block_fn, stacked, xs, mesh, num_microbatches=2)
    ref = sequential(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_single_stage_is_sequential(setup):
    block_fn, params, x, sequential = setup
    mesh = create_pipe_mesh(8, pp=1)
    stacked = stack_block_params(params, L)
    out = pipeline_apply(block_fn, stacked, x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sequential(params, x)),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_rejects_bad_microbatch(setup):
    block_fn, params, x, _ = setup
    mesh = create_pipe_mesh(8, pp=4)
    stacked = stack_block_params(params, L)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(block_fn, stacked, x, mesh, num_microbatches=3)


@pytest.mark.parametrize(
    "nd,pp,m,v",
    [
        (8, 2, 2, 2),   # dp=4 groups of batch 2, M == P
        (2, 2, 4, 2),   # M > P: wrap-buffer path (arrivals banked M-P ticks)
        (2, 2, 8, 2),   # M >> P
        (4, 2, 4, 2),   # M > P composed with dp=2
        (8, 4, 4, 1),   # plain-GPipe path for contrast
    ],
)
def test_interleaved_forward_matches_sequential(setup, nd, pp, m, v):
    """Megatron-style interleaved virtual stages: same math, V x less
    bubble wall-time. Per-group batch (B / dp) must divide by M."""
    block_fn, params, x, sequential = setup
    mesh = create_pipe_mesh(nd, pp=pp)
    stacked = stack_block_params(params, L)
    out = pipeline_apply(block_fn, stacked, x, mesh, num_microbatches=m,
                         interleave=v)
    ref = sequential(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_interleaved_gradients_match_sequential(setup):
    block_fn, params, x, sequential = setup
    mesh = create_pipe_mesh(2, pp=2)  # dp=1: full batch through M=4 > P

    def loss_pipe(params, x):
        stacked = stack_block_params(params, L)
        return jnp.sum(pipeline_apply(block_fn, stacked, x, mesh,
                                      num_microbatches=4, interleave=2) ** 2)

    def loss_seq(params, x):
        return jnp.sum(sequential(params, x) ** 2)

    g_pipe = jax.grad(loss_pipe)(params, x)
    g_seq = jax.grad(loss_seq)(params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        ),
        g_pipe, g_seq,
    )


def test_interleaved_validation():
    from vit_ssl_tpu.parallel.pipeline import pipeline_bubble_fraction

    # bubble wall-time fraction shrinks with V
    assert pipeline_bubble_fraction(4, 4) == pytest.approx(3 / 7)
    assert pipeline_bubble_fraction(4, 4, 2) == pytest.approx(3 / 11)
    assert pipeline_bubble_fraction(4, 4, 4) == pytest.approx(3 / 19)


def test_interleaved_rejects_bad_shapes(setup):
    block_fn, params, x, _ = setup
    mesh = create_pipe_mesh(8, pp=2)
    stacked = stack_block_params(params, L)
    with pytest.raises(ValueError, match="divide"):
        # L=4 layers cannot split into pp*V = 2*3 = 6 chunks
        pipeline_apply(block_fn, stacked, x, mesh, num_microbatches=2,
                       interleave=3)
    with pytest.raises(ValueError, match="microbatches"):
        # M=1 < pp=2 violates the interleaved dependency bound
        pipeline_apply(block_fn, stacked, x, mesh, num_microbatches=1,
                       interleave=2)
