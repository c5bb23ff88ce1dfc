"""FSDP/ZeRO-style param + optimizer sharding on the 8-device virtual mesh:
specs pick the largest divisible dim, memory is actually sharded, and the
sharded train step matches the replicated one numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from vit_ssl_tpu.models import ViT
from vit_ssl_tpu.parallel import (
    apply_fsdp,
    create_mesh,
    fsdp_spec_for,
    replicate,
    shard_batch,
)
from vit_ssl_tpu.train.state import create_train_state
from vit_ssl_tpu.train.steps import make_supervised_steps


def _setup(mesh):
    model = ViT(
        num_classes=8, num_blocks=2, input_shape=(3, 32, 32), embed_dim=64,
        patch_size=8, num_heads=4, mlp_dim=256, dropout=0.0,
        use_flash=False, use_fused_mlp=False,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    tx = optax.adamw(1e-3, weight_decay=1e-3)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step, _ = make_supervised_steps(model, tx, donate=False)
    rs = np.random.RandomState(0)
    batch = shard_batch(
        {
            "image": rs.rand(16, 32, 32, 3).astype(np.float32),
            "label": rs.randint(0, 8, 16).astype(np.int32),
            "weight": np.ones(16, np.float32),
        },
        mesh,
    )
    return state, step, batch


class TestSpec:
    def test_large_param_sharded_on_largest_dim(self):
        mesh = create_mesh(8)
        assert fsdp_spec_for((64, 256), mesh, min_size=1) == P(None, "data")
        assert fsdp_spec_for((256, 64), mesh, min_size=1) == P("data", None)

    def test_small_param_replicated(self):
        mesh = create_mesh(8)
        assert fsdp_spec_for((64,), mesh) == P()  # below min_size

    def test_indivisible_replicated(self):
        mesh = create_mesh(8)
        assert fsdp_spec_for((7, 9), mesh, min_size=1) == P()

    def test_single_device_noop(self):
        mesh = create_mesh(1)
        assert fsdp_spec_for((1024, 1024), mesh, min_size=1) == P()


class TestFsdpStep:
    def test_sharded_state_is_actually_sharded(self):
        mesh = create_mesh(8)
        state, _, _ = _setup(mesh)
        fsdp_state = apply_fsdp(replicate(state, mesh), mesh, min_size=1024)
        w1 = fsdp_state.params["encoder_blocks_0"]["feed_forward"]["w1"]
        assert "data" in jax.tree_util.tree_leaves(
            [w1.sharding.spec]
        ) or w1.sharding.spec != P()
        shard = w1.addressable_shards[0].data
        assert shard.size == w1.size // 8  # one eighth per device

    def test_numerics_match_replicated(self):
        mesh = create_mesh(8)
        state, step, batch = _setup(mesh)
        repl = replicate(state, mesh)
        fsdp = apply_fsdp(replicate(state, mesh), mesh, min_size=1024)

        for _ in range(3):
            repl, out_r = step(repl, batch)
            fsdp, out_f = step(fsdp, batch)
        np.testing.assert_allclose(
            float(out_r["loss"]), float(out_f["loss"]), rtol=1e-6
        )
        leaves_r = jax.tree_util.tree_leaves(repl.params)
        leaves_f = jax.tree_util.tree_leaves(fsdp.params)
        for a, b in zip(leaves_r, leaves_f):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
            )

    def test_adam_moments_sharded_with_params(self):
        mesh = create_mesh(8)
        state, step, batch = _setup(mesh)
        fsdp = apply_fsdp(replicate(state, mesh), mesh, min_size=1024)
        fsdp, _ = step(fsdp, batch)
        mu = None
        for leaf in jax.tree_util.tree_leaves_with_path(fsdp.opt_state):
            path, value = leaf
            if getattr(value, "ndim", 0) == 2 and value.size >= 1024:
                mu = value
                break
        assert mu is not None
        assert mu.addressable_shards[0].data.size < mu.size


def test_trainer_flag_places_state(tmp_path):
    """parallel.fsdp: true routes through apply_fsdp in the trainer."""
    from vit_ssl_tpu.parallel.fsdp import fsdp_enabled

    assert fsdp_enabled({"parallel": {"fsdp": True}})
    assert not fsdp_enabled({"parallel": {}})
    assert not fsdp_enabled({})
