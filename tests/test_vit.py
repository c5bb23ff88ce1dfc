"""ViT model tests — reference surfaces (`/root/reference/tests/test_vit.py`):
shape/dtype, purity, batch independence, plus jit equivalence and remat.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ssl_tpu.models import ViT


def _vit(**kw):
    defaults = dict(
        num_classes=10,
        num_blocks=2,
        input_shape=(3, 32, 32),
        embed_dim=48,
        patch_size=8,
        num_heads=4,
        mlp_dim=96,
        dropout=0.1,
        use_flash=False,
        use_fused_mlp=False,
    )
    defaults.update(kw)
    return ViT(**defaults)


@pytest.fixture(scope="module")
def vit_and_params():
    model = _vit()
    x = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_output_shape_dtype(vit_and_params):
    model, params = vit_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    logits = model.apply(params, x)
    assert logits.shape == (2, 10)
    assert logits.dtype == jnp.float32


def test_return_attn_shape(vit_and_params):
    model, params = vit_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    logits, attn = model.apply(params, x, return_attn=True)
    assert logits.shape == (2, 10)
    # last block's attention: (B, heads, N+1, N+1)
    assert attn.shape == (2, 4, 17, 17)


def test_purity(vit_and_params):
    model, params = vit_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    x_np = np.asarray(x).copy()
    model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(x), x_np)


def test_batch_independence(vit_and_params):
    model, params = vit_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    batched = model.apply(params, x)
    singles = jnp.concatenate(
        [model.apply(params, x[i : i + 1]) for i in range(4)], axis=0
    )
    np.testing.assert_allclose(np.asarray(batched), np.asarray(singles), atol=1e-5)


def test_jit_matches_eager(vit_and_params):
    model, params = vit_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    eager = model.apply(params, x)
    jitted = jax.jit(lambda p, a: model.apply(p, a))(params, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-5)


def test_remat_matches_plain(vit_and_params):
    model, params = vit_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    remat_model = _vit(remat=True)
    out_plain = model.apply(params, x)
    out_remat = remat_model.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_remat), atol=1e-5)


def test_dropout_train_eval(vit_and_params):
    model, params = vit_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    e1 = model.apply(params, x, deterministic=True)
    e2 = model.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    t1 = model.apply(
        params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(5)}
    )
    assert not np.allclose(np.asarray(t1), np.asarray(e1))


def test_gradients_flow_everywhere(vit_and_params):
    model, params = vit_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    labels = jnp.array([1, 2])

    def loss_fn(p):
        logits = model.apply(p, x)
        onehot = jax.nn.one_hot(labels, 10)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(bool(np.abs(np.asarray(g)).sum() > 0) for g in leaves)
    assert nonzero >= len(leaves) - 1  # everything but (maybe) nothing is dead


class TestPatchDropout:
    """PatchDropout (arXiv:2208.07220) — opt-in train-time token dropping."""

    def _model(self, pd):
        from vit_ssl_tpu.models.vit import ViT

        return ViT(
            num_classes=4, num_blocks=2, input_shape=(3, 32, 32), embed_dim=32,
            patch_size=8, num_heads=2, mlp_dim=64, dropout=0.0,
            patch_dropout=pd, use_flash=False, use_fused_mlp=False,
        )

    def test_off_by_default_matches_baseline(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
        base = self._model(0.0)
        variables = base.init(jax.random.PRNGKey(0), x)
        out_off = base.apply(
            variables, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
        )
        # the field default is 0.0 — constructing without it is identical
        from vit_ssl_tpu.models.vit import ViT

        plain = ViT(
            num_classes=4, num_blocks=2, input_shape=(3, 32, 32), embed_dim=32,
            patch_size=8, num_heads=2, mlp_dim=64, dropout=0.0,
            use_flash=False, use_fused_mlp=False,
        )
        out_plain = plain.apply(
            variables, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
        )
        np.testing.assert_array_equal(np.asarray(out_off), np.asarray(out_plain))

    def test_train_mode_drops_and_is_rng_deterministic(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
        m = self._model(0.5)
        variables = m.init(jax.random.PRNGKey(0), x)
        a = m.apply(variables, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
        b = m.apply(variables, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
        c = m.apply(variables, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))
        assert a.shape == (2, 4)

    def test_eval_mode_ignores_patch_dropout(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
        m05 = self._model(0.5)
        m00 = self._model(0.0)
        variables = m00.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(
            np.asarray(m05.apply(variables, x, deterministic=True)),
            np.asarray(m00.apply(variables, x, deterministic=True)),
        )

    def test_gradients_flow(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
        m = self._model(0.5)
        variables = m.init(jax.random.PRNGKey(0), x)

        def loss(params):
            out = m.apply(
                {"params": params}, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(variables["params"])
        total = sum(float(jnp.abs(v).sum()) for v in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0
