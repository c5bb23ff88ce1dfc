"""SimMIM model tests: static-shape masking equivalence to the reference's
ragged formulation (`/root/reference/vit_core/ssl/simmim/masking.py:6-37`),
masked-loss math, and inference path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vit_ssl_tpu.models import SimMIMViT, make_random_mask, masked_l1_loss


def _model(**kw):
    defaults = dict(
        num_blocks=2,
        input_shape=(3, 32, 32),
        embed_dim=48,
        patch_size=8,
        num_heads=4,
        mlp_dim=96,
        dropout=0.0,
        mask_ratio=0.5,
        use_flash=False,
        use_fused_mlp=False,
    )
    defaults.update(kw)
    return SimMIMViT(**defaults)


def test_mask_exact_count():
    mask = make_random_mask(jax.random.PRNGKey(0), 8, 16, 0.5)
    counts = np.asarray(mask.sum(axis=1))
    np.testing.assert_array_equal(counts, 8)  # int(16*0.5)


def test_mask_ratio_zero_and_varied():
    assert np.asarray(make_random_mask(jax.random.PRNGKey(0), 4, 16, 0.0)).sum() == 0
    mask = make_random_mask(jax.random.PRNGKey(0), 4, 16, 0.75)
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), 12)


def test_mask_differs_per_sample_and_seed():
    m1 = np.asarray(make_random_mask(jax.random.PRNGKey(0), 4, 64, 0.5))
    m2 = np.asarray(make_random_mask(jax.random.PRNGKey(1), 4, 64, 0.5))
    assert not np.array_equal(m1, m2)
    assert not np.array_equal(m1[0], m1[1])


def test_forward_shapes():
    model = _model()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)}, x)
    preds, targets, mask = model.apply(
        variables, x, rngs={"mask": jax.random.PRNGKey(3)}
    )
    n = (32 // 8) ** 2
    patch_dim = 3 * 8 * 8
    assert preds.shape == (2, n, patch_dim)
    assert targets.shape == (2, n, patch_dim)
    assert mask.shape == (2, n)
    assert mask.dtype == bool


def test_masked_loss_equals_ragged_reference():
    """Dense mask-weighted L1 == mean L1 over the ragged masked selection."""
    preds = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 12))
    targets = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 12))
    mask = make_random_mask(jax.random.PRNGKey(2), 2, 16, 0.5)
    dense = float(masked_l1_loss(preds, targets, mask))
    m = np.asarray(mask)
    ragged = np.abs(np.asarray(preds)[m] - np.asarray(targets)[m]).mean()
    np.testing.assert_allclose(dense, ragged, rtol=1e-6)


def test_targets_are_input_patches():
    from vit_ssl_tpu.ops import extract_patches

    model = _model()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)}, x)
    _, targets, _ = model.apply(variables, x, rngs={"mask": jax.random.PRNGKey(3)})
    np.testing.assert_allclose(
        np.asarray(targets), np.asarray(extract_patches(x, 8)), atol=1e-6
    )


def test_inference_forward():
    model = _model()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)}, x)
    feats = model.apply(variables, x, method=model.inference_forward)
    assert feats.shape == (2, 48)
    patch_feats = model.apply(
        variables, x, method=model.inference_forward, return_patch_features=True
    )
    assert patch_feats.shape == (2, 16, 48)
    # deterministic: no mask rng needed, repeated calls identical
    feats2 = model.apply(variables, x, method=model.inference_forward)
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(feats2))


def test_train_step_gradient_only_through_masked():
    """Gradient w.r.t. predictions at unmasked positions must be zero."""
    preds = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 12))
    targets = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 12))
    mask = make_random_mask(jax.random.PRNGKey(2), 2, 16, 0.5)
    g = jax.grad(lambda p: masked_l1_loss(p, targets, mask))(preds)
    g = np.asarray(g)
    m = np.asarray(mask)
    assert np.abs(g[~m]).max() == 0.0
    assert np.abs(g[m]).min() > 0.0
