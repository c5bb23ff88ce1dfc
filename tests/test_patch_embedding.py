"""Patch embedding tests — reference surfaces
(`/root/reference/tests/test_patch_embedding.py`): shape contracts,
divisibility validation, batch independence; plus torch-unfold ordering of
``extract_patches`` and dynamic pos-embed interpolation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ssl_tpu.ops import (
    ConvPatchEmbed,
    DynamicPatchEmbed,
    ManualPatchEmbed,
    extract_patches,
    patches_to_image,
)

INPUT_SHAPE = (3, 32, 32)  # (C, H, W) reference convention
EMBED = 24
PATCH = 8
NUM_PATCHES = (32 // 8) ** 2


def _x(b=2, h=32, w=32):
    return jax.random.normal(jax.random.PRNGKey(0), (b, h, w, 3))


@pytest.mark.parametrize("cls", [ConvPatchEmbed, ManualPatchEmbed, DynamicPatchEmbed])
def test_output_shape(cls):
    mod = cls(input_shape=INPUT_SHAPE, embed_dim=EMBED, patch_size=PATCH)
    x = _x()
    params = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(params, x)
    assert out.shape == (2, NUM_PATCHES + 1, EMBED)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize("cls", [ConvPatchEmbed, ManualPatchEmbed])
def test_rejects_non_divisible(cls):
    mod = cls(input_shape=(3, 30, 30), embed_dim=EMBED, patch_size=PATCH)
    with pytest.raises(ValueError, match="divisible"):
        mod.init(jax.random.PRNGKey(0), jnp.ones((1, 30, 30, 3)))


def test_dynamic_rejects_non_divisible_input():
    mod = DynamicPatchEmbed(input_shape=INPUT_SHAPE, embed_dim=EMBED, patch_size=PATCH)
    with pytest.raises(ValueError, match="divisible"):
        mod.init(jax.random.PRNGKey(0), jnp.ones((1, 30, 30, 3)))


@pytest.mark.parametrize("cls", [ConvPatchEmbed, ManualPatchEmbed, DynamicPatchEmbed])
def test_batch_independence(cls):
    mod = cls(input_shape=INPUT_SHAPE, embed_dim=EMBED, patch_size=PATCH)
    x = _x(b=4)
    params = mod.init(jax.random.PRNGKey(1), x)
    batched = mod.apply(params, x)
    singles = jnp.concatenate(
        [mod.apply(params, x[i : i + 1]) for i in range(4)], axis=0
    )
    np.testing.assert_allclose(np.asarray(batched), np.asarray(singles), atol=1e-5)


def test_conv_and_manual_equivalent_given_matching_weights():
    """A conv tokenizer with k=stride=p is exactly an unfold+linear."""
    conv_mod = ConvPatchEmbed(input_shape=INPUT_SHAPE, embed_dim=EMBED, patch_size=PATCH)
    man_mod = ManualPatchEmbed(input_shape=INPUT_SHAPE, embed_dim=EMBED, patch_size=PATCH)
    x = _x()
    cp = conv_mod.init(jax.random.PRNGKey(1), x)
    mp = man_mod.init(jax.random.PRNGKey(2), x)

    # conv kernel (p, p, C, D) -> linear kernel (C*p*p, D) in torch order (C, ph, pw)
    ck = cp["params"]["conv"]["kernel"]
    lk = jnp.transpose(ck, (2, 0, 1, 3)).reshape(3 * PATCH * PATCH, EMBED)
    mp = jax.tree_util.tree_map(lambda a: a, mp)
    mp["params"]["linear"]["kernel"] = lk
    mp["params"]["linear"]["bias"] = cp["params"]["conv"]["bias"]
    mp["params"]["cls_token"] = cp["params"]["cls_token"]
    mp["params"]["positional_embedding"] = cp["params"]["positional_embedding"]

    np.testing.assert_allclose(
        np.asarray(conv_mod.apply(cp, x)),
        np.asarray(man_mod.apply(mp, x)),
        atol=1e-4,
        rtol=1e-4,
    )


def test_extract_patches_torch_unfold_order():
    # pixel value encodes (c, y, x) so ordering errors are visible
    h = w = 4
    p = 2
    img = np.zeros((1, h, w, 2), dtype=np.float32)
    for c in range(2):
        for y in range(h):
            for x in range(w):
                img[0, y, x, c] = c * 100 + y * 10 + x
    patches = np.asarray(extract_patches(jnp.asarray(img), p))
    # torch.nn.Unfold flattens each patch as (C, ph, pw)
    # patch 0 = top-left: rows y=0,1 cols x=0,1
    expected_patch0 = [0, 1, 10, 11, 100, 101, 110, 111]
    np.testing.assert_array_equal(patches[0, 0], expected_patch0)
    # patch order is row-major over the grid
    expected_patch1 = [2, 3, 12, 13, 102, 103, 112, 113]
    np.testing.assert_array_equal(patches[0, 1], expected_patch1)


def test_patches_roundtrip():
    x = _x(b=2)
    patches = extract_patches(x, PATCH)
    back = patches_to_image(patches, (32, 32), PATCH, 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_dynamic_pos_embed_fast_path():
    mod = DynamicPatchEmbed(input_shape=INPUT_SHAPE, embed_dim=EMBED, patch_size=PATCH)
    x = _x()
    params = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(params, x)
    assert out.shape == (2, NUM_PATCHES + 1, EMBED)


def test_dynamic_handles_different_input_size():
    mod = DynamicPatchEmbed(input_shape=INPUT_SHAPE, embed_dim=EMBED, patch_size=PATCH)
    x32 = _x()
    params = mod.init(jax.random.PRNGKey(1), x32)
    x16 = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    out = mod.apply(params, x16)
    assert out.shape == (2, (16 // 8) ** 2 + 1, EMBED)
    x64 = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    out = mod.apply(params, x64)
    assert out.shape == (2, (64 // 8) ** 2 + 1, EMBED)


def test_reference_init_uniform01():
    mod = ConvPatchEmbed(input_shape=INPUT_SHAPE, embed_dim=EMBED, patch_size=PATCH)
    params = mod.init(jax.random.PRNGKey(1), _x())["params"]
    pe = np.asarray(params["positional_embedding"])
    assert pe.min() >= 0.0 and pe.max() <= 1.0  # torch.rand parity
    cls = np.asarray(params["cls_token"])
    assert cls.min() >= 0.0 and cls.max() <= 1.0


def test_tpu_init_scheme():
    mod = ConvPatchEmbed(
        input_shape=INPUT_SHAPE, embed_dim=EMBED, patch_size=PATCH, init_scheme="tpu"
    )
    params = mod.init(jax.random.PRNGKey(1), _x())["params"]
    pe = np.asarray(params["positional_embedding"])
    assert abs(pe.mean()) < 0.01 and pe.std() < 0.05  # truncated normal 0.02
