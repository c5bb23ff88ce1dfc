"""Checkpoint tests: orbax roundtrip with metadata, torch .pth import for
all three model families, and load_weights surgery rules.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_ssl_tpu.utils.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)


def test_roundtrip_with_metadata(tmp_path):
    tree = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "step": jnp.asarray(7),
    }
    meta = {"epoch": 3, "config": {"training": {"type": "supervised"}}, "best": 0.5}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree, meta)
    assert checkpoint_exists(path)
    restored, meta2 = load_checkpoint(path, jax.device_get(tree))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))
    assert meta2["epoch"] == 3
    assert meta2["config"]["training"]["type"] == "supervised"


def test_save_overwrites_atomically(tmp_path):
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"x": jnp.zeros(2)}, {"epoch": 1})
    save_checkpoint(path, {"x": jnp.ones(2)}, {"epoch": 2})
    tree, meta = load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(tree["x"]), 1.0)
    assert meta["epoch"] == 2


# --- surgery rules ----------------------------------------------------------


def test_load_weights_exact_and_pad():
    from vit_ssl_tpu.models.builder import load_weights

    target = {
        "patch_embedding": {
            "conv": {"kernel": np.zeros((8, 8, 3, 16))},
            "positional_embedding": np.zeros((1, 5, 16)),
        },
        "encoder_blocks_0": {"layer_norm1": {"scale": np.zeros(16)}},
        "classification_head": {"linear": {"kernel": np.zeros((16, 4))}},
    }
    pretrained = {
        "positional_embedding": np.ones((1, 4, 16)),  # N -> N+1 pad rule
        "encoder_blocks_0": {"layer_norm1": {"scale": np.full(16, 2.0)}},
        "mask_token": np.ones((1, 1, 16)),  # skipped
        "simmim_head": {"kernel": np.ones((16, 192))},  # skipped
    }
    out = load_weights(target, pretrained)
    pe = np.asarray(out["patch_embedding"]["positional_embedding"])
    np.testing.assert_allclose(pe[:, 0, :], 0.0)  # CLS slot zeroed
    np.testing.assert_allclose(pe[:, 1:, :], 1.0)
    np.testing.assert_allclose(
        np.asarray(out["encoder_blocks_0"]["layer_norm1"]["scale"]), 2.0
    )
    # untouched target keys survive
    assert np.asarray(out["classification_head"]["linear"]["kernel"]).sum() == 0


def test_load_weights_shape_mismatch_skipped():
    from vit_ssl_tpu.models.builder import load_weights

    target = {"encoder_blocks_0": {"layer_norm1": {"scale": np.zeros(16)}}}
    pretrained = {"encoder_blocks_0": {"layer_norm1": {"scale": np.ones(8)}}}
    out = load_weights(target, pretrained)
    assert np.asarray(out["encoder_blocks_0"]["layer_norm1"]["scale"]).sum() == 0


def test_freeze_backbone_mask():
    from vit_ssl_tpu.models.builder import freeze_backbone_mask

    params = {
        "patch_embedding": {"conv": {"kernel": np.zeros(1)}, "cls_token": np.zeros(1)},
        "encoder_blocks_0": {"layer_norm1": {"scale": np.zeros(1)}},
        "classification_head": {"linear": {"kernel": np.zeros(1)}},
    }
    mask = freeze_backbone_mask(params)
    assert mask["patch_embedding"]["conv"]["kernel"] is False
    assert mask["patch_embedding"]["cls_token"] is True  # CLS stays trainable
    assert mask["encoder_blocks_0"]["layer_norm1"]["scale"] is False
    assert mask["classification_head"]["linear"]["kernel"] is True


# --- torch import ------------------------------------------------------------

torch = pytest.importorskip("torch")


def _torch_linear_sd(prefix, in_dim, out_dim, rs):
    return {
        f"{prefix}.weight": torch.from_numpy(rs.randn(out_dim, in_dim).astype(np.float32)),
        f"{prefix}.bias": torch.from_numpy(rs.randn(out_dim).astype(np.float32)),
    }


def _torch_block_sd(prefix, d, ff, rs):
    sd = {}
    for name in ("w_query", "w_key", "w_value", "final_linear"):
        sd[f"{prefix}.self_attention.{name}.weight"] = torch.from_numpy(
            rs.randn(d, d).astype(np.float32)
        )
    sd.update(_torch_linear_sd(f"{prefix}.feed_forward.linear_in", d, ff, rs))
    sd.update(_torch_linear_sd(f"{prefix}.feed_forward.linear_out", ff, d, rs))
    for ln in ("layer_norm1", "layer_norm2"):
        sd[f"{prefix}.{ln}.weight"] = torch.ones(d)
        sd[f"{prefix}.{ln}.bias"] = torch.zeros(d)
    return sd


def test_torch_vit_import_structure(tmp_path):
    from vit_ssl_tpu.models import ViT
    from vit_ssl_tpu.utils.checkpoint import load_torch_state_dict, vit_params_from_torch

    rs = np.random.RandomState(0)
    d, ff, patch, img, classes = 16, 32, 8, 16, 4
    sd = {
        "patch_embedding.conv.weight": torch.from_numpy(
            rs.randn(d, 3, patch, patch).astype(np.float32)
        ),
        "patch_embedding.conv.bias": torch.zeros(d),
        "patch_embedding.cls_token": torch.from_numpy(rs.rand(1, 1, d).astype(np.float32)),
        "patch_embedding.positional_embedding": torch.from_numpy(
            rs.rand(1, (img // patch) ** 2 + 1, d).astype(np.float32)
        ),
        "classification_head.norm.weight": torch.ones(d),
        "classification_head.norm.bias": torch.zeros(d),
    }
    sd.update(_torch_block_sd("encoder_blocks.0", d, ff, rs))
    sd.update(_torch_linear_sd("classification_head.linear", d, classes, rs))

    path = str(tmp_path / "ref.pth")
    torch.save({"model_state_dict": sd, "epoch": 1}, path)

    params = vit_params_from_torch(load_torch_state_dict(path))
    model = ViT(
        num_classes=classes, num_blocks=1, input_shape=(3, img, img), embed_dim=d,
        patch_size=patch, num_heads=4, mlp_dim=ff, dropout=0.0,
        use_flash=False, use_fused_mlp=False,
    )
    x = jnp.asarray(rs.randn(2, img, img, 3).astype(np.float32))
    logits = model.apply({"params": params}, x)
    assert logits.shape == (2, classes)
    assert np.isfinite(np.asarray(logits)).all()
    # conv kernel transposed correctly
    np.testing.assert_allclose(
        np.asarray(params["patch_embedding"]["conv"]["kernel"])[0, 0, 0, :],
        sd["patch_embedding.conv.weight"].numpy()[:, 0, 0, 0],
    )


class TestTorchExport:
    """Reference-compatible .pth export: round-trips through our importers
    and loads into the actual reference modules with strict=True."""

    def test_vit_roundtrip_and_strict_load(self, tmp_path):
        import sys

        import jax
        import jax.numpy as jnp
        import numpy as np
        import pytest

        torch = pytest.importorskip("torch")
        sys.path.insert(0, "/root/reference")
        from vit_core.vit import ViT as RefViT

        from vit_ssl_tpu.models import ViT
        from vit_ssl_tpu.utils.checkpoint import (
            load_torch_state_dict,
            save_torch_checkpoint,
            vit_params_from_torch,
            vit_params_to_torch,
        )

        ours = ViT(
            num_classes=4, num_blocks=2, input_shape=(3, 32, 32), embed_dim=32,
            patch_size=8, num_heads=2, mlp_dim=64, dropout=0.0,
            use_flash=False, use_fused_mlp=False,
        )
        params = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
        sd = vit_params_to_torch(params)
        path = str(tmp_path / "export.pth")
        save_torch_checkpoint(path, sd, {"epoch": 3})

        # (a) strict load into the reference module
        ref = RefViT(
            num_classes=4, num_blocks=2, input_shape=(3, 32, 32), embed_dim=32,
            patch_size=8, num_heads=2, mlp_dim=64, dropout=0.0,
        )
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        assert ckpt["epoch"] == 3
        ref.load_state_dict(ckpt["model_state_dict"], strict=True)
        ref.eval()

        # (b) forward parity through the exported weights
        x = np.random.RandomState(0).rand(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            ref_logits = ref(torch.from_numpy(x)).numpy()
        j_logits = ours.apply(
            {"params": params},
            jnp.asarray(np.ascontiguousarray(x.transpose(0, 2, 3, 1))),
        )
        np.testing.assert_allclose(
            np.asarray(j_logits), ref_logits, atol=2e-5, rtol=1e-4
        )

        # (c) import(export(params)) == params
        from flax import traverse_util

        back = vit_params_from_torch(load_torch_state_dict(path))
        flat_a = traverse_util.flatten_dict(params)
        flat_b = traverse_util.flatten_dict(back)
        assert set(flat_a) == set(flat_b)
        for key in flat_a:
            np.testing.assert_allclose(
                np.asarray(flat_a[key]), np.asarray(flat_b[key]), atol=1e-7
            )

    def test_dino_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import numpy as np
        import pytest

        pytest.importorskip("torch")
        from vit_ssl_tpu.models import DINONetwork
        from vit_ssl_tpu.utils.checkpoint import (
            dino_params_from_torch,
            dino_params_to_torch,
            load_torch_state_dict,
            save_torch_checkpoint,
        )

        model = DINONetwork(
            num_blocks=1, input_shape=(3, 16, 16), embed_dim=32, patch_size=8,
            num_heads=2, mlp_dim=64, output_dim=16,
            use_flash=False, use_fused_mlp=False,
        )
        student = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
        teacher = jax.tree_util.tree_map(lambda x: x + 0.5, student)
        center = np.random.RandomState(0).rand(1, 16).astype(np.float32)

        sd = dino_params_to_torch(student, teacher, center)
        path = str(tmp_path / "dino.pth")
        save_torch_checkpoint(path, sd)
        trees = dino_params_from_torch(load_torch_state_dict(path))
        for tree, ref in (
            (trees["student"], student), (trees["teacher"], teacher),
        ):
            for a, b in zip(
                jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(ref)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-7
                )
        np.testing.assert_allclose(trees["center"], center, atol=1e-7)

    def test_simmim_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import numpy as np
        import pytest

        pytest.importorskip("torch")
        from vit_ssl_tpu.models import SimMIMViT
        from vit_ssl_tpu.utils.checkpoint import (
            load_torch_state_dict,
            save_torch_checkpoint,
            simmim_params_from_torch,
            simmim_params_to_torch,
        )

        model = SimMIMViT(
            num_blocks=1, input_shape=(3, 16, 16), embed_dim=32, patch_size=8,
            num_heads=2, mlp_dim=64, mask_ratio=0.5,
            use_flash=False, use_fused_mlp=False,
        )
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            jnp.zeros((1, 16, 16, 3)),
        )["params"]
        path = str(tmp_path / "simmim.pth")
        save_torch_checkpoint(path, simmim_params_to_torch(params))
        back = simmim_params_from_torch(load_torch_state_dict(path))
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
