"""Scanned encoder stack (``model.scan_layers``, ops/encoder_stack.py).

Covers the feature's verification claims: unrolled-vs-scanned forward and
gradient parity, the flat-converter round-trip (including DINO teacher
prefixes), ``load_weights`` porting checkpoints in both directions, remat,
torch export of a scanned tree (unstacked automatically), and the schema
rejections (moe/pp/tp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ssl_tpu.config.schemas import ConfigValidationError, validate_train_config
from vit_ssl_tpu.models import ViT
from vit_ssl_tpu.models.builder import _flat, _unflat, load_weights
from vit_ssl_tpu.ops import encoder_stack as es
from vit_ssl_tpu.utils import checkpoint as ckpt_utils

BLOCKS = 3


def _vit(scan_layers: bool, **kw):
    defaults = dict(
        num_classes=5,
        num_blocks=BLOCKS,
        input_shape=(3, 32, 32),
        embed_dim=48,
        patch_size=8,
        num_heads=4,
        mlp_dim=96,
        dropout=0.1,
        use_flash=False,
        use_fused_mlp=False,
        scan_layers=scan_layers,
    )
    defaults.update(kw)
    return ViT(**defaults)


@pytest.fixture(scope="module")
def unrolled():
    model = _vit(False)
    x = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params


@pytest.fixture(scope="module")
def scanned_params(unrolled):
    _, params = unrolled
    return _unflat(es.flat_to_scanned(_flat(params)))


def test_scanned_param_tree_structure(scanned_params):
    model = _vit(True)
    x = jnp.ones((2, 32, 32, 3))
    ref = model.init(jax.random.PRNGKey(0), x)["params"]
    ref_flat, conv_flat = _flat(ref), _flat(scanned_params)
    assert set(ref_flat) == set(conv_flat)
    for k in ref_flat:
        assert ref_flat[k].shape == conv_flat[k].shape, k
    # stacked leaves carry the layer dim first
    assert conv_flat[
        "encoder_scan.block.self_attention.w_query.kernel"
    ].shape[0] == BLOCKS


def test_forward_parity_unrolled_vs_scanned(unrolled, scanned_params):
    model_u, params_u = unrolled
    model_s = _vit(True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out_u = model_u.apply({"params": params_u}, x)
    out_s = model_s.apply({"params": scanned_params}, x)
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_s), rtol=1e-5, atol=1e-5
    )


def test_gradient_parity_unrolled_vs_scanned(unrolled, scanned_params):
    model_u, params_u = unrolled
    model_s = _vit(True)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))

    def loss_u(p):
        return jnp.sum(model_u.apply({"params": p}, x) ** 2)

    def loss_s(p):
        return jnp.sum(model_s.apply({"params": p}, x) ** 2)

    gu = _flat(jax.grad(loss_u)(params_u))
    gs = _flat(jax.grad(loss_s)(scanned_params))
    # compare per-layer slices of the stacked grads to the unrolled grads
    gs_unrolled = es.flat_to_unrolled(gs)
    assert set(gu) == set(gs_unrolled)
    for k in gu:
        np.testing.assert_allclose(
            gu[k], gs_unrolled[k], rtol=2e-4, atol=2e-5, err_msg=k
        )


def test_remat_scanned_forward_matches(unrolled, scanned_params):
    model_u, _ = unrolled
    model_r = _vit(True, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    out_u = model_u.apply({"params": unrolled[1]}, x)
    out_r = model_r.apply({"params": scanned_params}, x)
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_r), rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------------------
# Converters
# ---------------------------------------------------------------------------


def test_converter_round_trip(unrolled):
    flat = _flat(unrolled[1])
    back = es.flat_to_unrolled(es.flat_to_scanned(flat))
    assert set(back) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(back[k], flat[k])


def test_converter_dino_teacher_prefixes():
    flat = {}
    for pre in ("student_params.backbone.", "teacher_params.backbone."):
        for i in range(2):
            flat[f"{pre}encoder_blocks_{i}.ff.w"] = np.full((3,), i, np.float32)
        flat[f"{pre}patch_embedding.cls_token"] = np.zeros((1, 1, 3), np.float32)
    scanned = es.flat_to_scanned(flat)
    assert (
        "student_params.backbone.encoder_scan.block.ff.w" in scanned
        and "teacher_params.backbone.encoder_scan.block.ff.w" in scanned
    )
    assert scanned["teacher_params.backbone.encoder_scan.block.ff.w"].shape == (2, 3)
    back = es.flat_to_unrolled(scanned)
    assert set(back) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(back[k], flat[k])


def test_converter_rejects_non_contiguous_blocks():
    flat = {
        "encoder_blocks_0.w": np.zeros(2),
        "encoder_blocks_2.w": np.zeros(2),
    }
    with pytest.raises(ValueError, match="non-contiguous"):
        es.flat_to_scanned(flat)


def test_unrolled_regex_anchored_to_path_component():
    # a module merely containing the substring must NOT trigger conversion
    flat = {"my_encoder_blocks_0.x": np.zeros(2)}
    assert not es.flat_has_unrolled(flat)
    converted = es.flat_to_scanned(flat)
    assert set(converted) == {"my_encoder_blocks_0.x"}


def test_unroll_scanned_tree(scanned_params):
    out = es.unroll_scanned_tree(scanned_params)
    assert es.SCAN_MODULE not in out
    assert {f"encoder_blocks_{i}" for i in range(BLOCKS)} <= set(out)


# ---------------------------------------------------------------------------
# load_weights both directions
# ---------------------------------------------------------------------------


def test_load_weights_unrolled_ckpt_into_scanned_model(unrolled, scanned_params):
    target = jax.tree_util.tree_map(jnp.zeros_like, scanned_params)
    out = load_weights(target, unrolled[1])
    out_flat, want_flat = _flat(out), _flat(scanned_params)
    assert set(out_flat) == set(want_flat)
    for k in want_flat:
        np.testing.assert_array_equal(out_flat[k], want_flat[k], err_msg=k)


def test_load_weights_scanned_ckpt_into_unrolled_model(unrolled, scanned_params):
    target = jax.tree_util.tree_map(jnp.zeros_like, unrolled[1])
    out = load_weights(target, scanned_params)
    out_flat, want_flat = _flat(out), _flat(unrolled[1])
    assert set(out_flat) == set(want_flat)
    for k in want_flat:
        np.testing.assert_array_equal(out_flat[k], want_flat[k], err_msg=k)


# ---------------------------------------------------------------------------
# torch export of a scanned checkpoint
# ---------------------------------------------------------------------------


def test_torch_export_unstacks_scanned_tree(unrolled, scanned_params):
    sd_scanned = ckpt_utils.vit_params_to_torch(scanned_params)
    sd_unrolled = ckpt_utils.vit_params_to_torch(unrolled[1])
    assert set(sd_scanned) == set(sd_unrolled)
    assert any(k.startswith("encoder_blocks.2.") for k in sd_scanned)
    for k in sd_unrolled:
        np.testing.assert_array_equal(sd_scanned[k], sd_unrolled[k], err_msg=k)


def test_block_count_raises_on_scanned_tree(scanned_params):
    with pytest.raises(ValueError, match="encoder_scan"):
        ckpt_utils._our_block_count(scanned_params)


# ---------------------------------------------------------------------------
# Schema rejections
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "override",
    [
        {"model": {"moe_experts": 4}},
        {"parallel": {"pp": 2}},
        {"parallel": {"tp": 2}},
    ],
)
def test_schema_rejects_scan_layers_combos(override):
    from vit_ssl_tpu.config.compose import compose
    from pathlib import Path

    cfg = compose(str(Path(__file__).parent.parent / "configs"), "supervised")
    cfg["model"]["scan_layers"] = True
    for section, patch in override.items():
        for k, v in patch.items():
            cfg[section][k] = v
    with pytest.raises(ConfigValidationError, match="scan_layers"):
        validate_train_config(cfg)


def test_return_attn_rejected_when_scanned(scanned_params):
    model = _vit(True)
    x = jnp.ones((2, 32, 32, 3))
    with pytest.raises(ValueError, match="return_attn"):
        model.apply({"params": scanned_params}, x, return_attn=True)
