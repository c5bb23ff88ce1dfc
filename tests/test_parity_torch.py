"""Numerical parity against the PyTorch reference (the BASELINE.json
requirement: "matching reference checkpoints' logits and attention maps to
fp32 tolerance").

The read-only reference at /root/reference is imported as the *oracle*:
reference models are randomly initialised in torch, their state dicts are
imported through our torch-checkpoint importer, and the forward outputs are
compared. Skipped when the reference tree is not mounted.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    # append (not prepend): the reference tree has generic top-level module
    # names (train.py, utils/, data/) that must not shadow ours
    sys.path.append(REFERENCE)

vit_core = pytest.importorskip("vit_core", reason="reference repo not mounted")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vit_ssl_tpu.models import DINONetwork, SimMIMViT, ViT  # noqa: E402
from vit_ssl_tpu.utils.checkpoint import (  # noqa: E402
    dino_params_from_torch,
    simmim_params_from_torch,
    vit_params_from_torch,
)

D, HEADS, FF, BLOCKS = 32, 4, 64, 2
IMG, PATCH, CLASSES = 32, 8, 5


def _to_nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x_nchw.transpose(0, 2, 3, 1))


@pytest.fixture(scope="module")
def image_batch():
    rs = np.random.RandomState(0)
    return rs.rand(3, 3, IMG, IMG).astype(np.float32)


def test_vit_logits_parity(image_batch):
    from vit_core.vit import ViT as RefViT

    torch.manual_seed(0)
    ref = RefViT(
        num_classes=CLASSES, num_blocks=BLOCKS, input_shape=(3, IMG, IMG),
        embed_dim=D, patch_size=PATCH, num_heads=HEADS, mlp_dim=FF, dropout=0.1,
    )
    ref.eval()
    with torch.no_grad():
        ref_logits, ref_attn = ref(torch.from_numpy(image_batch), return_attn=True)

    params = vit_params_from_torch(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    ours = ViT(
        num_classes=CLASSES, num_blocks=BLOCKS, input_shape=(3, IMG, IMG),
        embed_dim=D, patch_size=PATCH, num_heads=HEADS, mlp_dim=FF, dropout=0.1,
        use_flash=False, use_fused_mlp=False,
    )
    logits, attn = ours.apply(
        {"params": params}, jnp.asarray(_to_nhwc(image_batch)), return_attn=True
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(attn), ref_attn.numpy(), atol=2e-5, rtol=1e-4
    )


def test_vit_logits_parity_with_kernels(image_batch):
    """Same comparison through the Pallas kernel paths (interpret mode)."""
    from vit_core.vit import ViT as RefViT

    torch.manual_seed(1)
    ref = RefViT(
        num_classes=CLASSES, num_blocks=1, input_shape=(3, IMG, IMG),
        embed_dim=D, patch_size=PATCH, num_heads=HEADS, mlp_dim=FF, dropout=0.1,
    )
    ref.eval()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(image_batch))

    params = vit_params_from_torch({k: v.numpy() for k, v in ref.state_dict().items()})
    ours = ViT(
        num_classes=CLASSES, num_blocks=1, input_shape=(3, IMG, IMG),
        embed_dim=D, patch_size=PATCH, num_heads=HEADS, mlp_dim=FF, dropout=0.1,
        use_flash=True, use_fused_mlp=True,
    )
    logits = ours.apply({"params": params}, jnp.asarray(_to_nhwc(image_batch)))
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), atol=5e-5, rtol=5e-4
    )


def test_simmim_inference_parity(image_batch):
    from vit_core.ssl.simmim.model import SimMIMViT as RefSimMIM

    torch.manual_seed(2)
    ref = RefSimMIM(
        num_blocks=BLOCKS, input_shape=(3, IMG, IMG), embed_dim=D,
        patch_size=PATCH, num_heads=HEADS, mlp_dim=FF, dropout=0.1, mask_ratio=0.5,
    )
    ref.eval()
    with torch.no_grad():
        ref_feats = ref.inference_forward(torch.from_numpy(image_batch))

    params = simmim_params_from_torch(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    ours = SimMIMViT(
        num_blocks=BLOCKS, input_shape=(3, IMG, IMG), embed_dim=D,
        patch_size=PATCH, num_heads=HEADS, mlp_dim=FF, dropout=0.1, mask_ratio=0.5,
        use_flash=False, use_fused_mlp=False,
    )
    feats = ours.apply(
        {"params": params},
        jnp.asarray(_to_nhwc(image_batch)),
        method=ours.inference_forward,
    )
    np.testing.assert_allclose(
        np.asarray(feats), ref_feats.numpy(), atol=2e-5, rtol=1e-4
    )


def test_dino_teacher_features_parity(image_batch):
    from vit_core.ssl.dino.model import DINOViT as RefDINO

    torch.manual_seed(3)
    ref = RefDINO(
        num_blocks=BLOCKS, input_shape=(3, IMG, IMG), embed_dim=D,
        patch_size=PATCH, num_heads=HEADS, mlp_dim=FF, dropout=0.1,
        output_dim=64, center_momentum=0.9,
    )
    ref.eval()
    with torch.no_grad():
        ref_feats = ref.inference_forward(
            torch.from_numpy(image_batch), return_features=True
        )
        ref_head_out = ref.inference_forward(torch.from_numpy(image_batch))

    trees = dino_params_from_torch({k: v.numpy() for k, v in ref.state_dict().items()})
    ours = DINONetwork(
        num_blocks=BLOCKS, input_shape=(3, IMG, IMG), embed_dim=D,
        patch_size=PATCH, num_heads=HEADS, mlp_dim=FF, dropout=0.1, output_dim=64,
        use_flash=False, use_fused_mlp=False,
    )
    x = jnp.asarray(_to_nhwc(image_batch))
    feats = ours.apply({"params": trees["teacher"]}, x, method=ours.features)
    np.testing.assert_allclose(
        np.asarray(feats), ref_feats.numpy(), atol=2e-5, rtol=1e-4
    )
    head_out = ours.apply({"params": trees["teacher"]}, x)
    np.testing.assert_allclose(
        np.asarray(head_out), ref_head_out.numpy(), atol=5e-5, rtol=1e-3
    )


def test_dino_student_multicrop_parity(image_batch):
    """Student forward on a different (local) crop size — exercises the
    dynamic pos-embed interpolation path end to end. torch bicubic and
    jax.image bicubic use different kernel constants (-0.75 vs Keys), so
    this asserts a looser functional tolerance."""
    from vit_core.ssl.dino.model import DINOViT as RefDINO

    torch.manual_seed(4)
    ref = RefDINO(
        num_blocks=1, input_shape=(3, IMG, IMG), embed_dim=D,
        patch_size=PATCH, num_heads=HEADS, mlp_dim=FF, dropout=0.0,
        output_dim=32, center_momentum=0.9,
    )
    ref.eval()
    rs = np.random.RandomState(5)
    local = rs.rand(2, 3, IMG // 2, IMG // 2).astype(np.float32)
    with torch.no_grad():
        ref_out = ref._student_forward(torch.from_numpy(local))

    trees = dino_params_from_torch({k: v.numpy() for k, v in ref.state_dict().items()})
    ours = DINONetwork(
        num_blocks=1, input_shape=(3, IMG, IMG), embed_dim=D,
        patch_size=PATCH, num_heads=HEADS, mlp_dim=FF, dropout=0.0, output_dim=32,
        use_flash=False, use_fused_mlp=False,
    )
    out = ours.apply({"params": trees["student"]}, jnp.asarray(_to_nhwc(local)))
    ref_np = ref_out.numpy()
    # same scale and high correlation despite interpolation-kernel mismatch
    corr = np.corrcoef(np.asarray(out).ravel(), ref_np.ravel())[0, 1]
    assert corr > 0.99, f"correlation {corr}"


def test_vit_gradient_parity(image_batch):
    """Parameter gradients match torch autograd through imported weights:
    catches backward-pass math divergences (GELU variant, LN, softmax-CE)."""
    from vit_core.vit import ViT as RefViT

    torch.manual_seed(7)
    ref = RefViT(
        num_classes=CLASSES, num_blocks=1, input_shape=(3, IMG, IMG),
        embed_dim=D, patch_size=PATCH, num_heads=HEADS, mlp_dim=FF, dropout=0.0,
    )
    ref.eval()
    labels_np = np.array([0, 2, 4])

    logits = ref(torch.from_numpy(image_batch))
    loss = torch.nn.functional.cross_entropy(
        logits, torch.from_numpy(labels_np).long()
    )
    loss.backward()
    ref_grads = {k: p.grad.numpy() for k, p in ref.named_parameters()}

    params = vit_params_from_torch({k: v.numpy() for k, v in ref.state_dict().items()})
    ours = ViT(
        num_classes=CLASSES, num_blocks=1, input_shape=(3, IMG, IMG),
        embed_dim=D, patch_size=PATCH, num_heads=HEADS, mlp_dim=FF, dropout=0.0,
        use_flash=False, use_fused_mlp=False,
    )

    import optax

    def loss_fn(p):
        lg = ours.apply({"params": p}, jnp.asarray(_to_nhwc(image_batch)))
        return optax.softmax_cross_entropy_with_integer_labels(
            lg, jnp.asarray(labels_np)
        ).mean()

    ref_loss = float(loss.detach())
    ours_loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(ours_loss), ref_loss, rtol=1e-5)

    checks = [
        (grads["encoder_blocks_0"]["feed_forward"]["w1"],
         ref_grads["encoder_blocks.0.feed_forward.linear_in.weight"].T),
        (grads["encoder_blocks_0"]["self_attention"]["w_query"]["kernel"],
         ref_grads["encoder_blocks.0.self_attention.w_query.weight"].T),
        (grads["patch_embedding"]["conv"]["kernel"],
         ref_grads["patch_embedding.conv.weight"].transpose(2, 3, 1, 0)),
        (grads["classification_head"]["linear"]["kernel"],
         ref_grads["classification_head.linear.weight"].T),
        (grads["patch_embedding"]["positional_embedding"],
         ref_grads["patch_embedding.positional_embedding"]),
    ]
    for ours_g, ref_g in checks:
        np.testing.assert_allclose(
            np.asarray(ours_g), ref_g, atol=3e-6, rtol=1e-4
        )
