"""Model factory + checkpoint surgery.

`build_model` parity (`/root/reference/utils/model_builder.py:104-184`):
mode-keyed construction (supervised/finetune → ViT, simmim → SimMIMViT,
dino/eval_dino → DINO), finetune loads pretrained weights (+ optional
freeze + verification), eval_dino loads ``best_model`` from the experiment
dir. Instead of ``torch.compile``, models are compiled by the jitted train
steps that consume them.

`load_weights` parity (`model_builder.py:11-89`): exact-match copy,
``projection.* → patch_embedding.projection.*`` remap, SimMIM pos-embed
(N) padded into the finetune pos-embed (N+1, CLS slot zeroed), SSL-only
keys skipped (``simmim_head | mask_token | teacher.* | center``). Note the
reference transfers *nothing* from a DINO checkpoint into a finetune ViT —
its key prefixes never match (SURVEY.md §2.4); set
``training.extended_transfer: true`` for a real DINO→ViT backbone transfer
(teacher backbone, proj→conv, pos-embed interpolation), an intentional
improvement over the reference, off by default for behavior parity.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from .dino import DINONetwork
from .simmim import SimMIMViT
from .vit import ViT

logger = logging.getLogger(__name__)


def _dtype_from_config(config):
    name = str(config.get("model", {}).get("compute_dtype", "float32")).lower()
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def _common_kwargs(config) -> Dict[str, Any]:
    model = config["model"]
    return dict(
        input_shape=(
            int(model["in_channels"]),
            int(config["data"]["img_size"]),
            int(config["data"]["img_size"]),
        ),
        patch_size=int(model["patch_size"]),
        embed_dim=int(model["embed_dim"]),
        num_blocks=int(model["num_blocks"]),
        num_heads=int(model["num_heads"]),
        mlp_dim=int(model["mlp_dim"]),
        dropout=float(model["dropout"]),
        dtype=_dtype_from_config(config),
        use_flash=bool(model.get("use_flash_attention", True)),
        use_fused_mlp=bool(model.get("use_fused_mlp", False)),
        fast_dropout=bool(model.get("fast_dropout", True)),
        init_scheme=str(model.get("init_scheme", "reference")),
        matmul_precision=str(model.get("matmul_precision", "default")),
        remat=bool(config.get("parallel", {}).get("remat", False)),
        scan_layers=bool(model.get("scan_layers", False)),
    )


@dataclass
class ModelBundle:
    mode: str
    module: Any
    init_fn: Callable[[jax.Array], Dict[str, Any]]
    config: Any = None
    pretrained: Optional[Dict[str, Any]] = None  # loaded ckpt trees (finetune/eval)


def build_model(config) -> ModelBundle:
    mode = config.get("training", {}).get("type", None) or config.get("eval", {}).get(
        "mode", None
    )
    if mode is None:
        raise ValueError(
            "Could not determine mode. Set either 'training.type' or 'eval.mode'."
        )
    if isinstance(mode, (list, tuple)):
        mode = mode[0]
    mode = str(mode).lower()
    logger.info("Building model for mode: '%s'", mode)

    kwargs = _common_kwargs(config)
    img = kwargs["input_shape"][1]

    if mode in ("supervised", "finetune"):
        model_cfg = config["model"]
        module = ViT(
            num_classes=int(model_cfg["num_classes"]),
            patch_dropout=float(model_cfg.get("patch_dropout", 0.0)),
            # MoE FFN (TPU-native addition, ops/moe.py): 0 = dense reference ViT
            moe_experts=int(model_cfg.get("moe_experts", 0) or 0),
            moe_every=int(model_cfg.get("moe_every", 2) or 2),
            moe_top_k=int(model_cfg.get("moe_top_k", 2) or 2),
            moe_capacity_factor=float(model_cfg.get("moe_capacity_factor", 1.25)),
            moe_group_size=int(model_cfg.get("moe_group_size", 0) or 0),
            moe_aux_weight=float(model_cfg.get("moe_aux_weight", 0.01)),
            moe_zloss_weight=float(model_cfg.get("moe_zloss_weight", 1e-3)),
            moe_router_noise=float(model_cfg.get("moe_router_noise", 0.0)),
            **kwargs,
        )

        def init_fn(rng):
            dummy = jnp.zeros((1, img, img, kwargs["input_shape"][0]))
            return {"params": module.init(rng, dummy)["params"]}

    elif mode == "simmim":
        module = SimMIMViT(mask_ratio=float(config["model"]["mask_ratio"]), **kwargs)

        def init_fn(rng):
            p_rng, m_rng = jax.random.split(rng)
            dummy = jnp.zeros((1, img, img, kwargs["input_shape"][0]))
            variables = module.init({"params": p_rng, "mask": m_rng}, dummy)
            return {"params": variables["params"]}

    elif mode in ("dino", "eval_dino"):
        module = DINONetwork(
            output_dim=int(config["model"]["output_dim"]), **kwargs
        )

        def init_fn(rng):
            dummy = jnp.zeros((1, img, img, kwargs["input_shape"][0]))
            student = module.init(rng, dummy)["params"]
            # teacher starts as an exact copy of the student
            # (`model.py:64-79`: deepcopied backbone, state-dict-copied head).
            # A materialised copy (not an alias) — the jitted step donates the
            # state, and XLA rejects donating one buffer twice.
            teacher = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), student)
            center = jnp.zeros((1, int(config["model"]["output_dim"])), jnp.float32)
            return {"params": student, "teacher_params": teacher, "center": center}

    else:
        raise ValueError(f"Unknown model-building mode: {mode}")

    bundle = ModelBundle(mode=mode, module=module, init_fn=init_fn, config=config)

    if mode == "finetune":
        bundle.pretrained = _load_pretrained_tree(
            config["training"]["pretrained_path"]
        )
    elif mode == "eval_dino":
        exp = config["eval"]["experiment_path"]
        bundle.pretrained = _load_pretrained_tree(os.path.join(exp, "best_model"))
    return bundle


def _load_pretrained_tree(path: str) -> Dict[str, Any]:
    """Load a checkpoint (ours or a torch .pth) into flat numpy trees."""
    from ..utils import checkpoint as ckpt_utils

    if path.endswith((".pth", ".pt")):
        sd = ckpt_utils.load_torch_state_dict(path)
        if any(k.startswith("teacher_backbone.") for k in sd):
            trees = ckpt_utils.dino_params_from_torch(sd)
            return {
                "params": trees["student"],
                "teacher_params": trees["teacher"],
                "center": trees["center"],
            }
        if "mask_token" in sd:
            return {"params": ckpt_utils.simmim_params_from_torch(sd)}
        return {"params": ckpt_utils.vit_params_from_torch(sd)}
    if not ckpt_utils.checkpoint_exists(path):
        raise FileNotFoundError(f"Checkpoint file not found: {path}")
    tree, _meta = ckpt_utils.load_checkpoint(path)
    return tree


# ---------------------------------------------------------------------------
# Checkpoint surgery (`load_weights` parity) — operates on param pytrees
# ---------------------------------------------------------------------------


def _flat(tree) -> Dict[str, np.ndarray]:
    return {
        ".".join(map(str, k)): np.asarray(v)
        for k, v in traverse_util.flatten_dict(tree).items()
    }


def _unflat(flat: Dict[str, np.ndarray]):
    return traverse_util.unflatten_dict(
        {tuple(k.split(".")): jnp.asarray(v) for k, v in flat.items()}
    )


def load_weights(target_params, pretrained_params, extended: bool = False):
    """Cross-model weight transfer with the reference's rules
    (`model_builder.py:42-85`). Returns updated target params."""
    tgt = _flat(target_params)
    src = _flat(pretrained_params)
    src = _align_stack_convention(src, tgt)
    out = dict(tgt)
    used = set()
    upcycle_keys = _moe_upcycle_sources(tgt)

    for k, v in src.items():
        if k in tgt:
            if v.shape == tgt[k].shape:
                out[k] = v
                used.add(k)
            else:
                logger.warning(
                    "Shape mismatch for '%s': pretrained %s vs model %s",
                    k, v.shape, tgt[k].shape,
                )
        elif k.startswith("projection.") and f"patch_embedding.{k}" in tgt:
            new_key = f"patch_embedding.{k}"
            if v.shape == tgt[new_key].shape:
                out[new_key] = v
                used.add(k)
                logger.info("Remapped key '%s' to '%s'", k, new_key)
        elif (
            k == "positional_embedding"
            and "patch_embedding.positional_embedding" in tgt
        ):
            ft_pe = tgt["patch_embedding.positional_embedding"]
            if v.shape[1] == ft_pe.shape[1] - 1 and v.shape[2] == ft_pe.shape[2]:
                logger.info("Padding positional embedding (CLS slot zeroed)")
                new_pe = np.zeros_like(ft_pe)
                new_pe[:, 1:, :] = v
                out["patch_embedding.positional_embedding"] = new_pe
                used.add(k)
            else:
                logger.warning(
                    "Cannot pad positional_embedding: %s vs %s", v.shape, ft_pe.shape
                )
        elif (
            "simmim_head" in k
            or "mask_token" in k
            or k.startswith("teacher.")
            or k.startswith("center")
        ):
            logger.info("Skipping SSL-specific key: %s", k)
        elif k in upcycle_keys:
            pass  # consumed by _upcycle_moe below — not a missing key
        else:
            logger.warning("Key '%s' from checkpoint not found in the model.", k)

    if extended:
        out = _extended_transfer(out, src, tgt)
    out = _upcycle_moe(out, src, tgt, extended=extended)
    updated = sum(1 for k in tgt if out[k] is not tgt[k])
    logger.info("load_weights: %d/%d target tensors updated", updated, len(tgt))
    return _unflat(out)


def _align_stack_convention(src, tgt):
    """Convert the checkpoint's encoder-stack convention to the target's
    (``encoder_blocks_{i}.*`` unrolled ↔ ``encoder_scan.block.*`` stacked,
    ops/encoder_stack.py) so ``model.scan_layers`` checkpoints port both
    ways, including under DINO/teacher prefixes."""
    from ..ops import encoder_stack as es

    if es.flat_has_scanned(tgt) and es.flat_has_unrolled(src):
        logger.info("load_weights: stacking unrolled encoder blocks "
                    "(checkpoint) into the scanned layout (model)")
        return es.flat_to_scanned(src)
    if es.flat_has_unrolled(tgt) and es.flat_has_scanned(src):
        logger.info("load_weights: unstacking scanned encoder blocks "
                    "(checkpoint) into the unrolled layout (model)")
        return es.flat_to_unrolled(src)
    return src


def _moe_upcycle_sources(tgt):
    """Dense-FFN checkpoint keys that :func:`_upcycle_moe` consumes for
    this target (used to suppress the 'key not found' warning for them)."""
    keys = set()
    for k in tgt:
        parts = k.split(".")
        if len(parts) >= 3 and parts[-2] == "moe" and parts[-1] in (
            "w1", "b1", "w2", "b2"
        ):
            keys.add(".".join(parts[:-2]) + f".feed_forward.{parts[-1]}")
    return keys


def _upcycle_moe(out, src, tgt, extended: bool = False):
    """Sparse upcycling (Komatsuzaki et al., arXiv:2212.05055): when the
    target block is a MoE FFN (``….moe.w1`` (E, d, f)) and the checkpoint
    carries the dense FFN for the same block (``….feed_forward.w1``
    (d, f)), every expert initializes to a copy of the dense MLP; the
    router keeps its fresh init. With normalized top-k gates the upcycled
    network's forward equals the dense network's exactly at init (the
    gates form a convex combination of identical experts), so finetuning
    starts from the pretrained model's function, not from scratch.
    With ``extended`` the dense FFN is also found under the SSL backbone
    prefixes (``teacher.backbone.`` etc.), so DINO/SimMIM →
    MoE-finetune upcycles too. TPU-native addition — the reference has
    neither MoE nor this transfer."""
    prefixes = [""]
    if extended:
        prefixes += ["teacher.backbone.", "teacher_params.backbone.",
                     "backbone."]
    for k, v in tgt.items():
        parts = k.split(".")
        if len(parts) < 3 or parts[-2] != "moe":
            continue
        name = parts[-1]
        if name not in ("w1", "b1", "w2", "b2"):
            continue  # router stays fresh
        dense_key = ".".join(parts[:-2]) + f".feed_forward.{name}"
        dv = None
        for p in prefixes:
            dv = src.get(p + dense_key)
            if dv is not None:
                break
        if dv is None:
            if name == "w1":
                logger.warning(
                    "MoE upcycle: no dense FFN found for '%s' — experts "
                    "keep their fresh init", ".".join(parts[:-1]),
                )
            continue
        if dv.shape != v.shape[1:]:
            logger.warning(
                "MoE upcycle: dense '%s' %s does not match expert slice "
                "of '%s' %s", dense_key, dv.shape, k, v.shape,
            )
            continue
        out[k] = np.broadcast_to(dv, v.shape).copy()
        if name == "w1":
            logger.info(
                "Upcycled dense FFN '%s' into %d experts of '%s'",
                ".".join(parts[:-2]) + ".feed_forward", v.shape[0],
                ".".join(parts[:-1]),
            )
    return out


def _extended_transfer(out, src, tgt):
    """DINO/SimMIM backbone → supervised ViT transfer the reference cannot
    do (its key prefixes never match): teacher backbone encoder blocks +
    patch embed (conv kernels are layout-compatible), plus SimMIM Dense
    projection reshaped into the conv tokenizer kernel."""
    # DINO teacher backbone → ViT
    candidates = {}
    for prefix in ("teacher.backbone.", "teacher_params.backbone.", "backbone."):
        candidates = {k: v for k, v in src.items() if k.startswith(prefix)}
        if candidates:
            break
    for k, v in candidates.items():
        stripped = k[len(prefix):]
        mapped = stripped.replace("patch_embedding.proj.", "patch_embedding.conv.")
        if mapped in tgt and v.shape == tgt[mapped].shape:
            out[mapped] = v
        elif mapped.endswith("positional_embedding") and mapped in tgt:
            tgt_pe = tgt[mapped]
            if v.shape[1] != tgt_pe.shape[1]:
                out[mapped] = _interp_pos_embed(v, tgt_pe.shape)

    # SimMIM projection (Dense (C·p², D)) → ViT conv kernel (p, p, C, D)
    if "projection.kernel" in src and "patch_embedding.conv.kernel" in tgt:
        conv_shape = tgt["patch_embedding.conv.kernel"].shape  # (p, p, C, D)
        p, _, c, d = conv_shape
        flat_kernel = src["projection.kernel"]
        if flat_kernel.shape == (c * p * p, d):
            out["patch_embedding.conv.kernel"] = (
                flat_kernel.reshape(c, p, p, d).transpose(1, 2, 0, 3)
            )
            if "projection.bias" in src:
                out["patch_embedding.conv.bias"] = src["projection.bias"]
    return out


def _interp_pos_embed(src_pe: np.ndarray, tgt_shape) -> np.ndarray:
    """Bicubic grid interpolation, CLS slot carried over."""
    d = src_pe.shape[-1]
    src_n = src_pe.shape[1] - 1
    tgt_n = tgt_shape[1] - 1
    src_g = int(round(src_n**0.5))
    tgt_g = int(round(tgt_n**0.5))
    grid = src_pe[:, 1:].reshape(1, src_g, src_g, d)
    resized = jax.image.resize(grid, (1, tgt_g, tgt_g, d), method="bicubic")
    return np.concatenate(
        [np.asarray(src_pe[:, :1]), np.asarray(resized).reshape(1, tgt_n, d)], axis=1
    )


# ---------------------------------------------------------------------------
# Backbone freeze (`freeze_backbone`, `model_builder.py:92-101`)
# ---------------------------------------------------------------------------


def freeze_backbone_mask(params) -> Any:
    """Trainable mask: False for encoder blocks and patch embedding
    (except the CLS token), True elsewhere."""
    flat = traverse_util.flatten_dict(params)
    mask = {}
    for key in flat:
        path = ".".join(map(str, key))
        frozen = path.startswith(("encoder_blocks", "encoder_scan")) or (
            path.startswith("patch_embedding") and "cls_token" not in path
        )
        mask[key] = not frozen
    return traverse_util.unflatten_dict(mask)


def all_trainable_mask(params) -> Any:
    return jax.tree_util.tree_map(lambda _: True, params)


def check_loaded_model(params, pretrained_params) -> Dict[str, int]:
    """Post-load verification (`model_builder.py:187-228`): count exact
    matches between the live params and the checkpoint."""
    live = _flat(params)
    pre = _flat(pretrained_params)
    matched = mismatched = 0
    for k, v in live.items():
        if k in pre and pre[k].shape == v.shape:
            if np.allclose(v, pre[k], atol=1e-5):
                matched += 1
            else:
                mismatched += 1
    logger.info("Matched parameters from checkpoint: %d", matched)
    if mismatched:
        logger.warning("Mismatched parameters: %d", mismatched)
    return {"matched": matched, "mismatched": mismatched}
