"""Checkpointing: Orbax pytrees + JSON metadata, and a torch ``.pth``
importer for parity against reference checkpoints.

Checkpoint surface parity with the reference
(`/root/reference/utils/trainers/base_trainer.py:97-118`): each checkpoint
is ``{epoch, model_state, optimizer_state, best_*, config}``, written as
``best_model`` / ``last_model``. The config is embedded (load-bearing: the
visualizers rebuild models from it —
`scripts/simmim_visualizer.py:59-62`). Orbax stores the array pytrees
(sharding-aware, multi-host safe); epoch/best/config go in a JSON sidecar.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import numpy as np
import orbax.checkpoint as ocp

_META_FILE = "metadata.json"
_TREE_DIR = "tree"


def save_checkpoint(path: str, tree: Any, metadata: Dict[str, Any]) -> None:
    """Atomic-ish save: write to <path>.tmp then swap."""
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ocp.PyTreeCheckpointer().save(
        os.path.join(os.path.abspath(tmp), _TREE_DIR), tree
    )
    with open(os.path.join(tmp, _META_FILE), "w") as f:
        json.dump(metadata, f, indent=1, default=str)
    shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)


def load_checkpoint(
    path: str, template: Optional[Any] = None
) -> Tuple[Any, Dict[str, Any]]:
    """Restore (tree, metadata). With ``template``, array dtypes/shardings
    and pytree structure are validated against it."""
    tree_path = os.path.join(os.path.abspath(path), _TREE_DIR)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        tree = ckptr.restore(tree_path, item=template)
    else:
        tree = ckptr.restore(tree_path)
    meta_path = os.path.join(path, _META_FILE)
    metadata: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return tree, metadata


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, _META_FILE))


# ---------------------------------------------------------------------------
# torch .pth import (reference-checkpoint parity testing)
# ---------------------------------------------------------------------------


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``best_model.pth``-style checkpoint into numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state_dict", ckpt)
    out = {}
    for k, v in state.items():
        # torch.compile prefixes
        k = k.replace("_orig_mod.", "")
        out[k] = v.detach().cpu().numpy()
    return out


def _encoder_block_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """One reference EncoderBlock (`vit_core/encoder_block.py`) → our params."""
    def lin_kernel(name):
        return _t(sd[f"{prefix}.{name}.weight"]).T

    return {
        "self_attention": {
            "w_query": {"kernel": lin_kernel("self_attention.w_query")},
            "w_key": {"kernel": lin_kernel("self_attention.w_key")},
            "w_value": {"kernel": lin_kernel("self_attention.w_value")},
            "final_linear": {"kernel": lin_kernel("self_attention.final_linear")},
        },
        "feed_forward": {
            "w1": lin_kernel("feed_forward.linear_in"),
            "b1": _t(sd[f"{prefix}.feed_forward.linear_in.bias"]),
            "w2": lin_kernel("feed_forward.linear_out"),
            "b2": _t(sd[f"{prefix}.feed_forward.linear_out.bias"]),
        },
        "layer_norm1": {
            "scale": _t(sd[f"{prefix}.layer_norm1.weight"]),
            "bias": _t(sd[f"{prefix}.layer_norm1.bias"]),
        },
        "layer_norm2": {
            "scale": _t(sd[f"{prefix}.layer_norm2.weight"]),
            "bias": _t(sd[f"{prefix}.layer_norm2.bias"]),
        },
    }


def _count_blocks(sd: Dict[str, np.ndarray], prefix: str = "encoder_blocks") -> int:
    idxs = set()
    for k in sd:
        if f"{prefix}." in k:
            after = k.split(f"{prefix}.")[1]
            idxs.add(int(after.split(".")[0]))
    return max(idxs) + 1 if idxs else 0


def vit_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference supervised ViT state_dict → our flax params."""
    params = {
        "patch_embedding": {
            "conv": {
                "kernel": _t(sd["patch_embedding.conv.weight"]).transpose(2, 3, 1, 0),
                "bias": _t(sd["patch_embedding.conv.bias"]),
            },
            "cls_token": _t(sd["patch_embedding.cls_token"]),
            "positional_embedding": _t(sd["patch_embedding.positional_embedding"]),
        },
        "classification_head": {
            "norm": {
                "scale": _t(sd["classification_head.norm.weight"]),
                "bias": _t(sd["classification_head.norm.bias"]),
            },
            "linear": {
                "kernel": _t(sd["classification_head.linear.weight"]).T,
                "bias": _t(sd["classification_head.linear.bias"]),
            },
        },
    }
    for i in range(_count_blocks(sd)):
        params[f"encoder_blocks_{i}"] = _encoder_block_from_torch(
            sd, f"encoder_blocks.{i}"
        )
    return params


def simmim_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    params = {
        "projection": {
            "kernel": _t(sd["projection.weight"]).T,
            "bias": _t(sd["projection.bias"]),
        },
        "mask_token": _t(sd["mask_token"]),
        "positional_embedding": _t(sd["positional_embedding"]),
        "simmim_head": {
            "kernel": _t(sd["simmim_head.weight"]).T,
            "bias": _t(sd["simmim_head.bias"]),
        },
    }
    for i in range(_count_blocks(sd)):
        params[f"encoder_blocks_{i}"] = _encoder_block_from_torch(
            sd, f"encoder_blocks.{i}"
        )
    return params


def _dino_backbone_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    out = {
        "patch_embedding": {
            "proj": {
                "kernel": _t(sd[f"{prefix}.patch_embedding.proj.weight"]).transpose(
                    2, 3, 1, 0
                ),
                "bias": _t(sd[f"{prefix}.patch_embedding.proj.bias"]),
            },
            "cls_token": _t(sd[f"{prefix}.patch_embedding.cls_token"]),
            "positional_embedding": _t(
                sd[f"{prefix}.patch_embedding.positional_embedding"]
            ),
        }
    }
    for i in range(_count_blocks(sd, f"{prefix}.encoder_blocks")):
        out[f"encoder_blocks_{i}"] = _encoder_block_from_torch(
            sd, f"{prefix}.encoder_blocks.{i}"
        )
    return out


def _dino_head_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    def lin(name):
        return {
            "kernel": _t(sd[f"{prefix}.mlp.{name}.weight"]).T,
            "bias": _t(sd[f"{prefix}.mlp.{name}.bias"]),
        }

    return {
        "mlp_0": lin("0"),
        "mlp_2": lin("2"),
        "mlp_4": lin("4"),
        "fully_connected": {
            # torch weight_norm: original0 = g (out, 1), original1 = v (out, in)
            "g": _t(sd[f"{prefix}.fully_connected.parametrizations.weight.original0"])[
                :, 0
            ],
            "v": _t(
                sd[f"{prefix}.fully_connected.parametrizations.weight.original1"]
            ).T,
            "bias": _t(sd[f"{prefix}.fully_connected.bias"]),
        },
    }


def dino_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference DINOViT state_dict → {student, teacher, center} pytrees."""
    return {
        "student": {
            "backbone": _dino_backbone_from_torch(sd, "student_backbone"),
            "head": _dino_head_from_torch(sd, "student_head"),
        },
        "teacher": {
            "backbone": _dino_backbone_from_torch(sd, "teacher_backbone"),
            "head": _dino_head_from_torch(sd, "teacher_head"),
        },
        "center": _t(sd["center"]),
    }


# ---------------------------------------------------------------------------
# torch .pth export (migration back to the reference framework)
# ---------------------------------------------------------------------------


def _unroll_for_export(params: Dict) -> Dict:
    """Torch export works on the unrolled ``encoder_blocks_{i}`` layout; a
    ``model.scan_layers`` checkpoint carries one stacked ``encoder_scan``
    subtree instead, which the per-block exporters below would silently
    skip (0 encoder keys). Unstack it first."""
    from ..ops.encoder_stack import SCAN_MODULE, unroll_scanned_tree

    if SCAN_MODULE in params:
        return unroll_scanned_tree(params)
    return params


def _our_block_count(params: Dict) -> int:
    if "encoder_scan" in params:
        raise ValueError(
            "params carry a scanned 'encoder_scan' subtree; call "
            "ops.encoder_stack.unroll_scanned_tree before exporting"
        )
    return sum(1 for k in params if str(k).startswith("encoder_blocks_"))


def _encoder_block_to_torch(block: Dict, prefix: str) -> Dict[str, np.ndarray]:
    """Inverse of :func:`_encoder_block_from_torch`."""
    if "moe" in block:
        raise ValueError(
            f"{prefix} is a Mixture-of-Experts block (model.moe_experts > "
            "0); the reference ViT has no MoE counterpart, so only dense "
            "models export to the torch layout"
        )
    sd = {}
    att = block["self_attention"]
    for name in ("w_query", "w_key", "w_value", "final_linear"):
        sd[f"{prefix}.self_attention.{name}.weight"] = _t(att[name]["kernel"]).T
    ff = block["feed_forward"]
    sd[f"{prefix}.feed_forward.linear_in.weight"] = _t(ff["w1"]).T
    sd[f"{prefix}.feed_forward.linear_in.bias"] = _t(ff["b1"])
    sd[f"{prefix}.feed_forward.linear_out.weight"] = _t(ff["w2"]).T
    sd[f"{prefix}.feed_forward.linear_out.bias"] = _t(ff["b2"])
    for ln in ("layer_norm1", "layer_norm2"):
        sd[f"{prefix}.{ln}.weight"] = _t(block[ln]["scale"])
        sd[f"{prefix}.{ln}.bias"] = _t(block[ln]["bias"])
    return sd


def vit_params_to_torch(params: Dict) -> Dict[str, np.ndarray]:
    """Our supervised ViT params → a reference-layout state_dict (numpy).

    Loads into `/root/reference/vit_core/vit.py::ViT` with ``strict=True``
    (round-trip tested in tests/test_checkpoint.py). Scanned
    (``model.scan_layers``) checkpoints are unstacked first."""
    params = _unroll_for_export(params)
    pe = params["patch_embedding"]
    head = params["classification_head"]
    sd = {
        "patch_embedding.conv.weight": _t(pe["conv"]["kernel"]).transpose(3, 2, 0, 1),
        "patch_embedding.conv.bias": _t(pe["conv"]["bias"]),
        "patch_embedding.cls_token": _t(pe["cls_token"]),
        "patch_embedding.positional_embedding": _t(pe["positional_embedding"]),
        "classification_head.norm.weight": _t(head["norm"]["scale"]),
        "classification_head.norm.bias": _t(head["norm"]["bias"]),
        "classification_head.linear.weight": _t(head["linear"]["kernel"]).T,
        "classification_head.linear.bias": _t(head["linear"]["bias"]),
    }
    for i in range(_our_block_count(params)):
        sd.update(
            _encoder_block_to_torch(
                params[f"encoder_blocks_{i}"], f"encoder_blocks.{i}"
            )
        )
    return sd


def simmim_params_to_torch(params: Dict) -> Dict[str, np.ndarray]:
    params = _unroll_for_export(params)
    sd = {
        "projection.weight": _t(params["projection"]["kernel"]).T,
        "projection.bias": _t(params["projection"]["bias"]),
        "mask_token": _t(params["mask_token"]),
        "positional_embedding": _t(params["positional_embedding"]),
        "simmim_head.weight": _t(params["simmim_head"]["kernel"]).T,
        "simmim_head.bias": _t(params["simmim_head"]["bias"]),
    }
    for i in range(_our_block_count(params)):
        sd.update(
            _encoder_block_to_torch(
                params[f"encoder_blocks_{i}"], f"encoder_blocks.{i}"
            )
        )
    return sd


def _dino_backbone_to_torch(backbone: Dict, prefix: str) -> Dict[str, np.ndarray]:
    backbone = _unroll_for_export(backbone)
    pe = backbone["patch_embedding"]
    sd = {
        f"{prefix}.patch_embedding.proj.weight": _t(pe["proj"]["kernel"]).transpose(
            3, 2, 0, 1
        ),
        f"{prefix}.patch_embedding.proj.bias": _t(pe["proj"]["bias"]),
        f"{prefix}.patch_embedding.cls_token": _t(pe["cls_token"]),
        f"{prefix}.patch_embedding.positional_embedding": _t(
            pe["positional_embedding"]
        ),
    }
    for i in range(_our_block_count(backbone)):
        sd.update(
            _encoder_block_to_torch(
                backbone[f"encoder_blocks_{i}"], f"{prefix}.encoder_blocks.{i}"
            )
        )
    return sd


def _dino_head_to_torch(head: Dict, prefix: str) -> Dict[str, np.ndarray]:
    sd = {}
    for ours, theirs in (("mlp_0", "0"), ("mlp_2", "2"), ("mlp_4", "4")):
        sd[f"{prefix}.mlp.{theirs}.weight"] = _t(head[ours]["kernel"]).T
        sd[f"{prefix}.mlp.{theirs}.bias"] = _t(head[ours]["bias"])
    fc = head["fully_connected"]
    sd[f"{prefix}.fully_connected.parametrizations.weight.original0"] = _t(
        fc["g"]
    ).reshape(-1, 1)
    sd[f"{prefix}.fully_connected.parametrizations.weight.original1"] = _t(fc["v"]).T
    sd[f"{prefix}.fully_connected.bias"] = _t(fc["bias"])
    return sd


def dino_params_to_torch(
    student: Dict, teacher: Dict, center: np.ndarray
) -> Dict[str, np.ndarray]:
    """Our DINO state trees → a reference DINOViT-layout state_dict."""
    sd = {}
    sd.update(_dino_backbone_to_torch(student["backbone"], "student_backbone"))
    sd.update(_dino_head_to_torch(student["head"], "student_head"))
    sd.update(_dino_backbone_to_torch(teacher["backbone"], "teacher_backbone"))
    sd.update(_dino_head_to_torch(teacher["head"], "teacher_head"))
    sd["center"] = _t(center)
    return sd


def save_torch_checkpoint(
    path: str, state_dict: Dict[str, np.ndarray],
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a reference-compatible ``.pth`` (torch.save of
    ``{model_state_dict, **metadata}``) so reference tooling — its
    evaluators, its visualizers, plain ``torch.load`` — can consume models
    trained here."""
    import torch

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "model_state_dict": {
            k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, np.float32)))
            for k, v in state_dict.items()
        }
    }
    payload.update(metadata or {})
    torch.save(payload, path)
