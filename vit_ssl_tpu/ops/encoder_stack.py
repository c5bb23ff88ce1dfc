"""Scanned (layer-stacked) encoder: ``nn.scan`` over homogeneous blocks.

TPU-native addition (no reference counterpart — `/root/reference/vit_core/
vit.py:20-28` unrolls a torch ModuleList): with ``model.scan_layers=true``
the N encoder blocks become ONE block body scanned over a stacked
``(N, ...)`` parameter tree via ``flax.linen.scan`` / ``lax.scan``. XLA
traces and compiles the block once instead of N times, cutting
trace+lower+compile time roughly by depth — the dominant cost for deep
models through a remote-compile tunnel — and shrinking the HLO program;
the runtime math is the same op sequence as the unrolled stack (verified
to float tolerance in ``tests/test_scan_layers.py``).

Behavioral divergences (documented per repo convention):

- the parameter tree changes: ``encoder_blocks_{i}/...`` (N subtrees) →
  ``encoder_scan/block/...`` (one subtree with a leading layer dim).
  :func:`flat_to_scanned` / :func:`flat_to_unrolled` convert between the
  conventions; ``models.builder.load_weights`` applies them automatically
  so checkpoints port both ways, and the torch exporter unstacks first.
- per-layer attention maps are unavailable (``return_attn`` needs the
  unrolled stack — the scanned body is one program for all layers).
- dropout RNG streams differ from the unrolled model (``nn.scan`` folds
  the ``dropout`` rng per layer instead of drawing N independent
  ``make_rng`` calls), so training trajectories are not bit-equal to
  ``scan_layers=false`` — the dropout distribution is identical.
- init draws each layer from a per-layer fold of the ``params`` rng
  (``split_rngs``): independent per-block init like the unrolled model
  in distribution, not bit-for-bit.

Composition: dp / FSDP (shape-generic shardings apply to the stacked
leaves) and ring attention compose; ``parallel.tp`` (path-pattern rules
written for the unrolled tree) and ``parallel.pp`` (the pipeline already
scans its own stacked params) are rejected at config validation, as is
MoE (heterogeneous blocks).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from .encoder_block import EncoderBlock

SCAN_MODULE = "encoder_scan"
_SCANNED_MARK = f"{SCAN_MODULE}.block."
# Anchored to a path-component boundary: the prefix must be empty or end
# with '.', so a module merely *containing* the substring (e.g.
# "my_encoder_blocks_0.x") never triggers whole-dict conversion.
_UNROLLED_RE = re.compile(r"^((?:[^.]+\.)*)encoder_blocks_(\d+)\.(.+)$")


class _ScanCell(nn.Module):
    """One scan step: ``carry -> EncoderBlock(carry)``. ``deterministic``
    and ``block_size`` ride as broadcast (static) scan inputs."""

    cfg: FrozenDict
    remat: bool = False

    @nn.compact
    def __call__(self, x, deterministic, block_size):
        cls = EncoderBlock
        if self.remat:
            cls = nn.remat(EncoderBlock, static_argnums=(2, 3, 4))
        x = cls(name="block", **self.cfg)(x, deterministic, False, block_size)
        return x, None


def scanned_encoder(
    num_blocks: int,
    block_kwargs: Dict[str, Any],
    remat: bool = False,
    name: str = SCAN_MODULE,
):
    """A module whose ``__call__(x, deterministic, block_size)`` runs
    ``num_blocks`` identical :class:`EncoderBlock`\\ s as one
    ``lax.scan`` over stacked params. Returns ``(x, None)``."""
    scan_cls = nn.scan(
        _ScanCell,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(nn.broadcast, nn.broadcast),
        length=num_blocks,
    )
    return scan_cls(cfg=FrozenDict(block_kwargs), remat=remat, name=name)


# ---------------------------------------------------------------------------
# Parameter-convention converters (flat "a.b.c" numpy dicts, prefix-aware:
# they also convert under e.g. "teacher_params.backbone." for DINO trees)
# ---------------------------------------------------------------------------


def flat_has_scanned(flat: Dict[str, Any]) -> bool:
    return any(_SCANNED_MARK in k for k in flat)


def flat_has_unrolled(flat: Dict[str, Any]) -> bool:
    return any(_UNROLLED_RE.match(k) for k in flat)


def flat_to_scanned(flat: Dict[str, Any]) -> Dict[str, Any]:
    """``{pre}encoder_blocks_{i}.{rest}`` → ``{pre}encoder_scan.block.{rest}``
    with the per-block leaves stacked on a new leading layer dim."""
    groups: Dict[tuple, Dict[int, Any]] = {}
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        m = _UNROLLED_RE.match(k)
        if m:
            key = (m.group(1), m.group(3))
            groups.setdefault(key, {})[int(m.group(2))] = v
        else:
            out[k] = v
    for (pre, rest), by_i in groups.items():
        idxs = sorted(by_i)
        if idxs != list(range(len(idxs))):
            raise ValueError(
                f"non-contiguous encoder block indices under '{pre}': {idxs}"
            )
        out[f"{pre}{_SCANNED_MARK}{rest}"] = np.stack(
            [np.asarray(by_i[i]) for i in idxs]
        )
    return out


def flat_to_unrolled(flat: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`flat_to_scanned` (layer count comes from the
    leading dim of each stacked leaf)."""
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        if _SCANNED_MARK in k:
            pre, rest = k.split(_SCANNED_MARK, 1)
            arr = np.asarray(v)
            for i in range(arr.shape[0]):
                out[f"{pre}encoder_blocks_{i}.{rest}"] = arr[i]
        else:
            out[k] = v
    return out


def unroll_scanned_tree(params: Dict[str, Any]) -> Dict[str, Any]:
    """Tree-level inverse for export paths: if ``params`` carries an
    ``encoder_scan`` subtree, replace it with ``encoder_blocks_{i}``
    subtrees (numpy leaves). Other keys pass through unchanged."""
    if SCAN_MODULE not in params:
        return params
    import jax

    out = {k: v for k, v in dict(params).items() if k != SCAN_MODULE}
    stacked = params[SCAN_MODULE]["block"]
    leaves = jax.tree_util.tree_leaves(stacked)
    num_blocks = int(np.asarray(leaves[0]).shape[0])
    for i in range(num_blocks):
        out[f"encoder_blocks_{i}"] = jax.tree_util.tree_map(
            lambda x, i=i: np.asarray(x)[i], stacked
        )
    return out
