"""Pipeline-parallel model routing (`parallel.pp`).

The reference has no parallelism (SURVEY.md §2.6). Here every model's
forward decomposes as ``embed → encoder stack → finish`` (methods on the
flax modules, see models/), and with ``parallel.pp > 1`` the middle part
routes through the GPipe schedule of :mod:`.pipeline`: the stacked
encoder-block parameters shard over the ``'pipe'`` mesh axis, microbatches
flow stage-to-stage via ``ppermute``, and autodiff yields the backward
pipeline.

Integration point: :func:`maybe_pipelined` wraps the flax module in a
:class:`PipelinedModel` proxy whose ``.apply`` matches the call signatures
the compiled train steps use (train/steps.py), so the step code is
untouched — ``BaseTrainer`` wraps ``self.model`` before building steps.
Embed/finish run replicated across the pipe axis (they are a small
fraction of the FLOPs); only the encoder stack is pipelined.

Dropout under pipelining: flax's per-module RNG folding can't cross the
``shard_map`` stage boundary, so block dropout keys derive from the step's
dropout rng folded with (layer index, microbatch index) — a different,
equally independent stream than the unpipelined path (RNG streams carry
no parity obligation; numerics tests run at dropout 0).
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import EncoderBlock
from .mesh import PIPE_AXIS
from .pipeline import pipeline_apply, pipeline_bubble_fraction, stack_block_params

logger = logging.getLogger(__name__)


def _block_module(model) -> nn.Module:
    """A standalone EncoderBlock matching the model's stack hyperparams
    (applied per-stage with the stacked layer params)."""
    block_cls = EncoderBlock
    if getattr(model, "remat", False):
        block_cls = nn.remat(EncoderBlock, static_argnums=(2, 3))
    return block_cls(
        d_model=model.embed_dim,
        num_heads=model.num_heads,
        mlp_dim=model.mlp_dim,
        dropout=model.dropout,
        dtype=model.dtype,
        param_dtype=model.param_dtype,
        use_flash=model.use_flash,
        use_fused_mlp=model.use_fused_mlp,
        fast_dropout=model.fast_dropout,
        init_scheme=model.init_scheme,
        matmul_precision=model.matmul_precision,
    )


class PipelinedModel:
    """Drop-in ``.apply`` proxy running the encoder stack as a GPipe
    pipeline over the mesh's ``'pipe'`` axis.

    Supports the three model families' step-call signatures:

    - ``ViT``:        ``apply(vars, x, deterministic, rngs)`` → logits
    - ``DINONetwork``: same → head outputs
    - ``SimMIMViT``:  same (+'mask' rng) → (preds, targets, mask)

    Attribute access falls through to the wrapped module, so code reading
    model hyperparameters (or calling other methods via ``.apply(...,
    method=...)``, e.g. the evaluators' ``inference_forward``) keeps
    working — only the *training* forward is rerouted.
    """

    def __init__(self, module: nn.Module, mesh, num_microbatches: int = 0,
                 interleave: int = 1):
        pp = int(mesh.shape.get(PIPE_AXIS, 1))
        interleave = int(interleave or 1)
        blocks_owner = getattr(module, "backbone", module)
        num_blocks = int(blocks_owner.num_blocks)
        if num_blocks % (pp * interleave) != 0:
            raise ValueError(
                f"parallel.pp={pp} × parallel.pp_interleave={interleave} "
                f"must divide model.num_blocks={num_blocks} (each device "
                "owns pp_interleave equal chunks of encoder blocks)"
            )
        if interleave > 1 and (num_microbatches or pp) < pp:
            raise ValueError(
                f"parallel.pp_interleave={interleave} needs "
                f"pp_microbatches >= pp ({pp})"
            )
        object.__setattr__(self, "_module", module)
        object.__setattr__(self, "_mesh", mesh)
        object.__setattr__(self, "_m", int(num_microbatches))
        object.__setattr__(self, "_v", interleave)
        object.__setattr__(self, "_block", _block_module(blocks_owner))
        object.__setattr__(self, "_num_blocks", num_blocks)
        object.__setattr__(
            self, "_blocks_nested", getattr(module, "backbone", None) is not None
        )
        logger.info(
            "Pipeline parallelism: %d stages x %d blocks/stage%s, "
            "microbatches=%s, bubble fraction=%.3f",
            pp, num_blocks // pp,
            f" (interleave {interleave}: {interleave} virtual chunks of "
            f"{num_blocks // (pp * interleave)} blocks per device)"
            if interleave > 1 else "",
            num_microbatches or pp,
            pipeline_bubble_fraction(pp, num_microbatches, interleave),
        )

    def __getattr__(self, name: str) -> Any:
        return getattr(object.__getattribute__(self, "_module"), name)

    # -- the rerouted forward ---------------------------------------------
    def _encode_pipelined(
        self, params, tokens, deterministic: bool, dropout_rng
    ) -> jnp.ndarray:
        block_parent = params["backbone"] if self._blocks_nested else params
        stacked = stack_block_params(
            block_parent, self._num_blocks, mesh=self._mesh
        )
        layer_idx = jnp.arange(self._num_blocks, dtype=jnp.int32)
        carry = {"params": stacked, "idx": layer_idx}
        use_dropout = (
            not deterministic
            and float(self._module_dropout()) > 0.0
            and dropout_rng is not None
        )

        def block_fn(layer_carry, h, tick):
            rngs = {}
            if use_dropout:
                key = jax.random.fold_in(dropout_rng, layer_carry["idx"])
                key = jax.random.fold_in(key, tick)
                rngs = {"dropout": key}
            return self._block.apply(
                {"params": layer_carry["params"]}, h, deterministic, False,
                rngs=rngs,
            )

        return pipeline_apply(
            block_fn, carry, tokens, self._mesh, num_microbatches=self._m,
            interleave=self._v,
        )

    def _module_dropout(self) -> float:
        owner = getattr(self._module, "backbone", self._module)
        return float(owner.dropout)

    def apply(self, variables, x, deterministic: bool = True, rngs=None,
              **kwargs):
        module = self._module
        if kwargs.get("method") is not None or kwargs.get("mask") is not None:
            # non-training entry points (visualizers inject masks / call
            # inference methods) — use the plain module
            return module.apply(
                variables, x, deterministic, rngs=rngs or {}, **kwargs
            )
        rngs = dict(rngs or {})
        params = variables["params"]
        dropout_rng = rngs.get("dropout")

        from ..models.simmim import SimMIMViT

        if isinstance(module, SimMIMViT):
            tokens, patches, bool_mask = module.apply(
                variables, x, method="embed_masked", rngs=rngs
            )
            tokens = self._encode_pipelined(
                params, tokens, deterministic, dropout_rng
            )
            preds = module.apply(variables, tokens, method="predict")
            return preds, patches, bool_mask

        # ViT / DINONetwork: embed → pipeline → finish
        tokens = module.apply(
            variables, x, deterministic, method="embed", rngs=rngs
        )
        tokens = self._encode_pipelined(
            params, tokens, deterministic, dropout_rng
        )
        return module.apply(variables, tokens, method="finish", rngs=rngs)


def maybe_pipelined(module: nn.Module, mesh, config=None):
    """Wrap ``module`` for pipeline execution when the mesh has a
    ``'pipe'`` axis of size > 1; otherwise return it unchanged."""
    if mesh is None or int(mesh.shape.get(PIPE_AXIS, 1)) <= 1:
        return module
    if int(mesh.shape.get("seq", 1)) > 1:
        # the pipelined encoder runs inside shard_map (manual axes), where
        # the sp dispatch in MultiHeadAttention deliberately disables
        # itself (nested shard_map over a different mesh is invalid) —
        # numerics stay correct (tokens replicate over 'seq') but the seq
        # devices do redundant work. Loud, never silent.
        logger.warning(
            "parallel.pp combined with parallel.sp: ring attention cannot "
            "run inside pipeline stages; the 'seq' axis devices replicate "
            "the stage compute. Use pp with dp/tp instead."
        )
    m, v = 0, 1
    if config is not None:
        par = config.get("parallel", {}) or {}
        m = int(par.get("pp_microbatches", 0) or 0)
        v = int(par.get("pp_interleave", 1) or 1)
    return PipelinedModel(module, mesh, num_microbatches=m, interleave=v)


__all__ = ["PipelinedModel", "maybe_pipelined"]
