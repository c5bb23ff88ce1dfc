"""Multi-head self-attention.

Functional parity with the reference's attention module
(`/root/reference/vit_core/attention.py:5-106`): per-head Q/K/V linear
projections **without bias**, scale 1/√d_k, softmax, bias-free output
projection. Rebuilt as a Flax module with two execution paths:

- ``fused``: the Pallas kernel in :mod:`.flash_attention` (training hot
  path on TPU — scores never leave VMEM);
- ``xla``: pure jnp einsum formulation (reference math; also the only path
  that can return attention probabilities for the visualizers).

Contract fix vs the reference (SURVEY.md §4 staleness warning): returns a
single array unless ``return_attn=True``, in which case an ``(out, probs)``
tuple is returned.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

logger = logging.getLogger(__name__)

from .flash_attention import (
    attention_nhd,
    attention_nhd_profitable,
    default_interpret,
    flash_attention_available,
    fused_attention,
    fused_attention_profitable,
)
from .flash_blockwise import blockwise_attention
from .initializers import InitScheme
from .precision import resolve_precision


def scaled_dot_product_attention(
    query, key, value, return_attn: bool = False, precision="highest",
    block_size: int = 0,
):
    """Reference-math attention: softmax(QKᵀ/√d_k)V.

    Shapes (..., N, d). fp32 softmax regardless of input dtype (matching
    torch autocast, which computes softmax in fp32). Defaults to
    ``precision="highest"`` because this function doubles as the oracle
    path for kernel-equivalence tests; the model stack threads its own
    ``matmul_precision`` policy through (see :mod:`.precision`).

    ``block_size`` > 0: block-diagonal mask (i attends j iff i//bs ==
    j//bs) — one packed sequence behaves as N/bs independent sequences.
    """
    prec = resolve_precision(precision)
    d_k = query.shape[-1]
    scores = jnp.einsum(
        "...nd,...md->...nm",
        query,
        key,
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    scores = scores / jnp.sqrt(jnp.asarray(d_k, dtype=scores.dtype))
    if block_size:
        n_q, n_k = scores.shape[-2], scores.shape[-1]
        row = jnp.arange(n_q)[:, None] // block_size
        col = jnp.arange(n_k)[None, :] // block_size
        scores = jnp.where(row == col, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum(
        "...nm,...md->...nd",
        probs.astype(value.dtype),
        value,
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(value.dtype)
    if return_attn:
        return context, probs
    return context, None


class MultiHeadAttention(nn.Module):
    """Multi-head self/cross attention with bias-free projections."""

    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = True
    init_scheme: str = "reference"
    matmul_precision: str = "default"

    def setup(self):
        if self.d_model % self.num_heads != 0:
            raise ValueError(
                f"d_model({self.d_model}) must be cleanly divisible by "
                f"num_heads({self.num_heads})!"
            )
        init = InitScheme(self.init_scheme)
        dense = lambda name: nn.Dense(  # noqa: E731
            self.d_model,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=resolve_precision(self.matmul_precision),
            kernel_init=init.linear_kernel(),
            name=name,
        )
        self.w_query = dense("w_query")
        self.w_key = dense("w_key")
        self.w_value = dense("w_value")
        self.final_linear = dense("final_linear")

    def __call__(
        self,
        query: jnp.ndarray,
        key: Optional[jnp.ndarray] = None,
        value: Optional[jnp.ndarray] = None,
        return_attn: bool = False,
        block_size: int = 0,
    ):
        """``block_size`` > 0: block-diagonal attention over a packed
        sequence (each ``block_size`` token span attends only within
        itself) — used to run DINO's small local crops as packed longer
        sequences inside the fused kernel's profitable regime. Supported
        by the NHD kernel and the XLA path; ring attention and the
        long-sequence kernels don't compose with packing (callers pack
        only ViT-scale sequences)."""
        key = query if key is None else key
        value = key if value is None else value

        b, n_q, _ = query.shape
        n_k = key.shape[1]
        d_head = self.d_model // self.num_heads
        scale = 1.0 / float(d_head) ** 0.5

        if not return_attn and not block_size:
            sp_out = self._maybe_ring_attention(
                query, key, value, b, n_q, n_k, d_head, scale
            )
            if sp_out is not None:
                return self.final_linear(sp_out)

        if (
            self.use_flash
            and not return_attn
            and n_q == n_k
            and attention_nhd_profitable(
                n_q, b, self.num_heads, self.d_model,
                jnp.dtype(self.dtype).itemsize,
            )
        ):
            # Hot path: the NHD kernel consumes the projections' native
            # (B, N, H·D) layout and splits heads with in-VMEM lane
            # slices — no transpose/pad/slice ops exist in the HLO
            # (they cost more than the kernel itself; docs/performance.md).
            context = attention_nhd(
                self.w_query(query), self.w_key(key), self.w_value(value),
                self.num_heads, scale, default_interpret(), block_size,
            )
            return self.final_linear(context)

        q = self.w_query(query).reshape(b, n_q, self.num_heads, d_head)
        k = self.w_key(key).reshape(b, n_k, self.num_heads, d_head)
        v = self.w_value(value).reshape(b, n_k, self.num_heads, d_head)
        q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))  # (B,H,N,D)

        probs = None
        if (
            self.use_flash and not return_attn and n_q == n_k
            and not block_size
        ):
            if not flash_attention_available(n_q):
                # long sequences: O(N)-memory blockwise online-softmax
                # kernel with full Pallas backward
                context = blockwise_attention(
                    q, k, v, scale, interpret=default_interpret()
                )
            elif fused_attention_profitable(n_q, b * self.num_heads):
                # ViT-scale sequences with enough batch·head parallelism:
                # grouped single-tile kernel
                context = fused_attention(q, k, v, scale, default_interpret())
            else:
                # tiny N (e.g. DINO 48px locals) / small batches: XLA's
                # batched GEMM is measurably faster — use it (gate
                # rationale in flash_attention.fused_attention_profitable)
                context, _ = scaled_dot_product_attention(
                    q, k, v, False, precision=self.matmul_precision
                )
        else:
            context, probs = scaled_dot_product_attention(
                q, k, v, return_attn, precision=self.matmul_precision,
                block_size=block_size,
            )

        context = context.transpose(0, 2, 1, 3).reshape(b, n_q, self.d_model)
        out = self.final_linear(context)
        if return_attn:
            return out, probs
        return out

    def _maybe_ring_attention(
        self, query, key, value, b, n_q, n_k, d_head, scale
    ) -> Optional[jnp.ndarray]:
        """Sequence-parallel dispatch (``parallel.sp``): when the active
        mesh (``parallel.context``, published by the trainer before step
        compilation) carries a ``'seq'`` axis that divides the sequence
        length, attention runs as ring attention — Q resident per shard,
        K/V rotating over ICI (:mod:`..parallel.ring_attention`). Batch
        and heads additionally shard over the ``'data'`` / ``'model'``
        axes when divisible, so sp composes with dp/tp. Returns ``None``
        (→ single-device paths) when sp is off or the shape doesn't
        divide; the degradation is logged once per shape, never silent.
        """
        from ..parallel import context as parallel_context
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS
        from ..parallel.ring_attention import ring_attention_sharded

        sp = parallel_context.sp_size()
        if sp <= 1 or n_q != n_k:
            return None
        # never dispatch from inside an existing shard_map region (e.g. a
        # pipeline stage, or a user's own shard_map): the nested shard_map
        # would reference a different mesh than the manual context.
        # get_abstract_mesh reflects the tracing context's mesh.
        try:
            from jax.sharding import get_abstract_mesh

            if get_abstract_mesh()._any_axis_manual:
                return None
        except Exception:
            pass
        if n_q % sp != 0:
            key_shape = (n_q, sp)
            if key_shape not in _SP_FALLBACK_WARNED:
                _SP_FALLBACK_WARNED.add(key_shape)
                logger.warning(
                    "parallel.sp=%d does not divide sequence length %d — "
                    "this attention call falls back to the single-device "
                    "path (replicated over the seq axis)", sp, n_q,
                )
            return None
        mesh = parallel_context.current_mesh()
        q = self.w_query(query).reshape(b, n_q, self.num_heads, d_head)
        k = self.w_key(key).reshape(b, n_k, self.num_heads, d_head)
        v = self.w_value(value).reshape(b, n_k, self.num_heads, d_head)
        q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))  # (B,H,N,D)
        dp = int(mesh.shape.get(DATA_AXIS, 1))
        tp = int(mesh.shape.get(MODEL_AXIS, 1))
        batch_axis = DATA_AXIS if (dp > 1 and b % dp == 0) else None
        head_axis = MODEL_AXIS if (tp > 1 and self.num_heads % tp == 0) else None
        context = ring_attention_sharded(
            q, k, v, scale, mesh,
            axis_name=SEQ_AXIS, batch_axis=batch_axis, head_axis=head_axis,
        )
        return context.transpose(0, 2, 1, 3).reshape(b, n_q, self.d_model)


_SP_FALLBACK_WARNED = set()
