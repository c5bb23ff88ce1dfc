"""Mixture-of-Experts feed-forward with expert parallelism.

TPU-native addition with **no reference counterpart** (the reference's
FFN is a single dense MLP, `/root/reference/vit_core/feed_forward.py:7-28`;
SURVEY.md §2.6: no parallelism of any kind). This module scales the ViT
family's FFN capacity the V-MoE way (Riquelme et al., arXiv:2106.05974):
a learned router sends each token to its top-k of E expert MLPs, so
parameter count grows ~E× at ≈constant per-token FLOPs, and the expert
weights shard over a dedicated ``'expert'`` mesh axis (``parallel.ep``) —
the fifth parallelism axis next to dp/tp/pp/sp.

The dispatch is the GShard dense formulation (Lepikhin et al.,
arXiv:2006.16668), the canonical TPU MoE: routing produces a static-shape
``combine`` tensor ``(G, Tg, E, C)`` (C = per-expert capacity per group),
tokens move to expert rows via one einsum, all experts run as one batched
3-D matmul pair (MXU-friendly, no ragged shapes, no host control flow),
and a second einsum combines the weighted expert outputs. Tokens beyond
an expert's capacity are dropped for that expert (their combine weight is
zero; the encoder residual carries them through unchanged — standard MoE
semantics). Priority is slot-major then token-major: every token's first
choice is seated before any token's second choice.

Routing groups (``group_size`` / ``model.moe_group_size``): the dense
dispatch is O(Tg²) per group in both FLOPs and memory (capacity C grows
with group length: ``T·E·C = k·cf·T·Tg`` combine elements), so routing
the whole ``B·N``-token batch as one group — fine at test scale — costs
gigabytes at production batch sizes. GShard/V-MoE route in fixed-size
groups for exactly this reason (GShard §3.2's 2-D ``(G, S)`` layout;
V-MoE inherits it). ``group_size > 0`` reshapes the token stream to
``(G, group_size)`` with independent per-group routing + capacity;
``0`` (default) keeps one global group. Each image's tokens stay
contiguous, so ``group_size = N`` routes per image.

Two standard router losses keep the experts balanced and the logits sane,
sown into the ``'losses'`` collection and added to the training loss by
the supervised step (`train/steps.py`):

- load-balance loss (Switch, arXiv:2101.03961 eq. 4-6):
  ``E · Σ_e f_e · P_e`` where ``f_e`` is the fraction of routing
  assignments to expert e and ``P_e`` the mean router probability; equals
  1.0 under perfectly uniform routing.
- router z-loss (ST-MoE, arXiv:2202.08906): ``mean(logsumexp(logits)²)``
  penalises drifting logit scale.

Routing runs in fp32 (router accuracy matters more than its negligible
FLOPs); expert matmuls run in the model compute dtype.

Expert parallelism: when the trainer's mesh (``parallel.context``) has an
``'expert'`` axis, the expert-major intermediates are sharding-constrained
to it and the expert parameters are placed as ``P('expert', ...)`` by
``parallel/sharding_rules.py``; XLA's GSPMD partitioner turns the
dispatch/combine einsums into the all-to-all pattern over ICI.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from .dropout import keep_mask16
from .fused_mlp import _gelu_exact
from .initializers import InitScheme
from .precision import resolve_precision

EXPERT_AXIS = "expert"


def expert_capacity(
    num_tokens: int, num_experts: int, top_k: int, capacity_factor: float
) -> int:
    """Static per-expert buffer length C.

    ``top_k·T/E`` slots would exactly fit perfectly uniform routing;
    ``capacity_factor`` head-room absorbs imbalance. Rounded up to a
    multiple of 8 (TPU sublane) and capped at T (an expert can never
    receive more than every token once — each token's k choices are
    distinct experts)."""
    c = math.ceil(top_k * num_tokens / num_experts * capacity_factor)
    c = ((c + 7) // 8) * 8
    return max(1, min(num_tokens, c))


def moe_routing(
    router_logits: jnp.ndarray,
    top_k: int,
    capacity: int,
    normalize_gates: bool = True,
) -> Tuple[jnp.ndarray, dict]:
    """Top-k routing with per-expert capacity → dense combine weights.

    Args:
      router_logits: ``(T, E)`` fp32.
      top_k: experts per token.
      capacity: per-expert slot count C (static).
      normalize_gates: rescale each token's kept top-k probabilities to
        sum to 1 (GShard; makes the layer an exact convex combination of
        expert outputs — and exactly a single dense MLP when all experts
        are identical).

    Returns:
      ``(combine, aux)`` — ``combine (T, E, C)`` fp32 weights (zero where
      a token is not seated at that expert/slot), and a dict of fp32
      scalars: ``balance`` / ``zloss`` (definitions in the module
      docstring) plus ``dropped_frac``, the fraction of routing
      assignments that overflowed capacity (observability only).
    """
    t, e = router_logits.shape
    logits = router_logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    gate_vals, gate_idx = jax.lax.top_k(probs, top_k)  # both (T, k)
    if normalize_gates:
        gate_vals = gate_vals / jnp.maximum(
            jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9
        )

    counts = jnp.zeros((e,), jnp.int32)  # seated tokens per expert so far
    combine = jnp.zeros((t, e, capacity), jnp.float32)
    kept_assignments = jnp.int32(0)
    for slot in range(top_k):  # static unroll: top_k is tiny (1 or 2)
        choice = gate_idx[:, slot]  # (T,)
        onehot = jax.nn.one_hot(choice, e, dtype=jnp.int32)  # (T, E)
        # slot position this token would take at its chosen expert:
        # tokens earlier in the flat order (and seats filled by earlier
        # slots) come first
        pos_at = jnp.cumsum(onehot, axis=0) - onehot + counts[None, :]
        pos = jnp.sum(pos_at * onehot, axis=-1)  # (T,)
        keep = pos < capacity
        counts = counts + jnp.sum(onehot * keep[:, None], axis=0)
        kept_assignments = kept_assignments + jnp.sum(keep)
        gate = gate_vals[:, slot] * keep  # dropped ⇒ weight 0
        # one_hot(pos ≥ C) is all-zero, so overflow rows vanish here too
        combine = combine + (
            gate[:, None, None]
            * jax.nn.one_hot(choice, e)[:, :, None]
            * jax.nn.one_hot(pos, capacity)[:, None, :]
        )

    # Switch load-balance loss: f from all top-k assignments (pre-capacity
    # — balancing what the router *wants* keeps the gradient independent
    # of the capacity hyperparameter), P from the full softmax.
    assign_frac = (
        jnp.sum(jax.nn.one_hot(gate_idx, e, dtype=jnp.float32), axis=(0, 1))
        / (t * top_k)
    )
    mean_prob = jnp.mean(probs, axis=0)
    balance = e * jnp.sum(assign_frac * mean_prob)
    zloss = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
    dropped = jnp.clip(
        1.0 - kept_assignments.astype(jnp.float32) / (t * top_k), 0.0, 1.0
    )
    return combine, {"balance": balance, "zloss": zloss, "dropped_frac": dropped}


def _per_expert(base_init):
    """Lift a 2-D kernel initializer to an (E, …) stack with independent
    per-expert draws (flax's fan computation would otherwise fold E into
    fan-in)."""

    def init(key, shape, dtype=jnp.float32):
        keys = jax.random.split(key, shape[0])
        return jnp.stack([base_init(k, shape[1:], dtype) for k in keys])

    return init


class MoEFeedForward(nn.Module):
    """Drop-in FFN replacement: router + E expert MLPs (GShard dispatch).

    Same call contract as :class:`.feed_forward.FeedForwardBlock`
    (``(B, N, d) → (B, N, d)``, ``deterministic`` flag, 'dropout' rng);
    selected per encoder block via ``EncoderBlock.num_experts``.
    """

    d_model: int
    d_ff: int
    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    group_size: int = 0  # routing-group length (0 = one global group)
    aux_weight: float = 0.01  # load-balance loss coefficient
    zloss_weight: float = 1e-3  # router z-loss coefficient
    router_noise: float = 0.0  # train-time logit jitter stddev
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    fast_dropout: bool = True
    init_scheme: str = "reference"
    matmul_precision: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.top_k < 1 or self.top_k > self.num_experts:
            raise ValueError(
                f"moe top_k={self.top_k} must be in [1, num_experts="
                f"{self.num_experts}]"
            )
        init = InitScheme(self.init_scheme)
        e, d, f = self.num_experts, self.d_model, self.d_ff
        # router stays fp32: its FLOPs are negligible, its precision isn't
        router = self.param("router", init.linear_kernel(), (d, e), jnp.float32)
        w1 = self.param(
            "w1", _per_expert(init.linear_kernel()), (e, d, f), self.param_dtype
        )
        b1 = self.param("b1", init.linear_bias(d), (e, f), self.param_dtype)
        w2 = self.param(
            "w2", _per_expert(init.linear_kernel()), (e, f, d), self.param_dtype
        )
        b2 = self.param("b2", init.linear_bias(f), (e, d), self.param_dtype)

        b, n, _ = x.shape
        t = b * n
        if self.group_size > 0:
            if t % self.group_size != 0:
                raise ValueError(
                    f"moe group_size={self.group_size} must divide the "
                    f"token count B·N = {b}·{n} = {t}"
                )
            tg = self.group_size
        else:
            tg = t
        g = t // tg
        flat = x.reshape(g, tg, d)

        logits = jnp.dot(flat.astype(jnp.float32), router)  # (G, Tg, E)
        if not deterministic and self.router_noise > 0.0:
            noise = jax.random.normal(self.make_rng("dropout"), logits.shape)
            logits = logits + noise * self.router_noise

        capacity = expert_capacity(tg, e, self.top_k, self.capacity_factor)
        combine, aux = jax.vmap(
            lambda lg: moe_routing(lg, self.top_k, capacity)
        )(logits)  # combine (G, Tg, E, C); aux leaves (G,)
        aux = jax.tree_util.tree_map(jnp.mean, aux)
        # sown scalars are summed into the training loss by the supervised
        # step; sow() is a no-op when 'losses' is not mutable (eval), and
        # XLA dead-code-eliminates the unused aux math there
        self.sow(
            "losses",
            "moe_aux",
            self.aux_weight * aux["balance"] + self.zloss_weight * aux["zloss"],
            reduce_fn=lambda a, b: a + b,
            init_fn=lambda: jnp.float32(0.0),
        )
        # routing observability (no gradient meaning): the fraction of
        # top-k assignments that overflowed capacity, averaged across MoE
        # blocks by the train step and surfaced as out['moe_dropped_frac']
        self.sow("moe_stats", "dropped_frac", aux["dropped_frac"])

        prec = resolve_precision(self.matmul_precision)
        dispatch = (combine > 0).astype(self.dtype)
        xc = flat.astype(self.dtype)
        w1c, b1c = w1.astype(self.dtype), b1.astype(self.dtype)
        w2c, b2c = w2.astype(self.dtype), b2.astype(self.dtype)

        expert_in = jnp.einsum("gtec,gtd->gecd", dispatch, xc, precision=prec)
        expert_in = self._constrain_expert_major(expert_in)
        h = (
            jnp.einsum("gecd,edf->gecf", expert_in, w1c, precision=prec)
            + b1c[None, :, None, :]
        )
        h = _gelu_exact(h)
        if (not deterministic) and self.dropout > 0.0:
            rng = self.make_rng("dropout")
            keep_prob = 1.0 - self.dropout
            if self.fast_dropout:
                mask = keep_mask16(rng, h.shape, self.dropout)
            else:
                mask = jax.random.bernoulli(rng, keep_prob, h.shape)
            h = jnp.where(mask, h / keep_prob, 0.0).astype(self.dtype)
        out = (
            jnp.einsum("gecf,efd->gecd", h, w2c, precision=prec)
            + b2c[None, :, None, :]
        )
        out = self._constrain_expert_major(out)
        y = jnp.einsum(
            "gtec,gecd->gtd", combine.astype(self.dtype), out, precision=prec
        )
        return y.reshape(b, n, d)

    def _constrain_expert_major(self, arr: jnp.ndarray) -> jnp.ndarray:
        """Pin the expert dim (axis 1 of the (G, E, C, …) intermediates)
        to the mesh's 'expert' axis when the trainer published one —
        GSPMD then partitions the expert matmuls and inserts the
        dispatch/combine all-to-alls."""
        from ..parallel import context as parallel_context

        mesh = parallel_context.current_mesh()
        if mesh is None or int(mesh.shape.get(EXPERT_AXIS, 1)) <= 1:
            return arr
        return jax.lax.with_sharding_constraint(
            arr, NamedSharding(mesh, P(None, EXPERT_AXIS))
        )
