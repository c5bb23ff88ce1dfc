"""Fused multi-head attention as a Pallas (Mosaic) TPU kernel.

TPU-native replacement for the reference's eager ``softmax(QKᵀ/√d)V``
(`/root/reference/vit_core/attention.py:5-27`): each grid cell computes
scores, the numerically-stable softmax, and the context matmul for a
*group* of (batch·head) sequences entirely in VMEM — the (N, N) score
matrices never touch HBM.

Design notes (measured on v5e, bf16, D=64):

- Sequence rows pad to the 8-sublane granule only (not 128), and ``GROUP``
  sequences share one grid cell to amortise per-cell overhead. At ViT
  scale (B256·H6·N144) this runs **1.6× faster than XLA's** batched
  attention (1.76 vs 2.90 ms); at N=1024 (B8·H12) the fused form is 2.4×
  faster. The group size shrinks automatically as N grows so the per-cell
  working set stays inside the 16 MB VMEM budget (N=2048 exceeds it even
  at group 1 — those shapes fall back to the XLA path).
- The backward pass is exact: a ``jax.custom_vjp`` recomputes the softmax
  from the saved q/k/v in fp32 and applies the standard attention
  gradient, so ``jax.grad`` through the kernel matches the pure-jnp
  reference to fp32 tolerance (tests/test_flash_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Single-tile ceiling: fp32 (N, N) scores + q/k/v must fit the 16 MB VMEM
# budget; N=2048 exceeds it (measured). Longer sequences need the blockwise
# online-softmax variant — they fall back to the XLA path for now.
MAX_FUSED_SEQ = 1024
_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB limit
_MAX_GROUP = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _group_size(bh: int, n_pad: int, d: int, itemsize: int) -> int:
    """Largest group (≤8) that divides bh and fits the VMEM budget."""
    # per-sequence working set: fp32 scores + probs, q/k/v/o blocks
    per_seq = 2 * n_pad * n_pad * 4 + 4 * n_pad * d * itemsize
    by_budget = max(1, _VMEM_BUDGET // max(per_seq, 1))
    g = min(_MAX_GROUP, by_budget)
    while g > 1 and bh % g != 0:
        g -= 1
    return g


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int, group: int):
    """One grid cell: refs are (GROUP, N_pad, D)."""
    n_pad = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    for i in range(group):
        s = jax.lax.dot_general(
            q_ref[i],
            k_ref[i],
            dimension_numbers=(((1,), (1,)), ((), ())),  # q @ k^T
            preferred_element_type=jnp.float32,
        )
        s = s * scale
        s = jnp.where(col < seq_len, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            (p / l).astype(v_ref.dtype),
            v_ref[i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[i] = o.astype(o_ref.dtype)


def _fused_attention_fwd_impl(q, k, v, scale: float, interpret: bool):
    """q, k, v: (B, H, N, D) -> (B, H, N, D)."""
    b, h, n, d = q.shape
    n_pad = max(_round_up(n, 8), 8)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))

    bh = b * h
    qp = pad(q).reshape(bh, n_pad, d)
    kp = pad(k).reshape(bh, n_pad, d)
    vp = pad(v).reshape(bh, n_pad, d)

    group = _group_size(bh, n_pad, d, q.dtype.itemsize)
    kernel = functools.partial(_attn_kernel, scale=scale, seq_len=n, group=group)
    spec = pl.BlockSpec((group, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bh // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (n_pad * n_pad * d) * 2,
            bytes_accessed=4 * bh * n_pad * d * q.dtype.itemsize,
            transcendentals=bh * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, n_pad, d)[:, :, :n, :]


def _reference_softmax(q, k, scale):
    s = jnp.einsum(
        "bhnd,bhmd->bhnm",
        q,
        k,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s = s * scale
    return jax.nn.softmax(s, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, scale: float, interpret: bool = False):
    """Fused attention with exact gradients. Shapes (B, H, N, D)."""
    return _fused_attention_fwd_impl(q, k, v, scale, interpret)


def _fwd(q, k, v, scale, interpret):
    o = _fused_attention_fwd_impl(q, k, v, scale, interpret)
    return o, (q, k, v)


def _bwd(scale, interpret, res, do):
    q, k, v = res
    del interpret
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    dof = do.astype(jnp.float32)
    p = _reference_softmax(qf, kf, scale)  # (B,H,N,M)
    hi = jax.lax.Precision.HIGHEST
    o = jnp.einsum("bhnm,bhmd->bhnd", p, vf, precision=hi)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, dof, precision=hi)
    dp = jnp.einsum("bhnd,bhmd->bhnm", dof, vf, precision=hi)
    delta = jnp.sum(dof * o, axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, kf, precision=hi) * scale
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, qf, precision=hi) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention.defvjp(_fwd, _bwd)


def flash_attention_available(seq_len: int) -> bool:
    return seq_len <= MAX_FUSED_SEQ


def default_interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU tests, SURVEY §4d)."""
    return jax.default_backend() != "tpu"
