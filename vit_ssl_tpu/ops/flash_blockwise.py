"""Blockwise flash attention (online softmax, O(N) memory) with a full
Pallas backward pass.

This is the long-sequence complement to the single-tile grouped kernel in
:mod:`.flash_attention` (SURVEY.md §5: "sequence scaling comes from the
Pallas flash-attention kernel (blockwise softmax, O(N) memory)"). The
single-tile kernel needs the whole (N, N) score matrix in VMEM and tops
out at N=1024; this variant streams key/value blocks with the standard
online-softmax recurrence, so N is bounded by HBM, not VMEM.

Forward: grid (batch·heads, q_blocks); an fori_loop over k blocks keeps
running max ``m``, normaliser ``l``, and unnormalised accumulator in VMEM
scratch; the log-sum-exp is written out for the backward.

Block sizes default to a measured cost model (``_pick_block``): larger
square blocks run up to 2.3× the per-FLOP throughput (v5e sweep,
scripts/blockwise_tune.py) but pad N to a block multiple and compute the
padding, so the auto choice minimises padded-FLOPs/throughput. Scope
note: each grid cell keeps the full K/V row pair resident in VMEM, which
caps N at roughly 20k tokens (bf16, D=64) on a 16 MB-VMEM chip; past
that, sequence parallelism (:mod:`..parallel.ring_attention`) is the
intended path — it shards K/V across devices and runs THIS kernel on
per-device chunks that are back inside the VMEM budget.

Backward (the standard two-kernel flash scheme):
- ``delta = rowsum(dO · O)`` (tiny jnp reduction),
- dK/dV kernel: grid over k blocks, streaming q blocks, recomputing
  ``p_ij = exp(s_ij − lse_i)`` from the saved lse,
- dQ kernel: grid over q blocks, streaming k blocks.

All matmuls accumulate in fp32 on the MXU. Numerics are validated against
the jnp reference (forward and gradients) in
tests/test_flash_blockwise.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 0  # 0 = auto (measured cost model, _pick_block)
DEFAULT_BLOCK_K = 0
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Measured kernel throughput by (square) block size — v5e, bf16, D=64,
# fwd+bwd TF/s at N=2048/4096 (scripts/blockwise_tune.py). Larger blocks
# run faster per FLOP but pad N up to a block multiple, and padded
# rows/cols are computed; the auto choice minimises padded-FLOPs /
# throughput. 2048² blocks fail to compile (VMEM), 256↔1024 is a 2.3×
# throughput spread.
_BLOCK_TFS = {256: 20.9, 512: 39.5, 1024: 48.6}


def _pick_block(n: int) -> int:
    def cost(b):
        waste = (_round_up(n, b) / n) ** 2
        return waste / _BLOCK_TFS[b]

    return min(_BLOCK_TFS, key=cost)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_scr, l_scr,
                *, scale, seq_len, block_k, num_k_blocks):
    """Grid (BH, num_q_blocks). q_ref: (1, Bq, D); k/v_ref: (1, N_pad, D);
    lse_ref: (1, N_pad) full row, written per-q-block slice (TPU block
    shapes for the trailing dims must be (8, 128)-aligned or full)."""
    q = q_ref[0]
    bq, d = q.shape
    qi = pl.program_id(1)

    m_scr[:] = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l_scr[:] = jnp.zeros((bq, 1), jnp.float32)
    acc[:] = jnp.zeros((bq, d), jnp.float32)

    def body(j, _):
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Bq, Bk)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < seq_len, s, NEG_INF)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc[:] = acc[:] * correction + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new
        return 0

    jax.lax.fori_loop(0, num_k_blocks, body, 0)

    l = jnp.maximum(l_scr[:], 1e-30)
    o_ref[0] = (acc[:] / l).astype(o_ref.dtype)
    lse_ref[0, 0, pl.ds(qi * bq, bq)] = (m_scr[:] + jnp.log(l))[:, 0]


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    b, h, n, d = q.shape
    bq = min(block_q or _pick_block(n), _round_up(n, 8))
    bk = min(block_k or _pick_block(n), _round_up(n, 8))
    n_pad = _round_up(n, max(bq, bk))
    bh = b * h

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0))).reshape(
            bh, n_pad, d
        )

    qp, kp, vp = pad(q), pad(k), pad(v)
    num_q = n_pad // bq
    num_k = n_pad // bk

    q_spec = pl.BlockSpec((1, bq, d), lambda i, qi: (i, qi, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, n_pad, d), lambda i, qi: (i, 0, 0), memory_space=pltpu.VMEM)
    o_spec = q_spec
    lse_spec = pl.BlockSpec((1, 1, n_pad), lambda i, qi: (i, 0, 0), memory_space=pltpu.VMEM)

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, seq_len=n, block_k=bk, num_k_blocks=num_k
        ),
        grid=(bh, num_q),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(o_spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, n_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return (
        out.reshape(b, h, n_pad, d)[:, :, :n, :],
        lse.reshape(b, h, n_pad)[:, :, :n],
        (qp, kp, vp, n_pad),
    )


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                *, scale, seq_len, block_q, num_q_blocks):
    """Grid (BH, num_k_blocks). k/v blocks resident; stream q/do blocks."""
    k_blk = k_ref[0]   # (Bk, D)
    v_blk = v_ref[0]
    bk, d = k_blk.shape
    kj = pl.program_id(1)

    dk = jnp.zeros((bk, d), jnp.float32)
    dv = jnp.zeros((bk, d), jnp.float32)

    def body(i, carry):
        # matmul operands stay in the input dtype (bf16 in training) so
        # the MXU runs at full rate — fp32 operands cost ~4x; accumulation
        # is fp32 via preferred_element_type (same scheme as the NHD
        # backward kernel, ops/flash_attention.py::_nhd_bwd_kernel)
        dk, dv = carry
        q_blk = q_ref[0, pl.ds(i * block_q, block_q), :]
        do_blk = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]

        s = jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Bq, Bk)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kj * bk
        s = jnp.where(col < seq_len, s, NEG_INF)
        p = jnp.exp(s - lse)  # (Bq, Bk) fp32

        dv = dv + jax.lax.dot_general(
            p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Bq, Bk)
        ds = (p * (dp - delta) * scale).astype(q_blk.dtype)
        dk = dk + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk, dv = jax.lax.fori_loop(0, num_q_blocks, body, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               *, scale, seq_len, block_k, num_k_blocks):
    """Grid (BH, num_q_blocks). q/do blocks resident; stream k/v blocks.

    Matmul operands stay in the input dtype (bf16 in training; fp32
    accumulation via preferred_element_type) — see _dkv_kernel."""
    q_blk = q_ref[0]
    do_blk = do_ref[0]
    bq, d = q_blk.shape
    qi = pl.program_id(1)
    lse = lse_ref[0, 0, pl.ds(qi * bq, bq)][:, None]
    delta = delta_ref[0, 0, pl.ds(qi * bq, bq)][:, None]

    def body(j, dq):
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < seq_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta) * scale).astype(q_blk.dtype)
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, num_k_blocks, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd(res, do, scale, block_q, block_k, interpret, dlse=None):
    """dlse (optional, (B, H, N) fp32): cotangent of the log-sum-exp output
    of :func:`blockwise_attention_lse`. Because ∂lse_i/∂s_ij = p_ij, the lse
    cotangent enters the score gradient as ds_ij += p_ij·dlse_i — exactly the
    −delta term's shape — so it folds into delta (delta_i −= dlse_i) and both
    backward kernels are reused unchanged."""
    q, k, v, o, lse = res
    b, h, n, d = q.shape
    bq = min(block_q or _pick_block(n), _round_up(n, 8))
    bk = min(block_k or _pick_block(n), _round_up(n, 8))
    n_pad = _round_up(n, max(bq, bk))
    bh = b * h

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0))).reshape(
            bh, n_pad, d
        )

    qp, kp, vp, dop = pad(q), pad(k), pad(v), pad(do)
    # delta_i = rowsum(dO_i · O_i); lse padded with +inf -> p = 0 on pad rows
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, n_pad - n))).reshape(bh, 1, n_pad)
    lse_p = jnp.pad(
        lse, ((0, 0), (0, 0), (0, n_pad - n)), constant_values=jnp.inf
    ).reshape(bh, 1, n_pad)

    num_q = n_pad // bq
    num_k = n_pad // bk

    full_spec = pl.BlockSpec((1, n_pad, d), lambda i, b_: (i, 0, 0), memory_space=pltpu.VMEM)
    full_vec = pl.BlockSpec((1, 1, n_pad), lambda i, b_: (i, 0, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, bk, d), lambda i, kj: (i, kj, 0), memory_space=pltpu.VMEM)
    dkv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, seq_len=n, block_q=bq, num_q_blocks=num_q
        ),
        grid=(bh, num_k),
        in_specs=[full_spec, k_spec, k_spec, full_spec, full_vec, full_vec],
        out_specs=(k_spec, k_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_p, delta)
    dk, dv = dkv

    q_spec = pl.BlockSpec((1, bq, d), lambda i, qi: (i, qi, 0), memory_space=pltpu.VMEM)
    q_vec = pl.BlockSpec((1, 1, n_pad), lambda i, qi: (i, 0, 0), memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, seq_len=n, block_k=bk, num_k_blocks=num_k
        ),
        grid=(bh, num_q),
        in_specs=[q_spec, full_spec, full_spec, q_spec, q_vec, q_vec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_p, delta)

    def unpad(x):
        return x.reshape(b, h, n_pad, d)[:, :, :n, :]

    return unpad(dq), unpad(dk), unpad(dv)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def blockwise_attention(q, k, v, scale: float, block_q: int = DEFAULT_BLOCK_Q,
                        block_k: int = DEFAULT_BLOCK_K, interpret: bool = False):
    """O(N)-memory flash attention. Shapes (B, H, N, D)."""
    out, _, _ = _flash_fwd(q, k, v, scale, block_q, block_k, interpret)
    return out


def _vjp_fwd(q, k, v, scale, block_q, block_k, interpret):
    out, lse, _ = _flash_fwd(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _vjp_bwd(scale, block_q, block_k, interpret, res, do):
    return _flash_bwd(res, do, scale, block_q, block_k, interpret)


blockwise_attention.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def blockwise_attention_lse(q, k, v, scale: float,
                            block_q: int = DEFAULT_BLOCK_Q,
                            block_k: int = DEFAULT_BLOCK_K,
                            interpret: bool = False):
    """Like :func:`blockwise_attention` but also returns the per-row
    log-sum-exp ``(B, H, N) fp32`` — and the lse output is differentiable.

    This is the composition primitive for distributed attention: partial
    attentions over disjoint K/V chunks merge exactly via
    ``lse = logaddexp(lse_a, lse_b); o = o_a·e^{lse_a−lse} + o_b·e^{lse_b−lse}``
    (used by :mod:`vit_ssl_tpu.parallel.ring_attention` to run this kernel
    per ring hop). The lse cotangent costs nothing extra in the backward —
    it folds into the delta vector (see :func:`_flash_bwd`).
    """
    out, lse, _ = _flash_fwd(q, k, v, scale, block_q, block_k, interpret)
    return out, lse


def _vjp_lse_fwd(q, k, v, scale, block_q, block_k, interpret):
    out, lse, _ = _flash_fwd(q, k, v, scale, block_q, block_k, interpret)
    return (out, lse), (q, k, v, out, lse)


def _vjp_lse_bwd(scale, block_q, block_k, interpret, res, cts):
    do, dlse = cts
    return _flash_bwd(res, do, scale, block_q, block_k, interpret, dlse=dlse)


blockwise_attention_lse.defvjp(_vjp_lse_fwd, _vjp_lse_bwd)


def default_interpret() -> bool:
    return jax.default_backend() != "tpu"
