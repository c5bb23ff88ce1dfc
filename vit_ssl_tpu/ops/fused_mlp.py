"""Fused Linear→GELU(→dropout)→Linear as a Pallas TPU kernel.

TPU-native replacement for the reference's eager FFN
(`/root/reference/vit_core/feed_forward.py:7-28`). The (tokens, d_ff)
activation — 4× the size of the input at mlp_ratio 4 — is produced,
activated, masked, and contracted away entirely inside VMEM, saving the
round trip to HBM that dominates the FFN's memory traffic.

Tokens are tiled in row blocks; both weight matrices stay resident in VMEM
across the grid (`(384, 1536)` fp32 = 2.25 MB each at ViT-S scale).
GELU is the exact (erf) variant to match ``torch.nn.functional.gelu``.
Dropout keeps flax RNG semantics: the boolean keep-mask is drawn outside
the kernel with the module's 'dropout' rng and streamed in as int8 (1 byte
per element instead of a 4-byte activation).

Backward is exact via ``jax.custom_vjp``: recompute-based (rematerialises
the hidden activation from the saved input + mask), standard practice on
TPU where FLOPs are cheaper than HBM bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_SQRT2_INV = 0.7071067811865476


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (|error| ≤ 1.5e-7).

    Mosaic has no lowering for the erf/erfc primitives (checked on the v5e
    toolchain in this image), so kernels use this exp-based rational
    approximation; its error is far below the fp32 tolerance the parity
    tests enforce.
    """
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # erf formulation of exact GELU, matching torch F.gelu (non-approximate)
    return x * 0.5 * (1.0 + _erf_poly(x * _SQRT2_INV))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]
    h = jax.lax.dot_general(
        x,
        w1_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _gelu_exact(h + b1_ref[:].astype(jnp.float32))
    o = jax.lax.dot_general(
        h.astype(x.dtype),
        w2_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (o + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _mlp_dropout_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, m_ref, o_ref, *, keep_prob):
    x = x_ref[:]
    h = jax.lax.dot_general(
        x,
        w1_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _gelu_exact(h + b1_ref[:].astype(jnp.float32))
    h = h * (m_ref[:].astype(jnp.float32) / keep_prob)
    o = jax.lax.dot_general(
        h.astype(x.dtype),
        w2_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (o + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _fused_mlp_impl(x, w1, b1, w2, b2, mask, keep_prob: float, interpret: bool):
    """x: (T, d_in); mask: optional (T, d_ff) int8 keep-mask."""
    t, d_in = x.shape
    d_ff = w1.shape[1]
    d_out = w2.shape[1]
    block_t = min(512, max(_round_up(t, 8), 8))
    t_pad = _round_up(t, block_t)

    xp = jnp.pad(x, ((0, t_pad - t), (0, 0)))
    b1r = b1.reshape(1, d_ff)
    b2r = b2.reshape(1, d_out)

    grid = (t_pad // block_t,)
    x_spec = pl.BlockSpec((block_t, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((d_in, d_ff), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b1_spec = pl.BlockSpec((1, d_ff), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((d_ff, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b2_spec = pl.BlockSpec((1, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((block_t, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM)

    cost = pl.CostEstimate(
        flops=2 * t_pad * d_in * d_ff + 2 * t_pad * d_ff * d_out,
        bytes_accessed=(t_pad * d_in + d_in * d_ff + d_ff * d_out + t_pad * d_out)
        * x.dtype.itemsize,
        transcendentals=t_pad * d_ff,
    )

    if mask is None:
        out = pl.pallas_call(
            _mlp_kernel,
            grid=grid,
            in_specs=[x_spec, w1_spec, b1_spec, w2_spec, b2_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((t_pad, d_out), x.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(xp, w1, b1r, w2, b2r)
    else:
        mp = jnp.pad(mask.astype(jnp.int8), ((0, t_pad - t), (0, 0)))
        m_spec = pl.BlockSpec((block_t, d_ff), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_mlp_dropout_kernel, keep_prob=keep_prob),
            grid=grid,
            in_specs=[x_spec, w1_spec, b1_spec, w2_spec, b2_spec, m_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((t_pad, d_out), x.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(xp, w1, b1r, w2, b2r, mp)
    return out[:t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_mlp(x, w1, b1, w2, b2, mask, keep_prob: float = 1.0, interpret: bool = False):
    """Fused FFN. x (T, d_in); returns (T, d_out). mask may be None."""
    return _fused_mlp_impl(x, w1, b1, w2, b2, mask, keep_prob, interpret)


def _fwd(x, w1, b1, w2, b2, mask, keep_prob, interpret):
    out = _fused_mlp_impl(x, w1, b1, w2, b2, mask, keep_prob, interpret)
    return out, (x, w1, b1, w2, mask)


def _bwd(keep_prob, interpret, res, do):
    del interpret
    x, w1, b1, w2, mask = res
    xf = x.astype(jnp.float32)
    w1f, b1f, w2f = w1.astype(jnp.float32), b1.astype(jnp.float32), w2.astype(jnp.float32)
    dof = do.astype(jnp.float32)

    pre = jnp.dot(xf, w1f, precision=jax.lax.Precision.HIGHEST) + b1f
    h, gelu_vjp = jax.vjp(_gelu_exact, pre)
    if mask is not None:
        scale = mask.astype(jnp.float32) / keep_prob
        h_dropped = h * scale
    else:
        scale = None
        h_dropped = h

    dw2 = jnp.dot(h_dropped.T, dof, precision=jax.lax.Precision.HIGHEST)
    db2 = jnp.sum(dof, axis=0)
    dh = jnp.dot(dof, w2f.T, precision=jax.lax.Precision.HIGHEST)
    if scale is not None:
        dh = dh * scale
    (dpre,) = gelu_vjp(dh)
    dw1 = jnp.dot(xf.T, dpre, precision=jax.lax.Precision.HIGHEST)
    db1 = jnp.sum(dpre, axis=0)
    dx = jnp.dot(dpre, w1f.T, precision=jax.lax.Precision.HIGHEST)
    return (
        dx.astype(x.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(w2.dtype),
        None,
    )


fused_mlp.defvjp(_fwd, _bwd)


def default_interpret() -> bool:
    return jax.default_backend() != "tpu"
