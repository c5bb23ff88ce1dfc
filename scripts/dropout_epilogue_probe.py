#!/usr/bin/env python
"""Probe: in-kernel dropout-mask EPILOGUE (VERDICT r3 next-round item 4).

The DINO headline step (68.2 ms) sits ~10 ms above its own
dropout-0+teacher-eval ablation (58.4 ms). The ledgered dead ends cover
in-kernel bits GENERATION (pltpu.prng_random_bits loses to XLA's fused rbg)
and bit-width tricks; the unmeasured variant is consuming the XLA-generated
uint16-threshold keep-mask inside a Pallas kernel's operand load, so the
masked activation never makes an HBM round trip. The FFN's d_ff-wide
dropout (2/3 of dropout elements; `ops/feed_forward.py:81-83`) is the only
site adjacent to a GEMM, so the probe is a masked SECOND GEMM:

    o = (gelu(x @ w1 + b1) * mask / keep_prob) @ w2 + b2

with GEMM1+GELU left to XLA and the mask applied while loading the h
operand of GEMM2 (fwd + a dh/dw2 backward kernel, exact custom_vjp).

Legs (fwd+bwd wrt x/w1/b1/w2/b2, all grads consumed, chained scan via
bench.measure_steps, DINO student-globals FFN shape T=256·145, 384→1536
bf16):
  nodrop    — XLA FFN, no dropout (floor)
  bitsonly  — XLA FFN no mask apply + the uint16 bits generated and
              consumed (isolates generation cost from application cost)
  xla       — XLA FFN + uint16-threshold dropout (shipped default,
              `ops/feed_forward.py`)
  epilogue  — XLA GEMM1+GELU, Pallas masked GEMM2 (this probe)
  fused     — full fused_mlp kernel with in-kernel mask (shipped, default
              off; ledgered as losing at ViT-S widths)

RETIRE CRITERION (stated up front): wire `epilogue` into FeedForwardBlock
only if it beats `xla` by >=5% at the FFN level AND the win survives at
the DINO-step level; otherwise this becomes a docs/performance.md ledger
entry with these numbers. Semantics must equal the shipped uint16 path
bit-for-bit in expectation (same bits, same threshold, same scale) —
verified against `ops/feed_forward.py` numerics before timing.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_ssl_tpu.ops.fused_mlp import _gelu_exact, fused_mlp
from vit_ssl_tpu.ops.dropout import keep_mask16


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _masked_mm_kernel(h_ref, m_ref, w2_ref, b2_ref, o_ref, *, keep_prob):
    h = h_ref[:].astype(jnp.float32) * (m_ref[:].astype(jnp.float32) / keep_prob)
    o = jax.lax.dot_general(
        h.astype(h_ref.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (o + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _masked_mm_bwd_kernel(h_ref, m_ref, do_ref, w2_ref, dh_ref, dw2_ref,
                          db2_ref, *, keep_prob):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    do = do_ref[:]
    scale = m_ref[:].astype(jnp.float32) / keep_prob
    hm = (h_ref[:].astype(jnp.float32) * scale).astype(h_ref.dtype)
    dw2_ref[:] += jax.lax.dot_general(
        hm, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dw2_ref.dtype)
    db2_ref[:] += jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True).astype(
        db2_ref.dtype
    )
    dh = jax.lax.dot_general(
        do, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh_ref[:] = (dh * scale).astype(dh_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_matmul(h, mask, w2, b2, keep_prob: float):
    """(h * mask / keep_prob) @ w2 + b2, mask consumed in-kernel."""
    return _masked_mm_fwd_impl(h, mask, w2, b2, keep_prob)


def _masked_mm_fwd_impl(h, mask, w2, b2, keep_prob):
    t, f = h.shape
    d = w2.shape[1]
    block_t = min(512, max(_round_up(t, 8), 8))
    t_pad = _round_up(t, block_t)
    hp = jnp.pad(h, ((0, t_pad - t), (0, 0)))
    mp = jnp.pad(mask, ((0, t_pad - t), (0, 0)))
    grid = (t_pad // block_t,)
    out = pl.pallas_call(
        functools.partial(_masked_mm_kernel, keep_prob=keep_prob),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, d), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * f * d,
            bytes_accessed=(t_pad * f * 3 + f * d * 2 + t_pad * d * 2)
            + t_pad * f,  # h bf16 + mask i8 + w2/o bf16
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(hp, mp, w2, b2.reshape(1, d))
    return out[:t]


def _mm_fwd(h, mask, w2, b2, keep_prob):
    return _masked_mm_fwd_impl(h, mask, w2, b2, keep_prob), (h, mask, w2)


def _mm_bwd(keep_prob, res, do):
    h, mask, w2 = res
    t, f = h.shape
    d = w2.shape[1]
    block_t = min(256, max(_round_up(t, 8), 8))
    t_pad = _round_up(t, block_t)
    hp = jnp.pad(h, ((0, t_pad - t), (0, 0)))
    mp = jnp.pad(mask, ((0, t_pad - t), (0, 0)))
    dop = jnp.pad(do.astype(h.dtype), ((0, t_pad - t), (0, 0)))
    grid = (t_pad // block_t,)
    dh, dw2, db2 = pl.pallas_call(
        functools.partial(_masked_mm_bwd_kernel, keep_prob=keep_prob),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_t, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, f), h.dtype),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(hp, mp, dop, w2)
    return (dh[:t], None, dw2.astype(w2.dtype), db2.reshape(-1).astype(w2.dtype))


masked_matmul.defvjp(_mm_fwd, _mm_bwd)


RATE = 0.1
KEEP = 1.0 - RATE


def ffn_xla(params, x, mask):
    h = jnp.dot(x, params["w1"]) + params["b1"]
    h = _gelu_exact(h)
    if mask is not None:
        h = jnp.where(mask, h / KEEP, 0.0).astype(x.dtype)
    return jnp.dot(h.astype(x.dtype), params["w2"]) + params["b2"]


def ffn_epilogue(params, x, mask):
    h = jnp.dot(x, params["w1"]) + params["b1"]
    h = _gelu_exact(h).astype(x.dtype)
    return masked_matmul(h, mask.astype(jnp.int8), params["w2"],
                         params["b2"], KEEP)


def ffn_fused(params, x, mask):
    return fused_mlp(x, params["w1"], params["b1"], params["w2"],
                     params["b2"], mask, KEEP,
                     jax.default_backend() != "tpu")


def main():
    import threading

    import numpy as np

    threading.Thread(target=lambda: float(jnp.zeros(())), daemon=True).start()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import measure_steps

    t_rows, d_in, d_ff = 256 * 145, 384, 1536  # DINO student-globals FFN
    key = jax.random.PRNGKey(0)
    kx, kw1, kw2, kb = jax.random.split(key, 4)
    x = jax.random.normal(kx, (t_rows, d_in), jnp.bfloat16)
    params = {
        "w1": jax.random.normal(kw1, (d_in, d_ff), jnp.bfloat16) * 0.05,
        "b1": jnp.zeros((d_ff,), jnp.bfloat16),
        "w2": jax.random.normal(kw2, (d_ff, d_in), jnp.bfloat16) * 0.05,
        "b2": jnp.zeros((d_in,), jnp.bfloat16),
    }

    # -- correctness: epilogue == shipped XLA uint16 path, same bits -------
    mask = keep_mask16(kb, (t_rows, d_ff), RATE)
    a = ffn_epilogue(params, x, mask)
    b = ffn_xla(params, x, mask)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=5e-2, rtol=5e-2)
    ga = jax.grad(lambda p: jnp.sum(ffn_epilogue(p, x, mask).astype(jnp.float32)))(params)
    gb = jax.grad(lambda p: jnp.sum(ffn_xla(p, x, mask).astype(jnp.float32)))(params)
    for k in ga:
        # bf16 operands + T=37k accumulation: ulp at |g|~500 is ~4, and the
        # two paths reduce in different orders — compare at bf16 tolerance
        np.testing.assert_allclose(np.asarray(ga[k], np.float32),
                                   np.asarray(gb[k], np.float32),
                                   atol=16.0, rtol=8e-2)
    print("numerics OK (epilogue == shipped uint16 path)", flush=True)

    def make_step(ffn, with_mask, bits_only=False):
        def loss(params, x, mask):
            o = ffn(params, x, mask)
            return jnp.sum(o.astype(jnp.float32))

        grad = jax.value_and_grad(loss)

        def step(state):
            params, x, it = state
            rng = jax.random.fold_in(jax.random.PRNGKey(7), it)
            mask = keep_mask16(rng, (t_rows, d_ff), RATE) if with_mask else None
            val, g = grad(params, x, mask)
            if bits_only:
                # generate + consume the bits without applying them
                bits = keep_mask16(rng, (t_rows, d_ff), RATE)
                val = val + jnp.sum(bits.astype(jnp.float32))
            gsum = sum(jnp.sum(v.astype(jnp.float32))
                       for v in jax.tree_util.tree_leaves(g))
            x = x + (0.0 * (val + gsum)).astype(x.dtype)
            return (params, x, it + 1), val + gsum

        return step

    legs = [
        ("nodrop  ", make_step(ffn_xla, with_mask=False)),
        ("bitsonly", make_step(ffn_xla, with_mask=False, bits_only=True)),
        ("xla     ", make_step(ffn_xla, with_mask=True)),
        ("epilogue", make_step(ffn_epilogue, with_mask=True)),
        ("fused   ", make_step(ffn_fused, with_mask=True)),
    ]
    results = {}
    for name, step in legs:
        t0 = time.perf_counter()
        sec = measure_steps(step, (params, x, jnp.int32(0)), 30, 5)
        results[name.strip()] = sec * 1e3
        print(f"{name} {sec * 1e3:8.3f} ms/FFN-step "
              f"(wall {time.perf_counter() - t0:.0f}s)", flush=True)

    base = results["xla"]
    print(f"\nbits generation cost: {results['bitsonly'] - results['nodrop']:.3f} ms")
    print(f"mask application cost in XLA: {base - results['bitsonly']:.3f} ms")
    print(f"epilogue vs xla: {base / results['epilogue']:.3f}x "
          f"({base - results['epilogue']:+.3f} ms)")
    print(f"fused vs xla: {base / results['fused']:.3f}x")


if __name__ == "__main__":
    main()
