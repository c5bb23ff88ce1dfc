#!/usr/bin/env python
"""Probe: does exp2 (log2e folded into the softmax scale) beat exp in the
blockwise forward kernel on this Mosaic? Flash-CUDA lore says yes on GPUs;
on TPU the VPU exp lowering may already be exp2+mul. Times the shipped
forward against an inline exp2 variant at long-context shapes.
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

from vit_ssl_tpu.ops.flash_blockwise import NEG_INF, _round_up

LOG2E = 1.4426950408889634


def _fwd_kernel_exp2(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_scr, l_scr,
                     *, scale, seq_len, block_k, num_k_blocks):
    q = q_ref[0]
    bq, d = q.shape
    qi = pl.program_id(1)
    m_scr[:] = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l_scr[:] = jnp.zeros((bq, 1), jnp.float32)
    acc[:] = jnp.zeros((bq, d), jnp.float32)
    s2scale = scale * LOG2E  # scores directly in the log2 domain

    def body(j, _):
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s2scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < seq_len, s, NEG_INF)
        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        correction = jnp.exp2(m_prev - m_new)
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
    # natural-log lse contract: lse = (m2 + log2(l)) / log2(e)
    lse_ref[0, 0, pl.ds(qi * bq, bq)] = (
        (m_scr[:] + jnp.log2(l)) / LOG2E
    )[:, 0]


def fwd_exp2(q, k, v, scale, bq, bk):
    b, h, n, d = q.shape
    n_pad = _round_up(n, max(bq, bk))
    bh = b * h

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0))).reshape(
            bh, n_pad, d
        )

    qp, kp, vp = pad(q), pad(k), pad(v)
    q_spec = pl.BlockSpec((1, bq, d), lambda i, qi: (i, qi, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, n_pad, d), lambda i, qi: (i, 0, 0), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, n_pad), lambda i, qi: (i, 0, 0), memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_exp2, scale=scale, seq_len=n,
                          block_k=bk, num_k_blocks=n_pad // bk),
        grid=(bh, n_pad // bq),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(q_spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, n_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp)
    return out.reshape(b, h, n_pad, d)[:, :, :n, :]


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
    from vit_ssl_tpu.ops.flash_blockwise import blockwise_attention

    for shape in [(8, 6, 2048, 64), (4, 6, 4096, 64)]:
        b, h, n, d = shape
        scale = d ** -0.5
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, shape, jnp.bfloat16)
        k = jax.random.normal(kk, shape, jnp.bfloat16)
        v = jax.random.normal(kv, shape, jnp.bfloat16)

        # correctness first
        a = fwd_exp2(q, k, v, scale, 1024, 1024)
        ref = blockwise_attention(q, k, v, scale, 1024, 1024, False)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(ref, np.float32),
            atol=3e-2, rtol=3e-2,
        )

        for name, fn in [
            ("exp ", lambda q, k, v: blockwise_attention(q, k, v, scale, 1024, 1024, False)),
            ("exp2", lambda q, k, v: fwd_exp2(q, k, v, scale, 1024, 1024)),
        ]:
            def step(s, fn=fn):
                q, k, v = s
                o = fn(q, k, v)
                r = jnp.sum(o.astype(jnp.float32))
                q = q + (0.0 * r).astype(q.dtype)
                return (q, k, v), r

            t0 = time.perf_counter()
            sec = measure_steps(step, (q, k, v), 20, 3)
            print(f"{shape} {name} fwd {sec * 1e3:.3f} ms "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
