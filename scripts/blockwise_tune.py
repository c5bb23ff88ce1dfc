#!/usr/bin/env python
"""Block-size sweep for the blockwise flash kernel on the real chip.

Times ``blockwise_attention`` fwd and fwd+bwd at long-context shapes for
a grid of (block_q, block_k), bf16 operands — the data behind
DEFAULT_BLOCK_Q/K. Chained-scan timing, all grads consumed (bench.py
methodology).

Usage: python scripts/blockwise_tune.py [--reps 20] [--outer 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SHAPES = [(8, 6, 2048, 64), (4, 6, 4096, 64)]
BLOCKS = [(512, 512), (1024, 1024), (512, 2048), (1024, 2048),
          (2048, 1024), (2048, 2048), (1024, 4096), (2048, 512)]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--outer", type=int, default=3)
    args = p.parse_args(argv)

    import threading

    import jax
    import jax.numpy as jnp

    threading.Thread(target=lambda: float(jnp.zeros(())), daemon=True).start()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import measure_steps
    from vit_ssl_tpu.ops.flash_blockwise import blockwise_attention

    print(f"backend={jax.default_backend()} reps={args.reps} outer={args.outer}")
    print(f"{'shape':>18} {'bq,bk':>10} {'fwd ms':>8} {'fwd+bwd ms':>11} "
          f"{'fwd TF/s':>9} {'f+b TF/s':>9}")

    for shape in SHAPES:
        b, h, n, d = shape
        scale = d ** -0.5
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, shape, jnp.bfloat16)
        k = jax.random.normal(kk, shape, jnp.bfloat16)
        v = jax.random.normal(kv, shape, jnp.bfloat16)
        flops_f = 4 * b * h * n * n * d       # QK^T + PV, 2*MACs
        flops_fb = flops_f * 3.5              # + 5 bwd matmuls / 2 fwd

        for bq, bk in BLOCKS:
            if bq > n or bk > n:
                continue

            def loss(q, k, v, bq=bq, bk=bk):
                o = blockwise_attention(q, k, v, scale, bq, bk, False)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            def fwd_step(s, bq=bq, bk=bk):
                q, k, v = s
                o = blockwise_attention(q, k, v, scale, bq, bk, False)
                r = jnp.sum(o.astype(jnp.float32))
                q = q + (0.0 * r).astype(q.dtype)
                return (q, k, v), r

            def bwd_step(s, loss=loss):
                q, k, v = s
                val, (dq, dk, dv) = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    q, k, v
                )
                g = (jnp.sum(dq.astype(jnp.float32) ** 2)
                     + jnp.sum(dk.astype(jnp.float32) ** 2)
                     + jnp.sum(dv.astype(jnp.float32) ** 2))
                q = q + (0.0 * g).astype(q.dtype)
                return (q, k, v), (val + g).astype(jnp.float32)

            try:
                t0 = time.perf_counter()
                f = measure_steps(fwd_step, (q, k, v), args.reps, args.outer)
                fb = measure_steps(bwd_step, (q, k, v), args.reps, args.outer)
            except Exception as e:
                print(f"{str(shape):>18} {f'{bq},{bk}':>10}  FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                continue
            print(
                f"{str(shape):>18} {f'{bq},{bk}':>10} {f * 1e3:8.3f} "
                f"{fb * 1e3:11.3f} {flops_f / f / 1e12:9.2f} "
                f"{flops_fb / fb / 1e12:9.2f}"
                f"   ({time.perf_counter() - t0:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
