#!/usr/bin/env python
"""Microbench: ring-attention per-hop engines on the real chip.

Ring attention (vit_ssl_tpu/parallel/ring_attention.py) picks a per-hop
engine with ``hop_kernel="auto"``: stock-XLA jnp below
``RING_PALLAS_MIN_CHUNK`` local tokens, the Pallas blockwise flash kernel
(ops/flash_blockwise.py::blockwise_attention_lse) at or above it. This
script measures both engines fwd and fwd+bwd at ring-hop shapes — the
resident Q shard attending one K/V chunk of the same length — so the
auto threshold is a *measured* gate, not an assumption.

Timing follows bench.py::measure_steps: reps chained inside ONE jitted
lax.scan with real data dependence, value-fetch barrier (the axon tunnel's
block_until_ready can return early), and the backward harness consumes ALL
of dq/dk/dv (unconsumed grads get dead-code-eliminated and look ~2x fast).

Usage: python scripts/ring_hop_bench.py [--reps 20] [--outer 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (B, H, N_local, D): per-device shard shapes a long-context ring would
# actually see (H=6/D=64 ViT-S heads; B covers the microbatch regimes).
SHAPES = [
    (8, 6, 256, 64),
    (8, 6, 512, 64),
    (8, 6, 1024, 64),
    (8, 6, 2048, 64),
    (4, 6, 4096, 64),
]


def measure(step_once, state, reps: int, outer: int) -> float:
    import jax

    @jax.jit
    def run_chunk(s):
        def body(carry, _):
            carry, x = step_once(carry)
            return carry, x

        s, xs = jax.lax.scan(body, s, None, length=reps)
        return s, xs[-1]

    state, x = run_chunk(state)
    float(x)
    rtt = 0.0
    for _ in range(3):
        t = time.perf_counter()
        float(x)
        rtt = max(rtt, time.perf_counter() - t)
    t0 = time.perf_counter()
    for _ in range(outer):
        state, x = run_chunk(state)
    float(x)
    dt = time.perf_counter() - t0 - rtt
    return max(dt, 1e-9) / (reps * outer)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--outer", type=int, default=3)
    args = p.parse_args(argv)

    import threading

    import jax
    import jax.numpy as jnp

    # overlap the ~400 s one-time device->host channel init with compiles
    threading.Thread(target=lambda: float(jnp.zeros(()))).start()

    from vit_ssl_tpu.parallel.ring_attention import _hop_jnp, _hop_pallas

    engines = {"jnp": _hop_jnp, "pallas": _hop_pallas}
    print(f"backend={jax.default_backend()}  reps={args.reps} outer={args.outer}")
    print(f"{'shape':>18} {'engine':>7} {'fwd ms':>9} {'fwd+bwd ms':>11}")

    for shape in SHAPES:
        b, h, n, d = shape
        scale = d ** -0.5
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, shape, jnp.bfloat16)
        k = jax.random.normal(kk, shape, jnp.bfloat16)
        v = jax.random.normal(kv, shape, jnp.bfloat16)
        rows = {}
        for name, hop in engines.items():

            def loss_fn(q, k, v, hop=hop):
                o, lse = hop(q, k, v, scale)
                # keep BOTH outputs live: the ring merge consumes o and lse
                return jnp.sum(o * o) + jnp.sum(lse)

            def fwd_step(s, hop=hop):
                q, k, v = s
                o, lse = hop(q, k, v, scale)
                # data dependence across reps without growing values
                q = q + (0.0 * jnp.sum(lse)).astype(q.dtype)
                return (q, k, v), jnp.sum(o[0, 0, 0]).astype(jnp.float32)

            def bwd_step(s, loss_fn=loss_fn):
                q, k, v = s
                loss, (dq, dk, dv) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2)
                )(q, k, v)
                # consume ALL grads (dead-code trap) + chain the carry
                g = jnp.sum(dq * dq) + jnp.sum(dk * dk) + jnp.sum(dv * dv)
                q = q + (0.0 * g).astype(q.dtype)
                return (q, k, v), (loss + 0.0 * g).astype(jnp.float32)

            f = measure(fwd_step, (q, k, v), args.reps, args.outer) * 1e3
            fb = measure(bwd_step, (q, k, v), args.reps, args.outer) * 1e3
            rows[name] = (f, fb)
            print(f"{str(shape):>18} {name:>7} {f:9.3f} {fb:11.3f}")
        jf, jfb = rows["jnp"]
        pf, pfb = rows["pallas"]
        print(
            f"{'':>18} {'ratio':>7} {jf / pf:8.2f}x {jfb / pfb:10.2f}x"
            "   (jnp/pallas; >1 = kernel wins)"
        )


if __name__ == "__main__":
    main()
