#!/usr/bin/env python
"""Upper-bound probe: would fusing the DINO student's two encoder calls
(globals (2B,145,D) + packed locals (B,148,D)) into ONE (3B,148,D) call
pay? Times the real ViTBackbone encode fwd+bwd both ways on the chip.

The fused leg runs block_size=37 over all rows — the mask semantics are
wrong for the global rows (this is a TIMING probe, not a numerics path;
the real implementation would select block-diag vs pad mask per grid
cell at identical in-kernel cost), but shapes, kernel dispatches, GEMM
sizes, and memory traffic match the proposed design exactly.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import threading

    threading.Thread(target=lambda: float(jnp.zeros(())), daemon=True).start()
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import measure_steps
    from vit_ssl_tpu.models.dino import ViTBackbone

    B = 128
    D, H, L, MLP = 384, 6, 6, 1536
    NG, NLP = 145, 148  # globals tokens; packed locals tokens (4x37)

    bb = ViTBackbone(
        num_blocks=L, input_shape=(3, 96, 96), embed_dim=D, patch_size=8,
        num_heads=H, mlp_dim=MLP, dropout=0.1, dtype=jnp.bfloat16,
        use_flash=jax.default_backend() == "tpu",
    )
    params = bb.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3))
    )["params"]

    rs = np.random.RandomState(0)

    def tokens(b, n):
        return jnp.asarray(rs.rand(b, n, D) - 0.5, jnp.bfloat16)

    xg, xl, xf = tokens(2 * B, NG), tokens(B, NLP), tokens(3 * B, NLP)

    def enc(p, x, rng, block):
        return bb.apply(
            {"params": p}, x, False, False, block,
            method="encode", rngs={"dropout": rng},
        )

    def split_loss(p, xg, xl, rng):
        r1, r2 = jax.random.split(rng)
        a = enc(p, xg, r1, 0)
        b_ = enc(p, xl, r2, 37)
        return jnp.sum(a.astype(jnp.float32) ** 2) + jnp.sum(
            b_.astype(jnp.float32) ** 2
        )

    def fused_loss(p, xf, rng):
        a = enc(p, xf, rng, 37)
        return jnp.sum(a.astype(jnp.float32) ** 2)

    for name, loss, args in [
        ("split", split_loss, (xg, xl)),
        ("fused", fused_loss, (xf,)),
    ]:
        def step_once(carry, loss=loss, args=args):
            p, rng, acc = carry
            rng, sub = jax.random.split(rng)
            val, grads = jax.value_and_grad(loss)(p, *args, sub)
            g = sum(
                jnp.sum(x.astype(jnp.float32) ** 2)
                for x in jax.tree_util.tree_leaves(grads)
            )
            return (p, rng, acc + val + g), (val + g).astype(jnp.float32)

        t0 = time.perf_counter()
        sec = measure_steps(
            step_once, (params, jax.random.PRNGKey(1), jnp.float32(0)), 20, 3
        )
        print(
            f"[{name}] {sec * 1e3:.3f} ms fwd+bwd "
            f"(compile+measure {time.perf_counter() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
