"""Worker for the 2-process distributed test (tests/test_multihost.py).

Each process: 4 virtual CPU devices (8 global), the framework's
process-sharded DataLoader, `shard_batch` global-array assembly, and a
jitted weighted-CE gradient over the GLOBAL batch. Artifacts (local batch,
gradient) are written to the output dir for the parent test to verify:
per-host batches differ, and the distributed gradient equals a
single-process gradient over the concatenated global batch.
"""

import os
import sys
from pathlib import Path


def loss_fn(w, batch):
    """Weighted cross-entropy of a linear probe over mean-pooled pixels —
    minimal but exercises the full global-batch reduction."""
    import jax.numpy as jnp
    import optax

    feats = batch["image"].astype(jnp.float32).mean(axis=(1, 2))  # (B, C)
    logits = feats @ w
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, batch["label"])
    wgt = batch["weight"]
    return jnp.sum(ce * wgt) / jnp.maximum(jnp.sum(wgt), 1.0)


class ArrayDataset:
    """20 deterministic samples, 4 classes."""

    def __init__(self):
        import numpy as np

        rs = np.random.RandomState(7)
        self.x = rs.rand(20, 8, 8, 3).astype(np.float32)
        self.y = (np.arange(20) % 4).astype(np.int64)

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i, rng=None):
        return self.x[i], int(self.y[i])


def main():
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], Path(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=pid
    )
    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from vit_ssl_tpu.data.loader import DataLoader
    from vit_ssl_tpu.parallel.mesh import create_mesh, replicate, shard_batch

    assert jax.process_count() == 2 and len(jax.devices()) == 8

    loader = DataLoader(
        ArrayDataset(), batch_size=8, shuffle=True, seed=5,
        process_shard=(jax.process_index(), jax.process_count()),
    )
    loader.set_epoch(1)
    batch = next(iter(loader))
    assert batch["image"].shape[0] == 4, batch["image"].shape
    np.savez(
        outdir / f"local_{pid}.npz",
        image=batch["image"], label=batch["label"], weight=batch["weight"],
    )

    mesh = create_mesh(-1)
    global_batch = shard_batch(batch, mesh)
    assert global_batch["image"].shape[0] == 8  # global rows span both hosts

    rs = np.random.RandomState(3)
    w = rs.randn(3, 4).astype(np.float32) * 0.1
    w_repl = replicate(w, mesh)

    grad_fn = jax.jit(jax.grad(loss_fn))
    g = grad_fn(w_repl, global_batch)
    # gradient of a replicated param over a sharded batch is replicated —
    # fetchable on every host
    np.save(outdir / f"grad_{pid}.npy", np.asarray(g))
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
