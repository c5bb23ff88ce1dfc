"""Learning-rate schedules with reference-exact semantics.

The reference composes a per-step linear warmup
(`/root/reference/utils/schedulers.py:1-19`) with torch's
``CosineAnnealingLR`` stepped once per epoch after warmup
(`base_trainer.py:79-82`). Two subtleties are reproduced exactly:

1. Warmup applies the new lr **after** each optimizer step
   (`supervised_trainer.py:42-43`), so step ``i`` (0-based) trains at
   ``start + i/W · (target - start)``.
2. ``CosineAnnealingLR`` uses its *recursive* update from the current lr —
   which the warmup left at ``target`` — not from the optimizer's base lr,
   so the decay telescopes to the closed form
   ``eta_min + (target - eta_min)·(1 + cos(π·t/T))/2`` with
   ``t = completed-post-warmup-epochs`` and ``T = num_epochs - warmup_epochs``.

Everything is a pure function of the global step so it lives inside the
jitted train step (no host-side ``param_group`` mutation). A per-step
cosine variant is available via ``training.lr_scheduler.granularity: step``
(TPU-friendlier curve; off by default for parity).
"""

from __future__ import annotations

import jax.numpy as jnp


def reference_lr_schedule(
    *,
    start_lr: float,
    target_lr: float,
    eta_min: float,
    warmup_epochs: int,
    num_epochs: int,
    steps_per_epoch: int,
    granularity: str = "epoch",
):
    """Returns ``lr(step)`` for optax, step = completed optimizer steps."""
    warmup_steps = max(1, warmup_epochs * steps_per_epoch)
    t_max = max(1, num_epochs - warmup_epochs)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.minimum(step, warmup_steps) / warmup_steps
        warmup_lr = start_lr + frac * (target_lr - start_lr)

        if granularity == "step":
            post = jnp.maximum(step - warmup_steps, 0.0)
            t = post / steps_per_epoch
        else:
            # torch steps the cosine once per completed epoch after warmup;
            # epoch warmup+1 runs entirely at target_lr (t = 0).
            epoch = jnp.floor(step / steps_per_epoch) + 1.0
            t = jnp.maximum(epoch - warmup_epochs - 1.0, 0.0)
        t = jnp.minimum(t, t_max)
        cosine_lr = eta_min + (target_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / t_max)
        )
        return jnp.where(step < warmup_steps, warmup_lr, cosine_lr)

    return schedule


def lr_schedule_from_config(config, steps_per_epoch: int):
    """Build the schedule from the reference config keys
    (`configs/base/training.yaml`)."""
    training = config["training"]
    sched_cfg = training.get("lr_scheduler", {}) or {}
    main = sched_cfg.get("main", {}) or {}
    eta_min = float((main.get("params", {}) or {}).get("eta_min", 0.0))
    granularity = str(sched_cfg.get("granularity", "epoch"))
    return reference_lr_schedule(
        start_lr=float(training["warmup_initial_learning_rate"]),
        target_lr=float(training["warmup_final_learning_rate"]),
        eta_min=eta_min,
        warmup_epochs=int(training["warmup_epochs"]),
        num_epochs=int(training["num_epochs"]),
        steps_per_epoch=steps_per_epoch,
        granularity=granularity,
    )
