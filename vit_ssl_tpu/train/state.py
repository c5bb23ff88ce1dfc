"""Functional train state + optimizer factory.

Replaces the reference's mutable trainer attributes (model, optimizer,
GradScaler — `/root/reference/utils/trainers/base_trainer.py:28-44`) with
one explicit pytree threaded through the jitted step. DINO's mutable module
state (teacher weights, center buffer) lives here too, so the entire step
(forward, backward, optimizer, EMA teacher, center EMA) is one compiled
XLA program (SURVEY.md §7 hard-part #2).

No GradScaler is needed: bf16 on TPU has fp32's exponent range, so the
reference's CUDA loss-scaling machinery has no TPU equivalent to port.

The optimizer factory mirrors ``make_optimizer``'s reflection over
``torch.optim`` (`/root/reference/utils/train_utils.py:25-29`) with an
optax registry, over trainable params only (freeze masks).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    # DINO extras (None for other modes)
    teacher_params: Any = None
    center: Any = None

    def next_rng(self, n: int = 1):
        """Derive per-step rngs; fold_in(step) keeps streams independent."""
        base = jax.random.fold_in(self.rng, self.step)
        return jax.random.split(base, n)


_OPTIMIZERS: dict = {
    "AdamW": lambda lr, p: optax.adamw(
        learning_rate=lr,
        b1=tuple(p.get("betas", (0.9, 0.999)))[0],
        b2=tuple(p.get("betas", (0.9, 0.999)))[1],
        eps=float(p.get("eps", 1e-8)),
        weight_decay=float(p.get("weight_decay", 1e-2)),
    ),
    "Adam": lambda lr, p: optax.adam(
        learning_rate=lr,
        b1=tuple(p.get("betas", (0.9, 0.999)))[0],
        b2=tuple(p.get("betas", (0.9, 0.999)))[1],
        eps=float(p.get("eps", 1e-8)),
    ),
    "SGD": lambda lr, p: optax.sgd(
        learning_rate=lr,
        momentum=float(p.get("momentum", 0.0)),
        nesterov=bool(p.get("nesterov", False)),
    ),
    "RMSprop": lambda lr, p: optax.rmsprop(
        learning_rate=lr,
        decay=float(p.get("alpha", 0.99)),
        eps=float(p.get("eps", 1e-8)),
        momentum=float(p.get("momentum", 0.0)),
    ),
}


def make_optimizer(
    config,
    lr_schedule: Callable,
    trainable_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Name-keyed optimizer factory (`train_utils.py:25-29` parity).

    ``trainable_mask``: pytree of bools matching params; False leaves get
    zero updates (the reference passes only ``requires_grad`` params to the
    optimizer — `freeze_backbone`, `utils/model_builder.py:92-101`).
    """
    opt_cfg = config["training"]["optimizer"]
    name = opt_cfg["name"]
    if name not in _OPTIMIZERS:
        raise ValueError(f"Unknown optimizer '{name}' (have {sorted(_OPTIMIZERS)})")
    params = dict(opt_cfg.get("params", {}) or {})
    params.pop("lr", None)  # the schedule owns the lr
    tx = _OPTIMIZERS[name](lr_schedule, params)
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", trainable_mask
            ),
        )
    return tx


def create_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    teacher_params: Any = None,
    center: Any = None,
) -> TrainState:
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng,
        teacher_params=teacher_params,
        center=center,
    )
