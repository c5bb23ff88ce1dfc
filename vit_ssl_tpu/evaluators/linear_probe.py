"""Linear probe evaluation.

Parity with `/root/reference/evaluators/unsupervised_evaluator.py:69-89`:
sklearn LogisticRegression (lbfgs, max_iter=1000) over frozen features.
sklearn is available in this environment and runs offline on host, exactly
like the reference; an optax on-device probe is available for large
feature sets (``backend="optax"``).
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)


def run_linear_evaluation(
    train_features, train_labels, val_features, val_labels, backend: str = "sklearn"
):
    if backend == "sklearn":
        from sklearn.linear_model import LogisticRegression
        from sklearn.metrics import accuracy_score

        clf = LogisticRegression(max_iter=1000, solver="lbfgs")
        clf.fit(np.asarray(train_features), np.asarray(train_labels))
        preds = clf.predict(np.asarray(val_features))
        accuracy = float(accuracy_score(np.asarray(val_labels), preds))
    else:
        preds, accuracy = _optax_probe(
            train_features, train_labels, val_features, val_labels
        )
    logger.info("Top-1 Linear Probing Accuracy: %.2f%%", accuracy * 100)
    return {"method": "linear", "accuracy": accuracy, "predictions": preds}


def _optax_probe(train_features, train_labels, val_features, val_labels,
                 steps: int = 500, lr: float = 1e-2):
    """On-device multinomial logistic regression (full-batch L-BFGS-free)."""
    import jax
    import jax.numpy as jnp
    import optax

    x = jnp.asarray(np.asarray(train_features), jnp.float32)
    y = jnp.asarray(np.asarray(train_labels), jnp.int32)
    num_classes = int(np.asarray(train_labels).max()) + 1
    mean, std = x.mean(0), x.std(0) + 1e-6
    x = (x - mean) / std

    params = {
        "w": jnp.zeros((x.shape[1], num_classes), jnp.float32),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = x @ p["w"] + p["b"]
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            return ce + 1e-4 * jnp.sum(p["w"] ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(steps):
        params, opt_state, _ = step(params, opt_state)

    xv = (jnp.asarray(np.asarray(val_features), jnp.float32) - mean) / std
    preds = np.asarray(jnp.argmax(xv @ params["w"] + params["b"], axis=-1))
    accuracy = float((preds == np.asarray(val_labels)).mean())
    return preds, accuracy
