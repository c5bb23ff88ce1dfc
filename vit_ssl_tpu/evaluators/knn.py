"""On-device cosine-similarity KNN classifier.

TPU-native replacement for the reference's sklearn KNeighborsClassifier
(`/root/reference/evaluators/unsupervised_evaluator.py:38-66`; cosine
metric, k = num_classes, uniform majority vote): one jitted matmul +
top-k + vote over the whole train/val feature matrices — the similarity
matrix lives on device and the MXU does the work. Verified equivalent to
sklearn in tests/test_evaluators.py.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _knn_predict(train_f, train_y, val_f, num_classes_onehot: int, k: int, block: int):
    def normalize(x):
        x = x.astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    tf = normalize(train_f)
    vf = normalize(val_f)

    def predict_block(vb):
        sims = vb @ tf.T  # cosine similarity (both normalized)
        _, idx = jax.lax.top_k(sims, k)
        neighbor_labels = train_y[idx]  # (B, k)
        votes = jax.nn.one_hot(neighbor_labels, num_classes_onehot).sum(axis=1)
        return jnp.argmax(votes, axis=-1)

    n = vf.shape[0]
    pad = (-n) % block
    vf_pad = jnp.pad(vf, ((0, pad), (0, 0)))
    blocks = vf_pad.reshape(-1, block, vf.shape[1])
    preds = jax.lax.map(predict_block, blocks)
    return preds.reshape(-1)[:n]


def run_knn_evaluation(train_features, train_labels, val_features, val_labels, num_classes):
    """k-NN eval (k = num_classes, cosine) — accuracy + predictions."""
    train_f = jnp.asarray(np.asarray(train_features))
    val_f = jnp.asarray(np.asarray(val_features))
    train_y = jnp.asarray(np.asarray(train_labels), jnp.int32)
    k = min(int(num_classes), train_f.shape[0])
    onehot_classes = int(np.asarray(train_labels).max()) + 1
    preds = np.asarray(
        _knn_predict(train_f, train_y, val_f, onehot_classes, k, 256)
    )
    accuracy = float((preds == np.asarray(val_labels)).mean())
    logger.info("Top-1 k-NN Accuracy: %.2f%%", accuracy * 100)
    return {
        "method": "knn",
        "accuracy": accuracy,
        "predictions": preds,
        "num_neighbors": k,
    }
