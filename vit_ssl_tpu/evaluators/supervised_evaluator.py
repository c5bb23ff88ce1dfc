"""Supervised evaluation: accuracy, predictions CSV, confusion matrix.

Parity with `/root/reference/evaluators/supervised_evaluator.py`: loads the
experiment's best checkpoint, runs full val-set inference, writes
``predictions.csv`` and a seaborn confusion-matrix heatmap. The reference's
``save_results`` crashes with a NameError when ``save_confusion_matrix`` is
false (`supervised_evaluator.py:77,88`, SURVEY.md §7) — fixed here. The
in-training hook receives precomputed predictions to skip re-inference
(`:118-121`).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np
import pandas as pd

from ..data import prepare_dataloaders
from ..data.transforms import Compose, Resize, ToTensor
from ..parallel import shard_batch
from .evaluator_utils import merge_with_experiment_config

logger = logging.getLogger(__name__)


def _default_transforms(img_size: int):
    pipeline = Compose([Resize([img_size, img_size]), ToTensor()])
    return {"train": pipeline, "val": pipeline}


def evaluate(bundle, state, dataloader, mesh=None):
    """Full inference over a loader → (accuracy, preds, labels)."""
    module = bundle.module

    @jax.jit
    def forward(params, x):
        return jax.numpy.argmax(module.apply({"params": params}, x), axis=-1)

    all_preds, all_labels = [], []
    for batch in dataloader:
        x = shard_batch(batch["image"], mesh)
        preds = np.asarray(jax.device_get(forward(state.params, x)))
        keep = np.asarray(batch["weight"]) > 0
        all_preds.append(preds[keep])
        all_labels.append(np.asarray(batch["label"])[keep])
    preds = np.concatenate(all_preds)
    labels = np.concatenate(all_labels)
    accuracy = float((preds == labels).mean())
    return accuracy, preds, labels


def save_results(save_confusion_matrix, accuracy, preds, labels, output_dir):
    os.makedirs(output_dir, exist_ok=True)
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    pd.DataFrame({"label": labels.tolist(), "prediction": preds.tolist()}).to_csv(
        os.path.join(output_dir, "predictions.csv"), index=False
    )
    results = {"top1_accuracy": accuracy}
    if save_confusion_matrix:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns
        from sklearn.metrics import confusion_matrix

        cm = confusion_matrix(labels, preds)
        plt.figure(figsize=(10, 8))
        sns.heatmap(cm, annot=True, fmt="d", cmap="Blues")
        plt.xlabel("Predicted")
        plt.ylabel("True")
        plt.title("Confusion Matrix")
        heatmap_path = os.path.join(output_dir, "confusion_matrix.png")
        plt.savefig(heatmap_path)
        plt.close()
        results["confusion_matrix_image"] = heatmap_path

    logger.info("Top-1 Accuracy: %.2f%%", accuracy * 100)
    logger.info("Results saved to %s", output_dir)
    return results


def run_evaluation(
    config,
    bundle=None,
    state=None,
    save_path: Optional[str] = None,
    accuracy: Optional[float] = None,
    preds=None,
    labels=None,
    mesh=None,
):
    if save_path:
        os.makedirs(save_path, exist_ok=True)

    if "experiment_path" in (config.get("eval", {}) or {}):
        config = merge_with_experiment_config(config)

    if bundle is None or state is None:
        from .unsupervised_evaluator import load_model_state

        bundle, state = load_model_state(config)

    if any(x is None for x in (accuracy, preds, labels)):
        transforms = _default_transforms(int(config["data"]["img_size"]))
        _, val_loader = prepare_dataloaders(config, transforms, "eval_knn")
        accuracy, preds, labels = evaluate(bundle, state, val_loader, mesh)

    return save_results(
        config["eval"].get("save_confusion_matrix", False),
        accuracy,
        preds,
        labels,
        config["eval"].get("experiment_path") or save_path,
    )
