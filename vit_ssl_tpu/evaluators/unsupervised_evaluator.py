"""Unsupervised evaluation orchestrator (KNN / linear probe / UMAP).

Parity with `/root/reference/evaluators/unsupervised_evaluator.py`:
features are extracted once via the model's clean inference path and reused
for every mode in ``eval.mode``; results land in
``evaluation_summary.{csv,txt}``. Callable in-training (trainer passes the
live bundle/state) or standalone (`evaluate.py`), where the experiment's
saved config is merged back in.

Improvement over the reference (documented divergence): standalone
evaluation loads the experiment's ``best_model`` checkpoint into the built
model — the reference rebuilds the model *without* loading weights unless
mode is ``eval_dino``, silently evaluating random parameters.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import pandas as pd

from ..config import is_list
from ..data import prepare_dataloaders
from ..data.transforms import Compose, Resize, ToTensor
from .embedding_analysis import prepare_combined_features, run_umap_analysis
from .evaluator_utils import extract_features, merge_with_experiment_config
from .knn import run_knn_evaluation
from .linear_probe import run_linear_evaluation

logger = logging.getLogger(__name__)


@dataclass
class EvalState:
    params: Any
    teacher_params: Any = None
    center: Any = None


def _default_transforms(img_size: int):
    pipeline = Compose([Resize([img_size, img_size]), ToTensor()])
    return {"train": pipeline, "val": pipeline}


def load_model_state(config):
    """Build the experiment's model and load its best checkpoint."""
    from ..models.builder import build_model
    from ..utils.checkpoint import checkpoint_exists, load_checkpoint

    bundle = build_model(config)
    import jax

    trees = bundle.init_fn(jax.random.PRNGKey(0))
    exp_path = config.get("eval", {}).get("experiment_path")
    if bundle.pretrained is not None:
        trees.update({k: v for k, v in bundle.pretrained.items() if v is not None})
    elif exp_path:
        ckpt = os.path.join(exp_path, "best_model")
        if checkpoint_exists(ckpt):
            tree, _ = load_checkpoint(ckpt)
            for key in ("params", "teacher_params", "center"):
                if key in tree:
                    trees[key] = tree[key]
            logger.info("Loaded checkpoint '%s'", ckpt)
        else:
            logger.warning(
                "No best_model checkpoint under %s — evaluating current init "
                "(the reference silently does this too)", exp_path,
            )
    state = EvalState(
        params=trees["params"],
        teacher_params=trees.get("teacher_params"),
        center=trees.get("center"),
    )
    return bundle, state


def run_multiple_evaluations(
    config, train_features, train_labels, val_features, val_labels, save_path
) -> Dict[str, Dict]:
    eval_modes = config["eval"]["mode"]
    if not is_list(eval_modes):
        eval_modes = [eval_modes] if eval_modes else []

    results: Dict[str, Dict] = {}
    for mode in eval_modes:
        logger.info("Running evaluation mode: %s", mode)
        if mode == "eval_knn":
            results[mode] = run_knn_evaluation(
                train_features,
                train_labels,
                val_features,
                val_labels,
                config["eval"]["num_classes"],
            )
        elif mode == "eval_linear":
            results[mode] = run_linear_evaluation(
                train_features, train_labels, val_features, val_labels
            )
        elif mode == "eval_umap":
            features, labels = prepare_combined_features(
                train_features, train_labels, val_features, val_labels
            )
            embedding, metrics, quality, feedback = run_umap_analysis(
                features, labels, save_path
            )
            results[mode] = {
                "method": "umap",
                "embedding": embedding,
                "metrics": metrics,
                "quality": quality,
                "feedback": feedback,
            }
        else:
            logger.warning("Unknown evaluation mode '%s' - skipping", mode)
    return results


def save_combined_results(results: Dict[str, Dict], output_path: str) -> None:
    """`evaluation_summary.{csv,txt}` (`unsupervised_evaluator.py:156-216`)."""
    os.makedirs(output_path, exist_ok=True)
    summary = []
    for mode, result in results.items():
        if result["method"] in ("knn", "linear"):
            summary.append(
                {
                    "Evaluation_Mode": mode,
                    "Method": result["method"].upper(),
                    "Accuracy": f"{result['accuracy'] * 100:.2f}%",
                    "Additional_Info": (
                        f"k={result.get('num_neighbors', 'N/A')}"
                        if result["method"] == "knn"
                        else "Logistic Regression"
                    ),
                }
            )
        elif result["method"] == "umap":
            summary.append(
                {
                    "Evaluation_Mode": mode,
                    "Method": "UMAP",
                    "Quality": result["quality"],
                    "Additional_Info": (
                        f"Silhouette: {result['metrics']['silhouette_features']:.3f}"
                    ),
                }
            )
    if not summary:
        return
    pd.DataFrame(summary).to_csv(
        os.path.join(output_path, "evaluation_summary.csv"), index=False
    )
    with open(os.path.join(output_path, "evaluation_summary.txt"), "w") as f:
        f.write("Multi-Evaluation Summary Report\n")
        f.write("=" * 40 + "\n\n")
        for mode, result in results.items():
            f.write(f"{mode.upper()}:\n")
            f.write("-" * 20 + "\n")
            if result["method"] in ("knn", "linear"):
                f.write(f"  Method: {result['method'].upper()}\n")
                f.write(f"  Accuracy: {result['accuracy'] * 100:.2f}%\n")
                if result["method"] == "knn":
                    f.write(f"  Number of neighbors: {result['num_neighbors']}\n")
            elif result["method"] == "umap":
                f.write("  Method: UMAP\n")
                f.write(f"  Quality: {result['quality']}\n")
                f.write(
                    f"  Silhouette Score: "
                    f"{result['metrics']['silhouette_features']:.4f}\n"
                )
            f.write("\n")
    logger.info("Combined results saved to %s", output_path)


def run_evaluation(
    config,
    bundle=None,
    state=None,
    save_path: Optional[str] = None,
    mesh=None,
) -> Dict[str, Dict]:
    """Run ``eval.mode`` evaluations; features extracted once
    (`unsupervised_evaluator.py:219-254`)."""
    if save_path:
        os.makedirs(save_path, exist_ok=True)

    if "experiment_path" in (config.get("eval", {}) or {}):
        config = merge_with_experiment_config(config)

    if bundle is None or state is None:
        bundle, state = load_model_state(config)

    transforms = _default_transforms(int(config["data"]["img_size"]))
    train_loader, val_loader = prepare_dataloaders(
        config, transforms, config["eval"]["mode"]
    )
    train_features, train_labels = extract_features(bundle, state, train_loader, mesh)
    val_features, val_labels = extract_features(bundle, state, val_loader, mesh)

    output_path = config["eval"].get("experiment_path") or save_path
    results = run_multiple_evaluations(
        config, train_features, train_labels, val_features, val_labels, output_path
    )
    save_combined_results(results, output_path)
    return results
