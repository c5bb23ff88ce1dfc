"""Unsupervised evaluation orchestrator (KNN / linear probe / UMAP).

Capability parity with `/root/reference/evaluators/unsupervised_evaluator.py`:
features are extracted once via the model's clean inference path and reused
for every mode in ``eval.mode``; a combined summary lands in
``evaluation_summary.{csv,txt}``. Callable in-training (the trainer passes
the live bundle/state) or standalone (`evaluate.py`), where the
experiment's saved config is merged back in.

The orchestration is this framework's own design: evaluation modes are
entries in a registry (mode name → runner), every runner returns a uniform
:class:`EvalOutcome`, and the summary artifacts are rendered generically
from the outcome list — adding an evaluation mode means registering one
function, not editing report writers.

Improvement over the reference (documented divergence): standalone
evaluation loads the experiment's ``best_model`` checkpoint into the built
model — the reference rebuilds the model *without* loading weights unless
mode is ``eval_dino``, silently evaluating random parameters.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

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


@dataclass
class FeatureBank:
    """Features extracted once, shared by every evaluation mode."""

    train_features: Any
    train_labels: Any
    val_features: Any
    val_labels: Any


@dataclass
class EvalOutcome:
    """Uniform result record every mode runner returns."""

    mode: str
    method: str
    headline: str  # one-line result, e.g. "Accuracy: 93.10%"
    scalars: Dict[str, float] = field(default_factory=dict)
    notes: List[str] = field(default_factory=list)
    payload: Dict[str, Any] = field(default_factory=dict)  # arrays etc.


def _default_transforms(img_size: int):
    pipeline = Compose([Resize([img_size, img_size]), ToTensor()])
    return {"train": pipeline, "val": pipeline}


def load_model_state(config):
    """Build the experiment's model and load its trained weights.

    Priority: the experiment's own ``best_model`` checkpoint (what the
    reference's evaluators load, `supervised_evaluator.py:30-43`) wins
    over re-deriving weights from ``training.pretrained_path``. The
    pretrained path is only a fallback (evaluating a finetune experiment
    that never completed an epoch), and it goes through the same
    ``load_weights`` surgery as training — the surgery tree is PARTIAL
    (e.g. DINO→ViT skips the patch embedding by default), so raw
    tree-replacement would produce an un-applyable params dict.
    """
    from ..models.builder import build_model, load_weights
    from ..utils.checkpoint import checkpoint_exists, load_checkpoint

    bundle = build_model(config)
    import jax

    trees = bundle.init_fn(jax.random.PRNGKey(0))
    exp_path = config.get("eval", {}).get("experiment_path")
    ckpt = os.path.join(exp_path, "best_model") if exp_path else None
    if bundle.mode != "eval_dino" and ckpt and checkpoint_exists(ckpt):
        tree, _ = load_checkpoint(ckpt)
        for key in ("params", "teacher_params", "center"):
            if key in tree:
                trees[key] = tree[key]
        logger.info("Loaded checkpoint '%s'", ckpt)
    elif bundle.pretrained is not None:
        # eval_dino: bundle.pretrained IS the experiment's best_model
        # (complete student/teacher/center trees). finetune fallback:
        # partial surgery source — merge, don't replace.
        if bundle.mode == "finetune":
            extended = bool(config["training"].get("extended_transfer", False))
            from ..train.trainers.supervised import _merged_pre

            trees["params"] = load_weights(
                trees["params"], _merged_pre(bundle.pretrained), extended
            )
            logger.warning(
                "No best_model under %s — evaluating the pretrained-path "
                "surgery weights (untrained head)", exp_path,
            )
        else:
            trees.update(
                {k: v for k, v in bundle.pretrained.items() if v is not None}
            )
    elif exp_path:
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


# --- mode registry ----------------------------------------------------------


def _run_knn(bank: FeatureBank, config, save_path) -> EvalOutcome:
    res = run_knn_evaluation(
        bank.train_features, bank.train_labels,
        bank.val_features, bank.val_labels,
        config["eval"]["num_classes"],
    )
    return EvalOutcome(
        mode="eval_knn",
        method="KNN",
        headline=f"Accuracy: {res['accuracy'] * 100:.2f}%",
        scalars={"accuracy": float(res["accuracy"])},
        notes=[f"k={res.get('num_neighbors', '?')} (cosine)"],
        payload=res,
    )


def _run_linear(bank: FeatureBank, config, save_path) -> EvalOutcome:
    res = run_linear_evaluation(
        bank.train_features, bank.train_labels,
        bank.val_features, bank.val_labels,
    )
    return EvalOutcome(
        mode="eval_linear",
        method="LINEAR",
        headline=f"Accuracy: {res['accuracy'] * 100:.2f}%",
        scalars={"accuracy": float(res["accuracy"])},
        notes=["Logistic Regression"],
        payload=res,
    )


def _run_umap(bank: FeatureBank, config, save_path) -> EvalOutcome:
    features, labels = prepare_combined_features(
        bank.train_features, bank.train_labels,
        bank.val_features, bank.val_labels,
    )
    embedding, metrics, quality, feedback = run_umap_analysis(
        features, labels, save_path
    )
    return EvalOutcome(
        mode="eval_umap",
        method="UMAP",
        headline=f"Quality: {quality}",
        scalars={
            k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))
        },
        notes=[f"Silhouette: {metrics['silhouette_features']:.3f}", *feedback],
        payload={
            "method": "umap",
            "embedding": embedding,
            "metrics": metrics,
            "quality": quality,
            "feedback": feedback,
        },
    )


_MODE_REGISTRY: Dict[str, Callable[[FeatureBank, Any, str], EvalOutcome]] = {
    "eval_knn": _run_knn,
    "eval_linear": _run_linear,
    "eval_umap": _run_umap,
}


def _requested_modes(config) -> List[str]:
    modes = config["eval"]["mode"]
    if not is_list(modes):
        modes = [modes] if modes else []
    return list(modes)


def run_modes(config, bank: FeatureBank, save_path: str) -> List[EvalOutcome]:
    """Dispatch every requested ``eval.mode`` through the registry."""
    outcomes: List[EvalOutcome] = []
    for mode in _requested_modes(config):
        runner = _MODE_REGISTRY.get(mode)
        if runner is None:
            logger.warning("Unknown evaluation mode '%s' - skipping", mode)
            continue
        logger.info("Running evaluation mode: %s", mode)
        outcomes.append(runner(bank, config, save_path))
    return outcomes


# --- summary rendering ------------------------------------------------------


def render_summary(outcomes: List[EvalOutcome], output_path: str) -> None:
    """`evaluation_summary.{csv,txt}` rendered generically from outcomes
    (same artifact names/columns as the reference's summary so downstream
    tooling keeps working)."""
    if not outcomes:
        return
    os.makedirs(output_path, exist_ok=True)

    def row(o: EvalOutcome) -> Dict[str, str]:
        cells = {"Evaluation_Mode": o.mode, "Method": o.method}
        label, _, value = o.headline.partition(": ")
        cells[label] = value
        if o.notes:
            cells["Additional_Info"] = o.notes[0]
        return cells

    pd.DataFrame([row(o) for o in outcomes]).to_csv(
        os.path.join(output_path, "evaluation_summary.csv"), index=False
    )

    blocks = ["Multi-Evaluation Summary Report", "=" * 40, ""]
    for o in outcomes:
        blocks.append(f"{o.mode.upper()}:")
        blocks.append("-" * 20)
        blocks.append(f"  Method: {o.method}")
        blocks.append(f"  {o.headline}")
        blocks.extend(f"  {note}" for note in o.notes)
        blocks.append("")
    with open(os.path.join(output_path, "evaluation_summary.txt"), "w") as fh:
        fh.write("\n".join(blocks))
    logger.info("Combined results saved to %s", output_path)


# --- back-compat shims (round-1 public names) --------------------------------


def run_multiple_evaluations(
    config, train_features, train_labels, val_features, val_labels, save_path
) -> Dict[str, Dict]:
    """Dict-shaped wrapper around :func:`run_modes` (kept for callers that
    used the round-1 surface)."""
    bank = FeatureBank(train_features, train_labels, val_features, val_labels)
    outcomes = run_modes(config, bank, save_path)
    return {o.mode: _as_legacy_dict(o) for o in outcomes}


def _as_legacy_dict(o: EvalOutcome) -> Dict[str, Any]:
    if o.mode == "eval_umap":
        return dict(o.payload)
    legacy = dict(o.payload)
    legacy.setdefault("method", o.method.lower())
    return legacy


def save_combined_results(results: Dict[str, Dict], output_path: str) -> None:
    """Legacy-dict wrapper around :func:`render_summary`."""
    outcomes = []
    for mode, res in results.items():
        if res.get("method") == "umap":
            outcomes.append(
                EvalOutcome(
                    mode=mode, method="UMAP",
                    headline=f"Quality: {res['quality']}",
                    notes=[f"Silhouette: {res['metrics']['silhouette_features']:.3f}"],
                )
            )
        else:
            outcomes.append(
                EvalOutcome(
                    mode=mode, method=str(res.get("method", "?")).upper(),
                    headline=f"Accuracy: {res['accuracy'] * 100:.2f}%",
                    notes=[
                        f"k={res['num_neighbors']} (cosine)"
                        if "num_neighbors" in res else "Logistic Regression"
                    ],
                )
            )
    render_summary(outcomes, output_path)


# --- entry point -------------------------------------------------------------


def run_evaluation(
    config,
    bundle=None,
    state=None,
    save_path: Optional[str] = None,
    mesh=None,
) -> Dict[str, Dict]:
    """Extract features once, dispatch every ``eval.mode``, render the
    summary. Returns {mode: legacy-dict} for compatibility."""
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
    bank = FeatureBank(
        *extract_features(bundle, state, train_loader, mesh),
        *extract_features(bundle, state, val_loader, mesh),
    )

    output_path = config["eval"].get("experiment_path") or save_path
    outcomes = run_modes(config, bank, output_path)
    render_summary(outcomes, output_path)
    return {o.mode: _as_legacy_dict(o) for o in outcomes}
