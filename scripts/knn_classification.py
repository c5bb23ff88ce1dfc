#!/usr/bin/env python
"""Standalone k-NN classification CLI.

Thin entry duplicating the KNN path of the unsupervised evaluator, as the
reference ships (`/root/reference/evaluators/unsupervised_evaluators/
knn_classification.py:22-47`): extract features from an experiment's model,
fit cosine k-NN (k = num_classes), log top-1 accuracy.

    python scripts/knn_classification.py eval.experiment_path=<run_dir> ...
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s")
for noisy in ("orbax", "absl", "jax", "etils"):
    logging.getLogger(noisy).setLevel(logging.WARNING)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", "-cn", default="eval_config")
    parser.add_argument("--config-path", "-cp", default="configs")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from vit_ssl_tpu.config import compose
    from vit_ssl_tpu.data import prepare_dataloaders
    from vit_ssl_tpu.evaluators import (
        extract_features,
        merge_with_experiment_config,
        run_knn_evaluation,
    )
    from vit_ssl_tpu.evaluators.unsupervised_evaluator import (
        _default_transforms,
        load_model_state,
    )

    config = compose(args.config_path, args.config_name, args.overrides)
    if "experiment_path" in config.get("eval", {}):
        config = merge_with_experiment_config(config)
    bundle, state = load_model_state(config)

    transforms = _default_transforms(int(config["data"]["img_size"]))
    train_loader, val_loader = prepare_dataloaders(
        config, transforms, config["eval"]["mode"]
    )
    train_f, train_y = extract_features(bundle, state, train_loader)
    val_f, val_y = extract_features(bundle, state, val_loader)
    return run_knn_evaluation(
        train_f, train_y, val_f, val_y, int(config["eval"]["num_classes"])
    )


if __name__ == "__main__":
    main()
