#!/usr/bin/env python
"""Standalone evaluation entry point — the reference exposes this as
``python evaluators/unsupervised_evaluator.py`` and
``python evaluators/supervised_evaluator.py`` Hydra mains
(`/root/reference/evaluators/*_evaluator.py:__main__`); here one CLI
dispatches on the composed config:

    python evaluate.py --config-name eval_config eval.experiment_path=...
    python evaluate.py --config-name supervised_eval eval.experiment_path=...
    python evaluate.py --config-name unsupervised_eval 'eval.mode=[eval_knn,eval_umap]'

Configs with ``eval.mode`` run the unsupervised suite (KNN / linear probe /
UMAP); configs without it run the supervised accuracy + confusion-matrix
evaluation.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s"
)
for noisy in ("orbax", "absl", "jax", "etils"):
    logging.getLogger(noisy).setLevel(logging.WARNING)
logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", "-cn", default="eval_config")
    parser.add_argument("--config-path", "-cp", default="configs")
    parser.add_argument("overrides", nargs="*")
    parser.add_argument(
        "-m", "--multirun", action="store_true",
        help="Hydra-style sweep: expand comma-list overrides into the "
             "cartesian product of jobs and evaluate them sequentially",
    )
    args = parser.parse_args(argv)
    if args.multirun:
        from vit_ssl_tpu.config import expand_multirun

        jobs = expand_multirun(args.overrides)
        logger.info("Multirun: %d evaluation job(s)", len(jobs))
        return [
            _run_one(args.config_path, args.config_name, job) for job in jobs
        ]
    return _run_one(args.config_path, args.config_name, args.overrides)


def _run_one(config_path, config_name, overrides):
    from vit_ssl_tpu.config import compose, validate_eval_config

    config = compose(config_path, config_name, overrides)

    if config.get("eval", {}).get("mode"):
        validate_eval_config(config)
        from vit_ssl_tpu.evaluators.unsupervised_evaluator import run_evaluation
    else:
        from vit_ssl_tpu.evaluators.supervised_evaluator import run_evaluation

    return run_evaluation(config)


if __name__ == "__main__":
    main()
