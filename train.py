#!/usr/bin/env python
"""Training entry point — same CLI surface as the reference's Hydra main
(`/root/reference/train.py:103-133`):

    python train.py                                # default config (dino)
    python train.py --config-name supervised       # pick a mode preset
    python train.py training.type=finetune training.pretrained_path=...
    python train.py training.num_epochs=50 data.img_size=96   # overrides

Composes the config, creates the run dir from ``hydra.run.dir`` (saving
``.hydra/config.yaml`` + ``overrides.yaml`` exactly like Hydra so the
standalone evaluators can re-merge them), builds the data pipeline, model,
and device mesh, and runs the mode's trainer.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s | %(levelname)s | %(message)s",
    handlers=[logging.StreamHandler(), logging.FileHandler("train.log")],
)
for noisy in ("orbax", "absl", "jax", "etils"):
    logging.getLogger(noisy).setLevel(logging.WARNING)
logger = logging.getLogger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config-name", "-cn", default="config", help="config root to compose"
    )
    parser.add_argument(
        "--config-path", "-cp", default="configs", help="config directory"
    )
    parser.add_argument(
        "overrides", nargs="*",
        help="hydra-style overrides: dotlist (a.b=c) and config groups "
             "(group@package=option, +group@package=option)",
    )
    parser.add_argument(
        "-m", "--multirun", action="store_true",
        help="Hydra-style sweep: expand comma-list overrides "
             "(training.lr=1e-4,1e-3) into the cartesian product of jobs "
             "and run them sequentially under multirun/<timestamp>/<job>",
    )
    return parser.parse_args(argv)


def get_save_path(config) -> str:
    """Run-dir policy parity (`train.py:90-101`): resume re-homes into the
    original experiment dir; otherwise ``hydra.run.dir`` is created."""
    resume = config["training"].get("resume_from_checkpoint", None)
    if resume:
        resume_dir = os.path.dirname(resume)
        assert os.path.exists(
            resume_dir
        ), f"resume_from_checkpoint: {resume_dir} does not exist!"
        return resume_dir
    run_dir = config.get("hydra", {}).get("run", {}).get("dir", ".")
    return run_dir


def save_run_config(config, overrides, save_path: str) -> None:
    from vit_ssl_tpu.config import save_yaml, to_container

    hydra_dir = os.path.join(save_path, ".hydra")
    os.makedirs(hydra_dir, exist_ok=True)
    cfg = to_container(config)
    cfg.pop("hydra", None)
    save_yaml(cfg, os.path.join(hydra_dir, "config.yaml"))
    save_yaml(list(overrides), os.path.join(hydra_dir, "overrides.yaml"))


def get_trainer(mode, bundle, save_path, config, train_loader, val_loader, mesh):
    from vit_ssl_tpu.train import DINOTrainer, SimMIMTrainer, SupervisedTrainer

    if mode in ("supervised", "finetune"):
        cls = SupervisedTrainer
    elif mode == "simmim":
        cls = SimMIMTrainer
    elif mode == "dino":
        cls = DINOTrainer
    else:
        raise ValueError(f"Unknown training mode: {mode}")
    return cls(bundle, save_path, config, train_loader, val_loader, mesh)


def run_multirun(args):
    """Sequential sweep over the cartesian product of comma-list overrides
    (Hydra `-m` parity — the reference gets this from ``@hydra.main``,
    `/root/reference/train.py:103`). Each job runs the full single-run
    path with its run dir pinned to ``<sweep_dir>/<job_idx>`` (Hydra's
    BasicSweeper layout: ``multirun/<date>/<time>/<n>``); the sweep's
    overrides are recorded in ``<sweep_dir>/multirun.yaml``."""
    import datetime

    from vit_ssl_tpu.config import expand_multirun, save_yaml

    jobs = expand_multirun(args.overrides)
    now = datetime.datetime.now()
    sweep_dir = os.path.join(
        "multirun", now.strftime("%Y-%m-%d"), now.strftime("%H-%M-%S")
    )
    os.makedirs(sweep_dir, exist_ok=True)
    save_yaml(
        {"overrides": list(args.overrides), "n_jobs": len(jobs)},
        os.path.join(sweep_dir, "multirun.yaml"),
    )
    logger.info("Multirun: %d job(s) under %s", len(jobs), sweep_dir)
    run_dirs = []
    for idx, job_overrides in enumerate(jobs):
        job_dir = os.path.join(sweep_dir, str(idx))
        logger.info(
            "Multirun job %d/%d: %s", idx, len(jobs), " ".join(job_overrides)
        )
        # pinned LAST so it wins over any user-supplied hydra.run.dir —
        # in a sweep, a shared literal run dir would overwrite every job
        run_dirs.append(
            run_single(
                args.config_path,
                args.config_name,
                list(job_overrides) + [f"hydra.run.dir={job_dir}"],
            )
        )
    return run_dirs


def main(argv=None):
    args = parse_args(argv)
    if args.multirun:
        return run_multirun(args)
    return run_single(args.config_path, args.config_name, args.overrides)


def run_single(config_path, config_name, overrides):
    from vit_ssl_tpu.config import (
        compose,
        preflight_eval_data,
        validate_train_config,
    )
    from vit_ssl_tpu.data import get_transforms, prepare_dataloaders
    from vit_ssl_tpu.models.builder import build_model
    from vit_ssl_tpu.parallel import mesh_from_config

    config = compose(config_path, config_name, overrides)
    validate_train_config(config)
    preflight_eval_data(config)
    mode = str(config["training"]["type"]).lower()
    logger.info("Starting training with mode: %s", mode)

    import jax

    # rbg PRNG: ~30% faster DINO steps on TPU (dropout-bit generation is a
    # real cost with threefry at ViT-S scale). Streams differ from threefry
    # but have no parity obligation (the reference uses torch RNG).
    rng_impl = str(config["training"].get("rng_impl", "rbg"))
    jax.config.update("jax_default_prng_impl", rng_impl)

    # Multi-host (DCN-spanning) data parallelism: same mesh code over all
    # processes' devices — the reference is single-process only (SURVEY §2.6)
    if bool(config.get("parallel", {}).get("multihost", False)):
        jax.distributed.initialize()
        logger.info(
            "Initialized multi-host: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )

    logger.info(
        "JAX backend: %s (%d devices)", jax.default_backend(), jax.device_count()
    )
    mesh = mesh_from_config(config)
    logger.info("Device mesh: %s", mesh)

    transforms = get_transforms(config)
    train_loader, val_loader = prepare_dataloaders(config, transforms, mode)
    bundle = build_model(config)

    save_path = get_save_path(config)
    os.makedirs(save_path, exist_ok=True)
    save_run_config(config, overrides, save_path)
    logger.info("Run directory: %s", save_path)

    trainer = get_trainer(
        mode, bundle, save_path, config, train_loader, val_loader, mesh
    )
    resume = config["training"].get("resume_from_checkpoint", None)
    # Elastic restart (TPU-native addition, no reference counterpart):
    # with training.auto_resume=true and a pinned hydra.run.dir, rerunning
    # the SAME command after a preemption picks up <run>/preempt_model and
    # trains up to the ORIGINAL training.num_epochs total — so a scheduler
    # retry loop (`until python train.py ...; do :; done`) converges to
    # exactly the requested run. Manual resume_from_checkpoint keeps the
    # reference's epochs-to-run semantics and takes precedence.
    auto_resumed = False
    if not resume and bool(config["training"].get("auto_resume", False)):
        candidate = os.path.join(save_path, "preempt_model")
        if os.path.isdir(candidate):
            resume = candidate
            auto_resumed = True
            logger.info("auto_resume: picking up %s", candidate)
    if resume:
        trainer.resume_from(resume)

    epochs_to_run = int(config["training"]["num_epochs"])
    if auto_resumed:
        epochs_to_run = max(0, epochs_to_run - trainer.start_epoch)

    # Preemption-safe training (vit_ssl_tpu/utils/preempt.py): SIGTERM /
    # SIGUSR1 checkpoints the mid-epoch state and exits 75 (EX_TEMPFAIL);
    # resume_from_checkpoint=<run>/preempt_model continues bit-exactly.
    from vit_ssl_tpu.utils.preempt import (
        PREEMPT_EXIT_CODE,
        PreemptionRequested,
        install_preemption_handler,
        uninstall_preemption_handler,
    )

    if bool(config["training"].get("preempt_checkpointing", True)):
        install_preemption_handler()
    try:
        trainer.fit(epochs_to_run)
    except PreemptionRequested as e:
        path = trainer.save_preempt(e)
        logger.warning(
            "Preempted at epoch %d after %d batches; state saved to %s. "
            "Resume with training.resume_from_checkpoint=%s",
            e.epoch, e.batches_done, path, path,
        )
        raise SystemExit(PREEMPT_EXIT_CODE)
    finally:
        uninstall_preemption_handler()
    if auto_resumed:
        # the preemption checkpoint is consumed; a stale one would shadow
        # future auto_resume reruns in the same pinned run dir
        import shutil

        shutil.rmtree(os.path.join(save_path, "preempt_model"), ignore_errors=True)
    logger.info("Training completed for mode: %s", mode)
    return save_path


if __name__ == "__main__":
    main()
