"""SimMIM trainer.

Parity with `/root/reference/utils/trainers/simmim_trainer.py`: masked-L1
reconstruction, PSNR/SSIM over clamped predicted patches vs raw targets,
best checkpoint keyed on ``SSIM + 0.01·PSNR``, unsupervised eval every
``eval.interval`` epochs. The reference's ``fit`` passes a float into its
dict-indexing ``_save_if_best`` (a latent TypeError, `simmim_trainer.py:31`
vs `:138`, SURVEY.md §7) — fixed here by passing the metrics dict.
"""

from __future__ import annotations

import logging
import math
import os
from typing import Dict

import jax

from ...train.steps import make_criterion, make_simmim_steps
from .base import BaseTrainer

logger = logging.getLogger(__name__)


class SimMIMTrainer(BaseTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.patch_size = int(self.config["model"]["patch_size"])
        self.in_channels = int(self.config["model"]["in_channels"])
        self.eval_mode = self.config["eval"].get("mode")
        self.best_score = -math.inf

    def _build_steps(self):
        self.train_step, self.eval_step = make_simmim_steps(
            self.model,
            self.tx,
            patch_size=int(self.config["model"]["patch_size"]),
            channels=int(self.config["model"]["in_channels"]),
            criterion=make_criterion(self.config),
            augment_fn=self._device_augment_fn(),
            grad_accum=int(self.config["training"].get("grad_accum_steps", 1)),
        )

    def _device_augment_fn(self):
        if not bool(self.config.get("data", {}).get("device_augment", False)):
            return None
        from ...config import to_container
        from ...data.device_augment import make_batch_augment_fn, supports_pipeline

        seq = to_container(self.config["transforms"]["train"])
        if not supports_pipeline(seq):
            logger.warning("device_augment requested but pipeline unsupported")
            return None
        logger.info("Device-side train augmentation enabled")
        return make_batch_augment_fn(seq)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        outs = []
        for idx, batch in enumerate(
            self._device_batches(self.train_loader, train_epoch=epoch)
        ):
            self.state, out = self.train_step(self.state, batch)
            outs.append(out)
            self.train_logger.train_log_step(epoch, idx)
        return self._epoch_metrics(outs)

    def validate(self) -> Dict[str, float]:
        outs = []
        base_rng = jax.random.PRNGKey(
            int(self.config["training"].get("random_seed", 0)) + 1
        )
        for idx, batch in enumerate(self._device_batches(self.val_loader)):
            mask_rng = jax.random.fold_in(base_rng, idx)
            outs.append(self.eval_step(self.state, batch, mask_rng))
            self.train_logger.val_log_step(idx)
        return self._epoch_metrics(outs)

    def _epoch_metrics(self, outs) -> Dict[str, float]:
        host = self._fetch(outs)
        metrics = self.metric_handler.calculate_metrics(
            psnr_sse=sum(o["psnr_sse"] for o in host),
            psnr_count=sum(o["psnr_count"] for o in host),
            ssim_sum=sum(o["ssim_sum"] for o in host),
            ssim_count=sum(o["ssim_count"] for o in host),
        )
        # reference epoch Loss = mean of batch losses (`simmim_trainer.py:75-98`)
        metrics["Loss"] = float(sum(o["loss"] for o in host)) / max(len(host), 1)
        return metrics

    def fit(self, num_epochs: int):
        end_epoch = self.start_epoch + num_epochs
        with self.train_logger:
            for epoch in range(self.start_epoch + 1, end_epoch + 1):
                self.current_epoch = epoch
                profiling = self._maybe_start_profile(epoch)
                train_metrics = self.train_epoch(epoch)
                self._stop_profile(profiling)
                val_metrics = self.validate()
                self._log_metrics(train_metrics, val_metrics)
                self.history.update(train_metrics, val_metrics)
                self._save_if_best(epoch, val_metrics)
                self._save_last(epoch)
                if (
                    self.eval_interval
                    and self.eval_mode
                    and epoch % self.eval_interval == 0
                ):
                    logger.info(
                        "Running automatic evaluation (mode: %s)...", self.eval_mode
                    )
                    from ...evaluators.unsupervised_evaluator import run_evaluation

                    self.train_logger.pause()
                    run_evaluation(
                        self.config,
                        bundle=self.bundle,
                        state=self.state,
                        save_path=os.path.join(self.save_path, f"epoch_{epoch}"),
                    )
                    self.train_logger.resume()
            self._join_pending_save()
        self._vizualize()

    def _save_if_best(self, epoch: int, val_metrics: Dict[str, float]):
        score = val_metrics["SSIM"] + 0.01 * val_metrics["PSNR"]
        if score > self.best_score:
            self.best_score = float(score)
            logger.info(
                "New best validation score: %.4f. Saving model...", self.best_score
            )
            self._save("best_model", epoch, {"best_val_score": self.best_score})
