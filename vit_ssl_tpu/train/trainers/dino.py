"""DINO trainer.

Parity with `/root/reference/utils/trainers/dino_trainer.py`: per-epoch
teacher-temperature and teacher-momentum schedules (epoch-granular like the
reference, `dino_trainer.py:17-21,80`), multi-view batches, EMA teacher
update after each optimizer step, collapse-monitoring metrics computed on
the **last batch only** (`:114-118`), best checkpoint keyed on
``CosineSim - |CenterNorm-1| - |StudentSTD-TeacherSTD|``, and unsupervised
eval every ``eval.interval`` epochs. The centre buffer also advances during
validation (reference behavior — the teacher forward updates it under
``no_grad``)."""

from __future__ import annotations

import logging
import math
import os
from typing import Dict

import jax.numpy as jnp

from ...models.dino import cosine_momentum_schedule, teacher_temp_schedule
from ...train.steps import make_dino_steps
from .base import BaseTrainer

logger = logging.getLogger(__name__)


class DINOTrainer(BaseTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        training = self.config.training
        self.m_start = float(training.teacher_momentum_start)
        self.m_end = float(training.teacher_momentum_final)
        temp_final = training.get("teacher_temp_final", None)
        if temp_final is None:
            temp_final = training.teacher_temp
        self.t_start = float(training.teacher_temp)
        self.t_end = float(temp_final)
        self.temp_kind = str(training.get("teacher_temp_scheduler", "cosine"))
        # Documented divergence (flag-gated, reference default off): the
        # reference steps the teacher-momentum/temperature schedules once
        # per EPOCH (`dino_trainer.py:17-21,80`) where the DINO paper is
        # step-granular (SURVEY.md §7 quirk list). With
        # training.step_granular_schedules=true both schedules advance
        # every optimizer step along the *same* cosine curve (fractional
        # epoch index), coinciding with the reference values at each epoch
        # boundary. Free at runtime: the temp/momentum scalars are traced
        # arguments of the jitted step, so per-batch values don't recompile.
        self.step_granular = bool(
            training.get("step_granular_schedules", False)
        )
        self.eval_mode = self.config["eval"].get("mode")
        self.best_score = -math.inf

    def _build_steps(self):
        training = self.config.training
        view_fn = None
        if bool(self.config.get("data", {}).get("device_augment", False)):
            from ...config import to_container
            from ...data.device_augment import make_multicrop_fn

            transforms = to_container(self.config["transforms"])
            view_fn = make_multicrop_fn(
                transforms["globals"],
                transforms["locals"],
                int(training.num_global_views),
                int(training.num_all_views),
            )
            logger.info("Device-side multi-crop augmentation enabled")
        self.train_step, self.eval_step = make_dino_steps(
            self.model,
            self.tx,
            num_global_views=int(training.num_global_views),
            num_all_views=int(training.num_all_views),
            student_temp=float(training.student_temp),
            center_momentum=float(self.config.model.center_momentum),
            view_fn=view_fn,
            # reference parity: model.train() keeps the teacher's dropout
            # active during training; training.teacher_dropout=false gives
            # the paper-correct deterministic teacher (~3% faster)
            teacher_dropout=bool(
                self.config.training.get("teacher_dropout", True)
            ),
            grad_accum=int(self.config.training.get("grad_accum_steps", 1)),
            # block-diagonal sequence packing of the student's local
            # crops into the fused kernel's profitable regime
            # (model.dino_pack_locals; measured on TPU, docs/performance.md)
            pack_locals=bool(
                self.config.model.get("dino_pack_locals", False)
            ),
        )

    def _teacher_temp(self, epoch: int) -> float:
        return float(
            teacher_temp_schedule(
                epoch, self.t_start, self.t_end, self.num_epochs, self.temp_kind
            )
        )

    def _teacher_momentum(self, epoch: int) -> float:
        return float(
            cosine_momentum_schedule(epoch, self.m_start, self.m_end, self.num_epochs)
        )

    def _schedule_point(self, epoch: int, idx: int, steps: int) -> float:
        """Fractional epoch index for step-granular schedules: reaches
        ``epoch`` exactly at the epoch's last batch, so the curve coincides
        with the reference's epoch-granular values at every boundary."""
        steps = max(int(steps), 1)
        return (epoch - 1) + (idx + 1) / steps

    def _host_schedule_values(self, at: float):
        """Host-side (math, no jnp) mirror of
        :func:`...models.dino.teacher_temp_schedule` /
        :func:`cosine_momentum_schedule` — the per-step values are computed
        on the host and ride the batch prefetch, so the granular path adds
        no device dispatches or synchronous transfers to the train loop.
        Parity with the jnp versions is asserted in tests/test_trainers.py.
        """
        total = self.num_epochs
        progress = min(at / total, 1.0)
        cos_term = math.cos(math.pi * progress)
        if self.temp_kind == "linear":
            temp = self.t_start + (self.t_end - self.t_start) * progress
        else:
            temp = self.t_end - (self.t_end - self.t_start) * 0.5 * (1.0 + cos_term)
        if at >= total:
            temp = self.t_end
        mom = self.m_end - (self.m_end - self.m_start) * 0.5 * (1.0 + cos_term)
        if at >= total:
            mom = self.m_end
        return float(temp), float(mom)

    def _with_step_schedules(self, loader, epoch: int):
        """Attach per-step schedule scalars to each host batch BEFORE the
        device transfer — they ride the 3-deep ``_device_batches`` prefetch
        like the rest of the batch (no in-loop ``device_put``; ~200 ms
        fixed transfer latency on the axon tunnel would otherwise serialise
        with every step)."""
        import numpy as np

        steps = len(loader)
        for idx, batch in enumerate(loader):
            temp, mom = self._host_schedule_values(
                self._schedule_point(epoch, idx, steps)
            )
            batch = dict(batch)
            batch["t_temp"] = np.float32(temp)
            batch["t_momentum"] = np.float32(mom)
            yield batch

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        outs = []
        if self.step_granular:
            for idx, batch in enumerate(
                self._device_batches(self._with_step_schedules(
                    self.train_loader, epoch), train_epoch=epoch)
            ):
                t_temp = batch.pop("t_temp")
                t_momentum = batch.pop("t_momentum")
                self.state, out = self.train_step(
                    self.state, batch, t_temp, t_momentum
                )
                outs.append(out)
                self.train_logger.train_log_step(epoch, idx)
            return self._epoch_metrics(outs)
        t_temp = jnp.float32(self._teacher_temp(epoch))
        t_momentum = jnp.float32(self._teacher_momentum(epoch))
        for idx, batch in enumerate(
            self._device_batches(self.train_loader, train_epoch=epoch)
        ):
            self.state, out = self.train_step(self.state, batch, t_temp, t_momentum)
            outs.append(out)
            self.train_logger.train_log_step(epoch, idx)
        return self._epoch_metrics(outs)

    def validate(self) -> Dict[str, float]:
        t_temp = jnp.float32(self._teacher_temp(self.current_epoch))
        outs = []
        for idx, batch in enumerate(self._device_batches(self.val_loader)):
            self.state, out = self.eval_step(self.state, batch, t_temp)
            outs.append(out)
            self.train_logger.val_log_step(idx)
        return self._epoch_metrics(outs)

    def _epoch_metrics(self, outs) -> Dict[str, float]:
        host = self._fetch(outs)
        # collapse metrics from the last batch only (`dino_trainer.py:114-118`)
        metrics = self.metric_handler.calculate_metrics(
            dino_stats=host[-1]["dino_stats"]
        )
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
        score = (
            val_metrics["CosineSim"]
            - abs(val_metrics["CenterNorm"] - 1)
            - abs(val_metrics["StudentSTD"] - val_metrics["TeacherSTD"])
        )
        if score > self.best_score:
            self.best_score = float(score)
            logger.info(
                "New best validation score: %.4f. Saving model...", self.best_score
            )
            self._save("best_model", epoch, {"best_val_score": self.best_score})
