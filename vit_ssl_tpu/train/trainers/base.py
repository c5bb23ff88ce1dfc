"""Base trainer: shared fit loop, state construction, checkpointing.

Control-flow parity with `/root/reference/utils/trainers/base_trainer.py`:
fit = train_epoch → validate → log → save-best (val Loss, ``<=``) →
save-last; checkpoints embed the config. Differences by design:

- optimizer/schedule/EMA live inside the jitted step (no host-side
  scheduler stepping, no GradScaler — bf16 on TPU needs no loss scaling);
- the train state is an explicit pytree, replicated over the data mesh;
- per-step device→host sync is avoided: scalar outputs are collected as
  device arrays and fetched once per epoch.
"""

from __future__ import annotations

import logging
import math
import os
import time
from abc import ABC, abstractmethod
from typing import Any, Dict, Optional

import jax
import numpy as np

from ...config import to_container
from ...parallel import replicate, set_parallel_context, shard_batch
from ...parallel.fsdp import apply_fsdp, fsdp_enabled
from ...parallel.mesh import EXPERT_AXIS, MODEL_AXIS
from ...parallel.sharding_rules import shard_params, shard_tree_tp
from ...train.schedules import lr_schedule_from_config
from ...train.state import create_train_state, make_optimizer
from ...utils.checkpoint import checkpoint_exists, load_checkpoint, save_checkpoint
from ...utils.history import TrainingHistory
from ...utils.logger import Logger
from ...utils.metrics import MetricHandler
from ...utils.preempt import (
    PreemptionRequested,
    preemption_requested,
    request_preemption,
)

logger = logging.getLogger(__name__)


class BaseTrainer(ABC):
    def __init__(self, bundle, save_path: str, config, train_loader, val_loader, mesh=None):
        from ...parallel.integrate import maybe_pipelined

        self.bundle = bundle
        # parallel.pp > 1 reroutes the encoder stack through the GPipe
        # schedule; otherwise this is bundle.module unchanged
        self.model = maybe_pipelined(bundle.module, mesh, config)
        self.config = config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.mesh = mesh
        self.save_path = save_path
        self.warmup_epochs = int(config["training"]["warmup_epochs"])
        self.num_epochs = int(config["training"]["num_epochs"])
        self.eval_interval = int(config["eval"].get("interval", 0) or 0)

        self.lr_schedule = lr_schedule_from_config(config, max(1, len(train_loader)))
        self.tx = make_optimizer(config, self.lr_schedule, self._trainable_mask())

        self.metric_handler = MetricHandler(config)
        self.train_logger = Logger(
            self.metric_handler.metric_names,
            len(train_loader),
            len(val_loader) if val_loader is not None else 0,
            self.num_epochs + 1,
            plain=bool(config["training"].get("plain_logging", False)),
        )
        self.history = TrainingHistory(save_path)

        self.best_val_loss = math.inf
        self.current_epoch = 0
        self.start_epoch = 0
        self._snapshot = None
        self._snapshot_epoch = -1
        self._save_thread = None
        # preemption-safe training (utils/preempt.py): mid-epoch resume
        # offset, and the deterministic fault-injection trigger
        self._mid_epoch_skip = None
        self._train_batches_seen = 0
        self._fault_inject = int(
            config["training"].get("fault_inject_preempt_step", 0) or 0
        )

        # publish the mesh for trace-time parallel dispatch (sp routing in
        # MultiHeadAttention, pp routing in parallel.integrate) BEFORE the
        # jitted steps are built — compiled executables bake the routing in
        set_parallel_context(mesh)
        self.state = self._init_state()
        self._build_steps()

    # -- hooks ---------------------------------------------------------------
    def _trainable_mask(self) -> Optional[Any]:
        return None

    @abstractmethod
    def _build_steps(self):
        """(Re)compile the jitted step functions against ``self.tx``."""

    @abstractmethod
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        ...

    @abstractmethod
    def validate(self):
        ...

    # -- state ----------------------------------------------------------------
    def _init_state(self):
        seed = int(self.config["training"].get("random_seed", 0))
        rng = jax.random.PRNGKey(seed)
        init_rng, state_rng = jax.random.split(rng)
        trees = self.bundle.init_fn(init_rng)
        trees = self._apply_pretrained(trees)
        state = create_train_state(
            trees["params"],
            self.tx,
            state_rng,
            teacher_params=trees.get("teacher_params"),
            center=trees.get("center"),
        )
        return self._place_state(state)

    def _place_state(self, state):
        """Replicated by default; FSDP/ZeRO sharding of params + Adam
        moments over the data axis with ``parallel.fsdp: true``; with
        ``parallel.tp > 1`` parameters (and their Adam moments, teacher
        EMA included) shard Megatron-style over the ``model`` axis — and
        with ``parallel.ep > 1`` MoE expert weights shard over the
        ``expert`` axis (same rule table, parallel/sharding_rules.py) —
        and XLA's GSPMD partitioner inserts the per-layer collectives."""
        mesh = self.mesh
        tp = int(mesh.shape.get(MODEL_AXIS, 1)) if mesh is not None else 1
        ep = int(mesh.shape.get(EXPERT_AXIS, 1)) if mesh is not None else 1
        if tp > 1 or ep > 1:
            if fsdp_enabled(self.config):
                raise ValueError(
                    "parallel.fsdp cannot be combined with parallel.tp>1 "
                    "or parallel.ep>1 (the param shardings conflict); "
                    "pick one memory-sharding strategy"
                )
            state = replicate(state, mesh)
            state = state.replace(
                params=shard_params(state.params, mesh),
                opt_state=shard_tree_tp(state.opt_state, mesh),
            )
            if state.teacher_params is not None:
                state = state.replace(
                    teacher_params=shard_params(state.teacher_params, mesh)
                )
            return state
        if fsdp_enabled(self.config):
            return apply_fsdp(replicate(state, self.mesh), self.mesh)
        return replicate(state, self.mesh)

    def _apply_pretrained(self, trees):
        return trees

    # -- profiling (SURVEY.md §5: absent in the reference; first-class here) ----
    def _maybe_start_profile(self, epoch: int):
        if not bool(self.config["training"].get("profile", False)):
            return False
        if epoch != self.start_epoch + 2 and not (
            self.num_epochs == 1 and epoch == self.start_epoch + 1
        ):
            return False  # profile the 2nd epoch: past compilation
        trace_dir = os.path.join(self.save_path, "profile")
        logger.info("Capturing jax.profiler trace to %s", trace_dir)
        jax.profiler.start_trace(trace_dir)
        return True

    @staticmethod
    def _stop_profile(started: bool):
        if started:
            jax.profiler.stop_trace()

    # -- fit loop ---------------------------------------------------------------
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
                self._save_if_best(epoch, val_metrics["Loss"])
                self._save_last(epoch)
                self._post_epoch_hook(epoch, train_metrics, val_metrics)
            self._join_pending_save()
        self._vizualize()

    def _post_epoch_hook(self, epoch, train_metrics, val_metrics):
        pass

    def _log_memory_once(self):
        """One INFO line after the first trained epoch, when the compiled
        step + params + optimizer state have all landed in HBM (the
        reference has no memory observability; SURVEY.md §5)."""
        if getattr(self, "_memory_logged", False):
            return
        self._memory_logged = True
        from ...utils.memory import device_memory_stats, format_memory_stats

        stats = device_memory_stats()
        if stats:
            logger.info("Device memory after first epoch: %s",
                        format_memory_stats(stats))

    def _log_metrics(self, train_metrics, val_metrics):
        self._log_memory_once()
        self._log_input_goodput()
        self.train_logger.log_train_epoch(**train_metrics)
        self.train_logger.log_val_epoch(**val_metrics)

    def _log_input_goodput(self):
        """One INFO line per train epoch: sustained epoch goodput
        (decode -> augment -> transfer -> step, images/sec of wall) and the
        fraction of the epoch spent *blocked on the host input pipeline*
        (time inside ``next(loader)`` in :meth:`_device_batches` — decode/
        augment work the ``prefetch_factor`` thread pipeline could not
        hide). ``roofline`` extrapolates the goodput with that stall
        removed, i.e. what the same step would sustain if input were free.
        The reference's DataLoader-worker story (`data/data_builder.py:
        129-149`) has no such observability. See docs/performance.md
        'Input-pipeline goodput'."""
        stats = getattr(self, "_epoch_input_stats", None)
        self._epoch_input_stats = None
        if not stats or stats["wall_s"] <= 0 or not stats["batches"]:
            return
        global_batch = int(self.config["training"]["batch_size"])
        images = stats["batches"] * global_batch
        goodput = images / stats["wall_s"]
        frac = stats["wait_s"] / stats["wall_s"]
        compute_s = max(stats["wall_s"] - stats["wait_s"], 1e-9)
        logger.info(
            "Input pipeline: goodput %.0f img/s over the epoch "
            "(input-wait %.0f%% of wall; step roofline ~%.0f img/s)",
            goodput, 100.0 * frac, images / compute_s,
        )

    # -- checkpointing ------------------------------------------------------------
    def _state_tree(self) -> Dict[str, Any]:
        tree = {
            "step": self.state.step,
            "params": self.state.params,
            "opt_state": self.state.opt_state,
        }
        if self.state.teacher_params is not None:
            tree["teacher_params"] = self.state.teacher_params
        if self.state.center is not None:
            tree["center"] = self.state.center
        return tree

    def _save(self, name: str, epoch: int, extra: Dict[str, Any]):
        """Checkpoint write: one device→host snapshot per epoch (best and
        last reuse it) and the file write happens on a background thread so
        the next epoch's compute overlaps it. The reference blocks on
        ``torch.save`` twice per epoch (`base_trainer.py:97-118`)."""
        os.makedirs(self.save_path, exist_ok=True)
        metadata = {
            "epoch": epoch,
            "config": to_container(self.config),
            "mode": self.bundle.mode,
            **extra,
        }
        if self._snapshot_epoch != epoch:
            self._snapshot = jax.device_get(self._state_tree())
            self._snapshot_epoch = epoch
        self._join_pending_save()
        import threading

        self._save_thread = threading.Thread(
            target=save_checkpoint,
            args=(os.path.join(self.save_path, name), self._snapshot, metadata),
            daemon=True,
        )
        self._save_thread.start()

    def _join_pending_save(self):
        if self._save_thread is not None:
            self._save_thread.join()
            self._save_thread = None

    def _save_if_best(self, epoch: int, val_loss: float):
        if self.best_val_loss >= val_loss:
            self.best_val_loss = float(val_loss)
            self.train_logger.pause()
            logger.info(
                "New best validation loss: %.4f. Saving model...", self.best_val_loss
            )
            self._save("best_model", epoch, {"best_val_loss": self.best_val_loss})
            self.train_logger.resume()

    def _save_last(self, epoch: int):
        self._save("last_model", epoch, {})
        self.train_logger.resume()

    def resume_from(self, path: str):
        """Restore params/opt/teacher/center + epoch (`train.py:23-42`)."""
        if not checkpoint_exists(path):
            logger.warning("Resume path %s does not exist. Starting from scratch.", path)
            return
        template = jax.device_get(self._state_tree())
        tree, metadata = load_checkpoint(path, template)
        self.state = self.state.replace(
            step=tree["step"],
            params=tree["params"],
            opt_state=tree["opt_state"],
            teacher_params=tree.get("teacher_params", self.state.teacher_params),
            center=tree.get("center", self.state.center),
        )
        self.state = self._place_state(self.state)
        self.start_epoch = int(metadata.get("epoch", 0))
        self.best_val_loss = float(metadata.get("best_val_loss", math.inf))
        # best-policy bookkeeping (accuracy / collapse-score keyed trainers)
        if "best_val_acc" in metadata and hasattr(self, "best_val_acc"):
            self.best_val_acc = float(metadata["best_val_acc"])
        if "best_val_score" in metadata and hasattr(self, "best_score"):
            self.best_score = float(metadata["best_val_score"])
        if "preempt_epoch" in metadata:
            p_epoch = int(metadata["preempt_epoch"])
            p_done = int(metadata.get("preempt_batches_done", 0))
            self.start_epoch = p_epoch - 1
            self._mid_epoch_skip = (p_epoch, p_done)
            logger.info(
                "Resuming from a preemption checkpoint: restarting inside "
                "epoch %d after %d already-trained batches.", p_epoch, p_done,
            )
            return
        logger.info("Resuming from epoch %d.", self.start_epoch + 1)

    def _vizualize(self):
        self.history.vizualize(self.num_epochs)

    # -- helpers -------------------------------------------------------------------
    def _put(self, batch):
        return shard_batch(batch, self.mesh)

    def _device_batches(self, loader, depth: int = 3, train_epoch=None):
        """Pipelined host→HBM prefetch: up to ``depth`` batches' transfers
        are in flight while the current step runs (device_put is async), so
        per-transfer latency — ~200 ms on the axon tunnel regardless of
        size — overlaps compute instead of serialising with it.

        ``train_epoch`` (the 1-based epoch, passed by train loops only)
        enables preemption-safe training (utils/preempt.py): the iterator
        honors a mid-epoch resume offset (skipping the already-trained
        batches of an interrupted epoch — index order and per-sample RNG
        are pure functions of ``(seed, epoch, index)``, so the skipped
        prefix is identical to what the preempted process trained) and
        raises :class:`PreemptionRequested` at a batch boundary once a
        preemption signal (or the ``training.fault_inject_preempt_step``
        chaos trigger) arrives. Validation loops don't pass it: a signal
        during validation is handled at the next train epoch's first
        boundary."""
        from collections import deque

        done = 0
        it = iter(loader)
        if train_epoch is not None:
            done = self._consume_mid_epoch_skip(train_epoch)
            for _ in range(done):
                next(it, None)

        def preempt_now() -> bool:
            if train_epoch is None:
                return False
            if preemption_requested():
                return True
            if self._fault_inject and self._train_batches_seen >= self._fault_inject:
                logger.warning(
                    "Fault injection: simulating preemption after %d train "
                    "batches (training.fault_inject_preempt_step)",
                    self._train_batches_seen,
                )
                request_preemption()
                return True
            return False

        _sentinel = object()
        wall0 = time.perf_counter()
        input_wait = 0.0
        pending = deque()
        while True:
            t0 = time.perf_counter()
            batch = next(it, _sentinel)
            input_wait += time.perf_counter() - t0
            if batch is _sentinel:
                break
            if preempt_now():
                raise PreemptionRequested(train_epoch, done)
            pending.append(self._put(batch))
            if len(pending) > depth:
                yield pending.popleft()
                done += 1
                if train_epoch is not None:
                    self._train_batches_seen += 1
        while pending:
            if preempt_now():
                raise PreemptionRequested(train_epoch, done)
            yield pending.popleft()
            done += 1
            if train_epoch is not None:
                self._train_batches_seen += 1
        if train_epoch is not None:
            # consumed by the per-epoch goodput log line (_log_metrics)
            self._epoch_input_stats = {
                "wait_s": input_wait,
                "wall_s": time.perf_counter() - wall0,
                "batches": done,
            }

    def _consume_mid_epoch_skip(self, epoch: int) -> int:
        """Number of already-trained batches to skip when resuming inside
        an interrupted epoch (set by :meth:`resume_from` from a preemption
        checkpoint's metadata). One-shot."""
        if not self._mid_epoch_skip:
            return 0
        skip_epoch, k = self._mid_epoch_skip
        self._mid_epoch_skip = None
        if skip_epoch != epoch:
            logger.warning(
                "Mid-epoch resume offset was recorded for epoch %d but "
                "training reached epoch %d first; training the full epoch",
                skip_epoch, epoch,
            )
            return 0
        if k:
            logger.info(
                "Mid-epoch resume: skipping %d already-trained batches of "
                "epoch %d", k, epoch,
            )
        return k

    def _best_extra(self):
        """Best-checkpoint bookkeeping worth carrying through a preemption
        checkpoint (each trainer keys 'best' differently; SURVEY.md §5)."""
        extra = {}
        if math.isfinite(self.best_val_loss):
            extra["best_val_loss"] = float(self.best_val_loss)
        acc = getattr(self, "best_val_acc", None)
        if acc is not None and math.isfinite(acc):
            extra["best_val_acc"] = float(acc)
        score = getattr(self, "best_score", None)
        if score is not None and math.isfinite(score):
            extra["best_val_score"] = float(score)
        return extra

    def save_preempt(self, exc: PreemptionRequested) -> str:
        """Synchronous mid-epoch checkpoint on preemption. The state tree
        (params, optimizer moments, teacher EMA, center, step counter) is
        step-granular, so saving between batches is exactly as consistent
        as an epoch-boundary save; ``preempt_epoch``/``preempt_batches_done``
        let :meth:`resume_from` continue bit-exactly."""
        self._join_pending_save()
        os.makedirs(self.save_path, exist_ok=True)
        tree = jax.device_get(self._state_tree())
        metadata = {
            "epoch": exc.epoch - 1,  # fully completed epochs
            "preempt_epoch": exc.epoch,
            "preempt_batches_done": exc.batches_done,
            "config": to_container(self.config),
            "mode": self.bundle.mode,
            **self._best_extra(),
        }
        path = os.path.join(self.save_path, "preempt_model")
        save_checkpoint(path, tree, metadata)
        return path

    @staticmethod
    def _fetch(scalars) -> Dict[str, np.ndarray]:
        if jax.process_count() > 1:
            # batch-sharded outputs (per-sample preds/labels) span hosts;
            # gather them so every process computes identical epoch metrics
            from jax.experimental import multihost_utils

            def fetch_one(x):
                if getattr(x, "is_fully_addressable", True):
                    return jax.device_get(x)
                if getattr(x, "is_fully_replicated", False):
                    return np.asarray(x)
                return multihost_utils.process_allgather(x, tiled=True)

            return jax.tree_util.tree_map(fetch_one, scalars)
        return jax.device_get(scalars)
