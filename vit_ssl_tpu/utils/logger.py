"""Training logger: rich live two-pane TUI + plain-line fallback.

Parity with `/root/reference/utils/logger.py:19-142`: left pane train
progress bar + per-epoch metric table, right pane validation; ``pause`` /
``resume`` protocol so evaluator/checkpoint prints don't corrupt the live
region; per-batch ``train_log_step`` / ``val_log_step``; per-epoch table
rebuild.

``plain=True`` (config ``training.plain_logging``) switches to line-based
logging for scripted/CI runs where a live TUI would garble captures.
"""

from __future__ import annotations

import logging
from typing import List

from rich.console import Console, Group
from rich.layout import Layout
from rich.live import Live
from rich.progress import (
    BarColumn,
    Progress,
    TextColumn,
    TimeElapsedColumn,
    TimeRemainingColumn,
)
from rich.table import Table

logger = logging.getLogger(__name__)


class Logger:
    def __init__(
        self,
        metric_names: List[str],
        train_total_batches: int,
        val_total_batches: int,
        num_epochs: int,
        plain: bool = False,
    ):
        self.metric_names = list(metric_names) + ["Loss"]
        self.train_total_batches = train_total_batches
        self.val_total_batches = max(val_total_batches, 1)
        self.num_epochs = num_epochs
        self.plain = plain
        self._epoch = 0

        if self.plain:
            return

        self.console = Console()
        self._make_tables()
        self.left_progress = self._make_progress()
        self.right_progress = self._make_progress()
        self.layout = Layout()
        self.layout.split_row(Layout(name="left"), Layout(name="right"))
        self._refresh_layout()
        self.live = Live(self.layout, refresh_per_second=10, console=self.console)

    def _make_progress(self) -> Progress:
        return Progress(
            TextColumn("[bold cyan]{task.description}"),
            BarColumn(),
            TextColumn("{task.completed}/{task.total}"),
            TimeElapsedColumn(),
            TimeRemainingColumn(),
            console=self.console,
            transient=True,
        )

    def _make_tables(self):
        self.train_table = self._new_table("Training")
        self.val_table = self._new_table("Validation")

    @staticmethod
    def _new_table(title: str) -> Table:
        table = Table(expand=True, title=title, show_lines=True)
        table.add_column("Type")
        table.add_column("Value")
        return table

    def _refresh_layout(self):
        self.layout["left"].update(Group(self.left_progress, self.train_table))
        self.layout["right"].update(Group(self.right_progress, self.val_table))

    # -- lifecycle ----------------------------------------------------------
    def __enter__(self):
        if not self.plain:
            self.live.start()
            self.train_task = self.left_progress.add_task(
                "Train", total=self.train_total_batches
            )
            self.val_task = self.right_progress.add_task(
                "Val", total=self.val_total_batches
            )
        return self

    def __exit__(self, exc_type, exc, tb):
        if not self.plain:
            self.live.stop()

    def pause(self):
        if not self.plain:
            self.live.stop()

    def resume(self):
        if not self.plain:
            self._refresh_layout()
            self.live.start()

    # -- per-step -----------------------------------------------------------
    def train_log_step(self, epoch: int, batch_idx: int):
        self._epoch = epoch
        if self.plain:
            return
        self.left_progress.update(
            self.train_task,
            description=f"Epoch {epoch} / {self.num_epochs} Train",
            completed=batch_idx + 1,
        )

    def val_log_step(self, batch_idx: int):
        if self.plain:
            return
        self.right_progress.update(
            self.val_task, description="Val", completed=batch_idx + 1
        )

    # -- per-epoch ----------------------------------------------------------
    def log_train_epoch(self, **metrics: float):
        if self.plain:
            parts = ", ".join(
                f"{n}={metrics.get(n, 0):.4f}" for n in self.metric_names
            )
            logger.info("epoch %d train: %s", self._epoch, parts)
            print(f"[epoch {self._epoch}] train: {parts}", flush=True)
            return
        self.train_table = self._new_table("Train")
        for name in self.metric_names:
            self.train_table.add_row(name, f"{metrics.get(name, 0):.4f}")
        self._refresh_layout()

    def log_val_epoch(self, **metrics: float):
        if self.plain:
            parts = ", ".join(
                f"{n}={metrics.get(n, 0):.4f}" for n in self.metric_names
            )
            logger.info("epoch %d val: %s", self._epoch, parts)
            print(f"[epoch {self._epoch}] val:   {parts}", flush=True)
            return
        self.val_table = self._new_table("Validation")
        for name in self.metric_names:
            self.val_table.add_row(name, f"{metrics.get(name, 0):.4f}")
        self._refresh_layout()
