"""Preemption-safe training: signal-triggered mid-epoch checkpointing.

The reference has **no failure-detection or elastic-recovery story**
(SURVEY.md §5: "Failure detection / elastic recovery / fault injection:
absent") — a killed run loses everything since the last epoch-boundary
``last_model.pth``. On TPU fleets preemption is routine (maintenance
events, spot reclaims send SIGTERM with a grace window), so this framework
makes it a first-class subsystem:

- :func:`install_preemption_handler` hooks SIGTERM + SIGUSR1 (the signals
  cluster managers use for a preemption warning). The handler only sets a
  flag — no work happens in signal context.
- ``BaseTrainer`` polls the flag at train-batch boundaries and raises
  :class:`PreemptionRequested` carrying ``(epoch, batches_done)``.
- ``train.py`` catches it, writes a ``preempt_model`` checkpoint holding
  the *mid-epoch* train state (params, optimizer moments, teacher EMA,
  center, step counter), and exits with code 75 (``EX_TEMPFAIL``) so
  schedulers retry.
- ``training.resume_from_checkpoint=<run>/preempt_model`` resumes
  **bit-exactly**: the loader's index order is a pure function of
  ``(seed, epoch)`` (data/loader.py), the per-step dropout/augment RNG is
  ``fold_in(rng, state.step)`` (train/state.py), and the trainer skips the
  ``batches_done`` already-trained batches of the interrupted epoch — so
  the resumed run's final weights equal an uninterrupted run's exactly
  (tests/test_preempt.py). The interrupted epoch's *logged* train metrics
  cover only its remainder (the completed batches' outputs died with the
  old process); checkpoints and weights are unaffected.

Fault injection: ``training.fault_inject_preempt_step=N`` simulates a
preemption after N train batches — deterministic chaos testing of the
whole save/resume path without racing a real signal.

Multi-host note: under ``parallel.multihost`` every process must receive
the signal (cluster managers signal the whole job); each process then
reaches the same batch boundary and saves the same global state through
the regular checkpoint path.
"""

from __future__ import annotations

import logging
import signal
import threading

logger = logging.getLogger(__name__)

_PREEMPT_EVENT = threading.Event()
_INSTALLED: list = []  # [(signum, previous_handler)] for uninstall

PREEMPT_EXIT_CODE = 75  # EX_TEMPFAIL: transient failure, retry the job
PREEMPT_SIGNALS = (signal.SIGTERM, signal.SIGUSR1)


class PreemptionRequested(Exception):
    """Raised at a train-batch boundary after a preemption signal.

    ``epoch`` is the interrupted (1-based) epoch; ``batches_done`` is the
    number of optimizer steps of that epoch already applied to the state.
    """

    def __init__(self, epoch: int, batches_done: int):
        super().__init__(
            f"preemption requested at epoch {epoch} "
            f"after {batches_done} batches"
        )
        self.epoch = int(epoch)
        self.batches_done = int(batches_done)


def _handler(signum, frame):  # pragma: no cover - exercised via subprocess
    logger.warning(
        "Received signal %d: will checkpoint at the next batch boundary "
        "and exit %d", signum, PREEMPT_EXIT_CODE,
    )
    _PREEMPT_EVENT.set()


def install_preemption_handler() -> None:
    """Idempotent; only callable from the main thread (signal API rule)."""
    if _INSTALLED:
        return
    for signum in PREEMPT_SIGNALS:
        try:
            previous = signal.signal(signum, _handler)
        except ValueError:  # not the main thread (e.g. in-process test rig)
            logger.warning("Cannot install signal handlers off the main thread")
            return
        _INSTALLED.append((signum, previous))


def uninstall_preemption_handler() -> None:
    """Restore prior handlers (keeps in-process callers like the test
    suite from leaking handlers across runs) and clear the flag."""
    while _INSTALLED:
        signum, previous = _INSTALLED.pop()
        try:
            signal.signal(signum, previous)
        except (ValueError, TypeError):
            pass
    _PREEMPT_EVENT.clear()


def request_preemption() -> None:
    """Programmatic trigger (fault injection / tests)."""
    _PREEMPT_EVENT.set()


def clear_preemption() -> None:
    _PREEMPT_EVENT.clear()


def preemption_requested() -> bool:
    return _PREEMPT_EVENT.is_set()
