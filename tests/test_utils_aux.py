"""Logger, history, optimizer-factory, and checkpoint-policy unit tests."""

import os

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_ssl_tpu.config import Config
from vit_ssl_tpu.train.state import make_optimizer
from vit_ssl_tpu.utils.history import TrainingHistory
from vit_ssl_tpu.utils.logger import Logger


def test_history_records_and_plots(tmp_path):
    hist = TrainingHistory(str(tmp_path))
    for epoch in range(3):
        hist.update(
            {"Loss": 1.0 - 0.1 * epoch, "Accuracy": 0.5 + 0.1 * epoch},
            {"Loss": 1.1 - 0.1 * epoch, "Accuracy": 0.4 + 0.1 * epoch},
        )
    assert hist.history["train_Loss"] == pytest.approx([1.0, 0.9, 0.8])
    assert hist.history["val_Accuracy"] == pytest.approx([0.4, 0.5, 0.6])
    hist.vizualize()
    assert (tmp_path / "Loss.png").exists()
    assert (tmp_path / "Accuracy.png").exists()


def test_history_noop_without_save_path():
    hist = TrainingHistory(None)
    hist.update({"Loss": 1.0}, {"Loss": 2.0})
    hist.vizualize()  # must not raise or write


def test_plain_logger_roundtrip(capsys):
    log = Logger(["Accuracy"], 5, 2, 3, plain=True)
    with log:
        log.train_log_step(1, 0)
        log.log_train_epoch(Accuracy=0.5, Loss=1.0)
        log.log_val_epoch(Accuracy=0.4, Loss=1.2)
    out = capsys.readouterr().out
    assert "train: Accuracy=0.5000, Loss=1.0000" in out
    assert "val:   Accuracy=0.4000, Loss=1.2000" in out


def test_rich_logger_lifecycle():
    log = Logger(["Accuracy"], 5, 2, 3, plain=False)
    with log:
        log.train_log_step(1, 0)
        log.val_log_step(0)
        log.log_train_epoch(Accuracy=0.5, Loss=1.0)
        log.log_val_epoch(Accuracy=0.4, Loss=1.2)
        log.pause()
        log.resume()


def _cfg(name="AdamW", params=None):
    return Config(
        {"training": {"optimizer": {"name": name, "params": params or {"lr": 1e-3}}}}
    )


def test_make_optimizer_registry():
    sched = lambda step: 1e-3  # noqa: E731
    for name in ["AdamW", "Adam", "SGD", "RMSprop"]:
        tx = make_optimizer(_cfg(name), sched)
        params = {"w": jnp.ones((3,))}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones((3,))}, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()


def test_make_optimizer_unknown_raises():
    with pytest.raises(ValueError, match="Unknown optimizer"):
        make_optimizer(_cfg("NotAnOptimizer"), lambda s: 1e-3)


def test_make_optimizer_freeze_mask_zeroes_updates():
    sched = lambda step: 1e-1  # noqa: E731
    params = {"backbone": jnp.ones((3,)), "head": jnp.ones((3,))}
    mask = {"backbone": False, "head": True}
    tx = make_optimizer(_cfg(), sched, trainable_mask=mask)
    state = tx.init(params)
    grads = {"backbone": jnp.ones((3,)), "head": jnp.ones((3,))}
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(np.asarray(updates["backbone"]), 0.0)
    assert np.abs(np.asarray(updates["head"])).max() > 0


def test_make_criterion_registry():
    from vit_ssl_tpu.train.steps import make_criterion

    cfg = Config({"training": {"criterion": {"name": "L1Loss"}}})
    assert make_criterion(cfg) == "l1"
    cfg = Config({"training": {"criterion": {"name": "MSELoss"}}})
    assert make_criterion(cfg) == "mse"
    cfg = Config({"training": {"criterion": {"name": "Nope"}}})
    with pytest.raises(ValueError, match="Unknown criterion"):
        make_criterion(cfg)


def test_memory_stats_tolerant_and_formatted():
    """CPU backend exposes no allocator stats -> None; formatting handles
    both shapes; a fake device with stats round-trips the numbers."""
    from vit_ssl_tpu.utils.memory import (
        device_memory_stats,
        format_memory_stats,
        peak_hbm_gb,
    )

    # real (CPU) devices: either None or a dict of floats - never raises
    stats = device_memory_stats()
    assert stats is None or all(
        isinstance(v, float) for v in stats.values()
    )
    assert isinstance(format_memory_stats(stats), str)
    assert format_memory_stats(None) == "HBM stats unavailable"

    gib = 1024 ** 3

    class FakeDevice:
        def memory_stats(self):
            return {
                "bytes_in_use": 2 * gib,
                "peak_bytes_in_use": 3 * gib,
                "bytes_limit": 16 * gib,
                "irrelevant": 7,
            }

    fake = device_memory_stats(FakeDevice())
    assert fake == {
        "bytes_in_use": float(2 * gib),
        "peak_bytes_in_use": float(3 * gib),
        "bytes_limit": float(16 * gib),
    }
    assert "2.00/16.00" in format_memory_stats(fake)
    assert "peak 3.00" in format_memory_stats(fake)
    assert peak_hbm_gb(FakeDevice()) == pytest.approx(3.0)

    class RaisingDevice:
        def memory_stats(self):
            raise RuntimeError("transport does not support stats")

    assert device_memory_stats(RaisingDevice()) is None
    assert peak_hbm_gb(RaisingDevice()) is None
