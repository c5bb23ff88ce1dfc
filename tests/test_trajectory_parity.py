"""Trajectory-level parity vs the torch reference (VERDICT r1 item 4).

Short (30-step) versions of the studies in scripts/trajectory_parity.py:
identical init (imported torch state_dict), identical batches/masks/crops,
AdamW both sides — the loss curves must agree step-for-step at fp32
tolerance. The full 200-step study + KNN north-star proxy is checked in
as PARITY_REPORT.md.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REPO = Path(__file__).resolve().parent.parent
if not (Path("/root/reference")).exists():
    pytest.skip("reference repo not mounted", allow_module_level=True)

spec = importlib.util.spec_from_file_location(
    "trajectory_parity", REPO / "scripts" / "trajectory_parity.py"
)
tp = importlib.util.module_from_spec(spec)
sys.modules["trajectory_parity"] = tp
spec.loader.exec_module(tp)

STEPS = 30


def _assert_trajectory(result, tol):
    dev = tp.rel_dev(result["jax"], result["torch"])
    assert dev.max() < tol, (
        f"trajectory diverged: max rel dev {dev.max():.3e} (tol {tol}); "
        f"final torch={result['torch'][-1]:.6f} jax={result['jax'][-1]:.6f}"
    )


@pytest.mark.slow
def test_supervised_trajectory():
    _assert_trajectory(tp.study_supervised(STEPS), 5e-4)


@pytest.mark.slow
def test_finetune_trajectory():
    _assert_trajectory(tp.study_supervised(STEPS, freeze=True), 5e-4)


@pytest.mark.slow
def test_simmim_trajectory():
    _assert_trajectory(tp.study_simmim(STEPS), 5e-3)


@pytest.mark.slow
def test_dino_trajectory_and_knn():
    result = tp.study_dino(STEPS, knn=True)
    _assert_trajectory(result, 5e-2)
    # north-star proxy (BASELINE.md): KNN top-1 within 0.5 pts
    assert abs(result["knn_torch"] - result["knn_jax"]) <= 0.005 + 1e-9, (
        result["knn_torch"], result["knn_jax"],
    )
