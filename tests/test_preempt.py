"""Preemption-safe training (vit_ssl_tpu/utils/preempt.py).

The reference has no failure-recovery story beyond epoch-boundary
checkpoints (SURVEY.md §5). Here, a preemption signal (or the
``training.fault_inject_preempt_step`` chaos trigger) checkpoints the
mid-epoch state and exits 75; resuming from ``preempt_model`` skips the
already-trained batches of the interrupted epoch and continues
**bit-exactly** — the loader order is a pure function of (seed, epoch)
and the step RNG of (seed, state.step), so an interrupted+resumed run's
final weights must equal an uninterrupted run's.
"""

import json
import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from make_synthetic_data import make

import train as train_cli
from vit_ssl_tpu.utils import preempt
from vit_ssl_tpu.utils.checkpoint import load_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return make(str(tmp_path_factory.mktemp("synth")), n=24, size=32, num_classes=3)


@pytest.fixture(autouse=True)
def _clean_flag():
    preempt.clear_preemption()
    yield
    preempt.uninstall_preemption_handler()


def _tiny(run_dir, extra=()):
    return [
        "data.img_size=16",
        "data.num_workers=0",
        "model.embed_dim=32",
        "model.num_heads=4",
        "model.num_blocks=1",
        "model.mlp_dim=64",
        "model.patch_size=8",
        "model.use_flash_attention=false",
        "model.use_fused_mlp=false",
        "training.batch_size=8",
        "training.plain_logging=true",
        "eval.interval=0",
        f"hydra.run.dir={run_dir}",
        *extra,
    ]


# ---------------------------------------------------------------------------
# unit: the signal guard
# ---------------------------------------------------------------------------


def test_signal_sets_flag_and_uninstall_restores():
    previous = signal.getsignal(signal.SIGUSR1)
    preempt.install_preemption_handler()
    assert not preempt.preemption_requested()
    os.kill(os.getpid(), signal.SIGUSR1)
    # the handler runs at the next bytecode boundary; allow a beat
    for _ in range(200):
        if preempt.preemption_requested():
            break
        time.sleep(0.01)
    assert preempt.preemption_requested()
    preempt.uninstall_preemption_handler()
    assert not preempt.preemption_requested()
    assert signal.getsignal(signal.SIGUSR1) is previous


def test_install_is_idempotent():
    preempt.install_preemption_handler()
    preempt.install_preemption_handler()
    preempt.uninstall_preemption_handler()
    # second uninstall is a no-op, and the handler is actually gone
    preempt.uninstall_preemption_handler()
    assert signal.getsignal(signal.SIGTERM) != preempt._handler


# ---------------------------------------------------------------------------
# end-to-end: fault-injected preemption, bit-exact resume
# ---------------------------------------------------------------------------


def _sup_args(data_root, run_dir, extra=()):
    return [
        "--config-name", "supervised",
        f"data.data_dir={data_root}/train_images",
        f"data.data_csv={data_root}/train_labels.json",
        "model.num_classes=3",
        # all-warmup lr schedule: the warmup branch depends only on the
        # global step, so the resumed run (num_epochs counts epochs *to
        # run*, reference `fit` semantics) sees identical lr values
        "training.warmup_epochs=2",
        *_tiny(run_dir, extra),
    ]


def test_fault_injection_preempts_and_resume_is_bitexact(data_root, tmp_path):
    # oracle: 2 uninterrupted epochs (3 train batches per epoch)
    oracle_dir = str(tmp_path / "oracle")
    train_cli.main(_sup_args(data_root, oracle_dir, ["training.num_epochs=2"]))
    oracle_tree, oracle_meta = load_checkpoint(os.path.join(oracle_dir, "last_model"))
    assert oracle_meta["epoch"] == 2

    # preempted run: fault-injected after 4 train batches = epoch 2, batch 1
    pre_dir = str(tmp_path / "preempted")
    with pytest.raises(SystemExit) as exc:
        train_cli.main(
            _sup_args(
                data_root, pre_dir,
                ["training.num_epochs=2", "training.fault_inject_preempt_step=4"],
            )
        )
    assert exc.value.code == preempt.PREEMPT_EXIT_CODE
    ckpt = os.path.join(pre_dir, "preempt_model")
    meta = json.load(open(os.path.join(ckpt, "metadata.json")))
    assert meta["preempt_epoch"] == 2
    assert meta["preempt_batches_done"] == 1
    assert meta["epoch"] == 1  # completed epochs

    # resume: finishes epoch 2 (skipping its first batch) in the original dir
    train_cli.main(
        _sup_args(
            data_root, pre_dir,
            ["training.num_epochs=1",
             f"training.resume_from_checkpoint={ckpt}"],
        )
    )
    resumed_tree, resumed_meta = load_checkpoint(os.path.join(pre_dir, "last_model"))
    assert resumed_meta["epoch"] == 2

    flat_o = jax.tree_util.tree_leaves(oracle_tree["params"])
    flat_r = jax.tree_util.tree_leaves(resumed_tree["params"])
    assert len(flat_o) == len(flat_r)
    for a, b in zip(flat_o, flat_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(oracle_tree["step"]), np.asarray(resumed_tree["step"])
    )
    # optimizer moments continue exactly too
    for a, b in zip(
        jax.tree_util.tree_leaves(oracle_tree["opt_state"]),
        jax.tree_util.tree_leaves(resumed_tree["opt_state"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _dino_args(data_root, run_dir, extra=()):
    return [
        "--config-name", "dino",
        f"data.data_dir={data_root}/unlabeled_images",
        "data.local_img_size=8",
        "model.output_dim=32",
        "training.num_all_views=3",
        "training.num_global_views=2",
        "training.warmup_epochs=2",
        # step-granular schedules: per-batch temp/momentum values are
        # indexed by the batch's true position in the epoch — a resumed
        # epoch must continue at the right index, not restart at 0
        "training.step_granular_schedules=true",
        *_tiny(run_dir, extra),
    ]


def test_dino_step_granular_preempt_resume_bitexact(data_root, tmp_path):
    """DINO with mutable state (teacher EMA, center) and per-step schedule
    scalars: the interrupted+resumed run's end-of-epoch-2 state must equal
    the uninterrupted run's exactly. The resumed run keeps num_epochs=2 so
    the schedule *totals* match (reference `fit` counts epochs-to-run), and
    a second fault injection stops it at the epoch-3 boundary."""
    oracle_dir = str(tmp_path / "oracle")
    train_cli.main(_dino_args(data_root, oracle_dir, ["training.num_epochs=2"]))
    oracle_tree, _ = load_checkpoint(os.path.join(oracle_dir, "last_model"))

    pre_dir = str(tmp_path / "preempted")
    with pytest.raises(SystemExit):
        train_cli.main(
            _dino_args(
                data_root, pre_dir,
                ["training.num_epochs=2", "training.fault_inject_preempt_step=4"],
            )
        )
    ckpt = os.path.join(pre_dir, "preempt_model")
    meta = json.load(open(os.path.join(ckpt, "metadata.json")))
    assert meta["preempt_epoch"] == 2 and meta["preempt_batches_done"] == 1

    # resume the remaining 2 batches of epoch 2; the second injected fault
    # fires at the first boundary of epoch 3, after last_model(epoch 2)
    with pytest.raises(SystemExit):
        train_cli.main(
            _dino_args(
                data_root, pre_dir,
                ["training.num_epochs=2",
                 "training.fault_inject_preempt_step=2",
                 f"training.resume_from_checkpoint={ckpt}"],
            )
        )
    resumed_tree, resumed_meta = load_checkpoint(os.path.join(pre_dir, "last_model"))
    assert resumed_meta["epoch"] == 2

    for key in ("params", "teacher_params", "opt_state"):
        for a, b in zip(
            jax.tree_util.tree_leaves(oracle_tree[key]),
            jax.tree_util.tree_leaves(resumed_tree[key]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(oracle_tree["center"]), np.asarray(resumed_tree["center"])
    )


def _simmim_args(data_root, run_dir, extra=()):
    return [
        "--config-name", "simmim",
        f"data.data_dir={data_root}/unlabeled_images",
        "training.warmup_epochs=2",
        *_tiny(run_dir, extra),
    ]


def test_simmim_preempt_resume_bitexact(data_root, tmp_path):
    """SimMIM's random patch mask is drawn *inside* the compiled step from
    the state-derived RNG (mask stream = f(seed, state.step)); a mid-epoch
    preemption+resume must replay the exact same masks for the remaining
    batches, so the resumed run's final weights equal an uninterrupted
    run's bit-for-bit (the supervised/DINO analogues above already cover
    their RNG streams; VERDICT r3 missing item 3)."""
    oracle_dir = str(tmp_path / "oracle")
    train_cli.main(_simmim_args(data_root, oracle_dir, ["training.num_epochs=2"]))
    oracle_tree, oracle_meta = load_checkpoint(os.path.join(oracle_dir, "last_model"))
    assert oracle_meta["epoch"] == 2

    pre_dir = str(tmp_path / "preempted")
    with pytest.raises(SystemExit) as exc:
        train_cli.main(
            _simmim_args(
                data_root, pre_dir,
                ["training.num_epochs=2", "training.fault_inject_preempt_step=4"],
            )
        )
    assert exc.value.code == preempt.PREEMPT_EXIT_CODE
    ckpt = os.path.join(pre_dir, "preempt_model")
    meta = json.load(open(os.path.join(ckpt, "metadata.json")))
    assert meta["preempt_epoch"] == 2 and meta["preempt_batches_done"] == 1

    train_cli.main(
        _simmim_args(
            data_root, pre_dir,
            ["training.num_epochs=1",
             f"training.resume_from_checkpoint={ckpt}"],
        )
    )
    resumed_tree, resumed_meta = load_checkpoint(os.path.join(pre_dir, "last_model"))
    assert resumed_meta["epoch"] == 2

    for key in ("params", "opt_state"):
        leaves_o = jax.tree_util.tree_leaves(oracle_tree[key])
        leaves_r = jax.tree_util.tree_leaves(resumed_tree[key])
        assert len(leaves_o) == len(leaves_r)
        for a, b in zip(leaves_o, leaves_r):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(oracle_tree["step"]), np.asarray(resumed_tree["step"])
    )


def test_mismatched_skip_epoch_is_dropped():
    """A stale mid-epoch offset (recorded for a different epoch) is dropped
    with a warning instead of silently skipping data; a matching one is
    consumed exactly once."""
    from vit_ssl_tpu.train.trainers.base import BaseTrainer

    class Dummy:
        _mid_epoch_skip = (2, 5)

    d = Dummy()
    assert BaseTrainer._consume_mid_epoch_skip(d, 3) == 0  # mismatch: dropped
    assert d._mid_epoch_skip is None

    d._mid_epoch_skip = (2, 5)
    assert BaseTrainer._consume_mid_epoch_skip(d, 2) == 5  # match: consumed
    assert BaseTrainer._consume_mid_epoch_skip(d, 2) == 0  # one-shot


def test_elastic_device_count_resume(data_root, tmp_path):
    """Elastic world-size recovery: a preemption checkpoint written on a
    1-device mesh resumes on a 4-device mesh (the post-reclaim slice need
    not match the original). Checkpoints are host pytrees and
    ``_place_state`` re-shards onto whatever mesh exists at resume; dp only
    shards the global batch, so the trajectory matches a fixed-4-device
    oracle (allclose: the 1-vs-4-device reduction-order difference in the
    pre-preemption epoch is ~1e-7 and Adam's normalization amplifies it
    over the resumed epoch — observed max rel diff 2.7e-4)."""
    oracle_dir = str(tmp_path / "oracle")
    train_cli.main(
        _sup_args(
            data_root, oracle_dir,
            ["training.num_epochs=2", "parallel.num_devices=4"],
        )
    )
    oracle_tree, _ = load_checkpoint(os.path.join(oracle_dir, "last_model"))

    pre_dir = str(tmp_path / "elastic_world")
    with pytest.raises(SystemExit):
        train_cli.main(
            _sup_args(
                data_root, pre_dir,
                ["training.num_epochs=2", "parallel.num_devices=1",
                 "training.fault_inject_preempt_step=4"],
            )
        )
    ckpt = os.path.join(pre_dir, "preempt_model")
    train_cli.main(
        _sup_args(
            data_root, pre_dir,
            ["training.num_epochs=1", "parallel.num_devices=4",
             f"training.resume_from_checkpoint={ckpt}"],
        )
    )
    resumed_tree, meta = load_checkpoint(os.path.join(pre_dir, "last_model"))
    assert meta["epoch"] == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(oracle_tree["params"]),
        jax.tree_util.tree_leaves(resumed_tree["params"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_auto_resume_scheduler_loop_converges_bitexact(data_root, tmp_path):
    """Elastic restart: with training.auto_resume=true and a pinned run dir,
    a scheduler retry loop reruns the *identical* command after each
    preemption and converges to exactly num_epochs total, bit-equal to an
    uninterrupted run; the consumed preempt checkpoint is removed."""
    oracle_dir = str(tmp_path / "oracle")
    train_cli.main(_sup_args(data_root, oracle_dir, ["training.num_epochs=3"]))
    oracle_tree, _ = load_checkpoint(os.path.join(oracle_dir, "last_model"))

    run_dir = str(tmp_path / "elastic")
    args = _sup_args(
        data_root, run_dir,
        ["training.num_epochs=3", "training.auto_resume=true",
         # one injected fault per attempt: 3 batches/epoch, so attempt 1
         # dies at epoch 2 batch 1, attempt 2 at epoch 3 batch ~2, ...
         "training.fault_inject_preempt_step=4"],
    )
    attempts = 0
    while attempts < 6:  # the "scheduler": retry the same command on 75
        attempts += 1
        try:
            train_cli.main(list(args))
            break
        except SystemExit as e:
            assert e.code == preempt.PREEMPT_EXIT_CODE
            preempt.clear_preemption()
    else:
        pytest.fail("auto_resume loop never completed")
    assert attempts > 1, "fault injection never fired"

    resumed_tree, meta = load_checkpoint(os.path.join(run_dir, "last_model"))
    assert meta["epoch"] == 3  # the ORIGINAL total, not 3-per-attempt
    assert not os.path.isdir(os.path.join(run_dir, "preempt_model"))
    for a, b in zip(
        jax.tree_util.tree_leaves(oracle_tree["params"]),
        jax.tree_util.tree_leaves(resumed_tree["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# end-to-end: a real SIGTERM against the CLI subprocess
# ---------------------------------------------------------------------------


def test_sigterm_saves_preempt_checkpoint_and_exits_75(data_root, tmp_path):
    run_dir = str(tmp_path / "sig")
    args = _sup_args(data_root, run_dir, ["training.num_epochs=50"])
    # the axon plugin ignores the JAX_PLATFORMS env var: force CPU via the
    # config API before any backend use (CLAUDE.md environment quirks)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import json, train; "
        f"train.main(json.loads({json.dumps(json.dumps(args))}))"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code], cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        # wait until epoch 1 is checkpointed => the fit loop (and the
        # signal handler) are live, then deliver the preemption signal
        deadline = time.time() + 300
        last = os.path.join(run_dir, "last_model")
        while time.time() < deadline and not os.path.isdir(last):
            if proc.poll() is not None:
                pytest.fail(f"training exited early: rc={proc.returncode}")
            time.sleep(0.5)
        assert os.path.isdir(last), "epoch 1 never finished"
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    assert rc == preempt.PREEMPT_EXIT_CODE
    ckpt = os.path.join(run_dir, "preempt_model")
    assert os.path.isdir(ckpt)
    meta = json.load(open(os.path.join(ckpt, "metadata.json")))
    assert meta["preempt_epoch"] >= 2

    # and the checkpoint actually resumes through the CLI
    train_cli.main(
        _sup_args(
            data_root, run_dir,
            ["training.num_epochs=1",
             f"training.resume_from_checkpoint={ckpt}"],
        )
    )
    _, resumed_meta = load_checkpoint(os.path.join(run_dir, "last_model"))
    assert resumed_meta["epoch"] == meta["preempt_epoch"]
