"""Trainer smoke tests on synthetic data through the real train.py CLI
surface (SURVEY.md §4c), plus checkpoint best/last policy and resume.
"""

import json
import os

import numpy as np
import pytest

from make_synthetic_data import make

import train as train_cli


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return make(str(tmp_path_factory.mktemp("synth")), n=24, size=32, num_classes=3)


def _common(data_root, run_dir, extra=()):
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
        "training.num_epochs=1",
        "training.batch_size=8",
        "training.warmup_epochs=1",
        "training.plain_logging=true",
        "eval.interval=0",
        f"hydra.run.dir={run_dir}",
        *extra,
    ]


def test_multirun_sweep_two_jobs(data_root, tmp_path, monkeypatch):
    """`python train.py -m training.warmup_final_learning_rate=...` runs two
    sequential jobs under multirun/<ts>/<idx> with the per-job override
    applied (Hydra `-m` parity, `/root/reference/train.py:103`)."""
    monkeypatch.chdir(tmp_path)  # multirun/ lands under cwd, like Hydra
    configs = os.path.join(os.path.dirname(train_cli.__file__), "configs")
    run_dirs = train_cli.main(
        [
            "-m",
            "--config-path", configs,
            "--config-name", "supervised",
            f"data.data_dir={data_root}/train_images",
            f"data.data_csv={data_root}/train_labels.json",
            "model.num_classes=3",
            "training.warmup_final_learning_rate=1e-4,1e-3",
            *[o for o in _common(data_root, "unused")
              if not o.startswith("hydra.run.dir")],
        ]
    )
    assert len(run_dirs) == 2
    assert [os.path.basename(d) for d in run_dirs] == ["0", "1"]
    lrs = []
    for d in run_dirs:
        assert os.path.isdir(os.path.join(d, "last_model"))
        meta = json.load(open(os.path.join(d, "last_model", "metadata.json")))
        lrs.append(float(meta["config"]["training"]["warmup_final_learning_rate"]))
    assert lrs == [1e-4, 1e-3]
    sweep_dir = os.path.dirname(run_dirs[0])
    assert os.path.exists(os.path.join(sweep_dir, "multirun.yaml"))


def test_supervised_trainer_end_to_end(data_root, tmp_path):
    run_dir = str(tmp_path / "sup")
    train_cli.main(
        [
            "--config-name", "supervised",
            f"data.data_dir={data_root}/train_images",
            f"data.data_csv={data_root}/train_labels.json",
            "model.num_classes=3",
            *_common(data_root, run_dir),
        ]
    )
    assert os.path.isdir(os.path.join(run_dir, "best_model"))
    assert os.path.isdir(os.path.join(run_dir, "last_model"))
    meta = json.load(open(os.path.join(run_dir, "best_model", "metadata.json")))
    assert meta["mode"] == "supervised"
    assert "best_val_acc" in meta
    assert meta["config"]["training"]["type"] == "supervised"
    assert os.path.exists(os.path.join(run_dir, ".hydra", "config.yaml"))


def test_input_goodput_line_logged(data_root, tmp_path, caplog):
    """Every train epoch logs sustained input-pipeline goodput vs the
    step roofline (docs/performance.md 'Input-pipeline goodput')."""
    import logging
    import re

    run_dir = str(tmp_path / "goodput")
    with caplog.at_level(logging.INFO):
        train_cli.main(
            [
                "--config-name", "supervised",
                f"data.data_dir={data_root}/train_images",
                f"data.data_csv={data_root}/train_labels.json",
                "model.num_classes=3",
                *_common(data_root, run_dir),
            ]
        )
    lines = [r.getMessage() for r in caplog.records
             if "Input pipeline: goodput" in r.getMessage()]
    assert len(lines) == 1  # one train epoch -> one line
    m = re.search(
        r"goodput (\d+) img/s.*input-wait (\d+)% of wall.*roofline ~(\d+)",
        lines[0],
    )
    assert m, lines[0]
    goodput, wait_pct, roofline = map(int, m.groups())
    assert goodput > 0 and 0 <= wait_pct <= 100
    assert roofline >= goodput


def test_simmim_trainer_end_to_end(data_root, tmp_path):
    run_dir = str(tmp_path / "simmim")
    train_cli.main(
        [
            "--config-name", "simmim",
            f"data.data_dir={data_root}/unlabeled_images",
            *_common(data_root, run_dir),
        ]
    )
    meta = json.load(open(os.path.join(run_dir, "best_model", "metadata.json")))
    assert "best_val_score" in meta  # SSIM + 0.01*PSNR policy


def test_dino_trainer_end_to_end(data_root, tmp_path):
    run_dir = str(tmp_path / "dino")
    train_cli.main(
        [
            "--config-name", "dino",
            f"data.data_dir={data_root}/unlabeled_images",
            "data.local_img_size=8",
            "model.output_dim=32",
            "training.num_all_views=3",
            "training.num_global_views=2",
            *_common(data_root, run_dir),
        ]
    )
    meta = json.load(open(os.path.join(run_dir, "best_model", "metadata.json")))
    assert "best_val_score" in meta  # collapse-score policy


def test_resume_continues_epoch_numbering(data_root, tmp_path, caplog):
    run_dir = str(tmp_path / "resume")
    args = [
        "--config-name", "supervised",
        f"data.data_dir={data_root}/train_images",
        f"data.data_csv={data_root}/train_labels.json",
        "model.num_classes=3",
        *_common(data_root, run_dir),
    ]
    train_cli.main(args)
    meta1 = json.load(open(os.path.join(run_dir, "last_model", "metadata.json")))
    assert meta1["epoch"] == 1

    train_cli.main(args + [f"training.resume_from_checkpoint={run_dir}/last_model"])
    meta2 = json.load(open(os.path.join(run_dir, "last_model", "metadata.json")))
    assert meta2["epoch"] == 2


def test_finetune_from_simmim_checkpoint(data_root, tmp_path):
    ssl_dir = str(tmp_path / "ssl")
    train_cli.main(
        [
            "--config-name", "simmim",
            f"data.data_dir={data_root}/unlabeled_images",
            *_common(data_root, ssl_dir),
        ]
    )
    ft_dir = str(tmp_path / "ft")
    train_cli.main(
        [
            "--config-name", "finetune",
            f"data.data_dir={data_root}/train_images",
            f"data.data_csv={data_root}/train_labels.json",
            "model.num_classes=3",
            f"training.pretrained_path={ssl_dir}/best_model",
            *_common(data_root, ft_dir),
        ]
    )
    meta = json.load(open(os.path.join(ft_dir, "best_model", "metadata.json")))
    assert meta["mode"] == "finetune"


def test_supervised_device_augment_end_to_end(data_root, tmp_path):
    run_dir = str(tmp_path / "sup_dev")
    train_cli.main(
        [
            "--config-name", "supervised",
            f"data.data_dir={data_root}/train_images",
            f"data.data_csv={data_root}/train_labels.json",
            "model.num_classes=3",
            "data.device_augment=true",
            *_common(data_root, run_dir),
        ]
    )
    assert os.path.isdir(os.path.join(run_dir, "best_model"))


def test_dino_device_augment_end_to_end(data_root, tmp_path):
    run_dir = str(tmp_path / "dino_dev")
    train_cli.main(
        [
            "--config-name", "dino",
            f"data.data_dir={data_root}/unlabeled_images",
            "data.local_img_size=8",
            "data.device_augment=true",
            "model.output_dim=32",
            "training.num_all_views=3",
            "training.num_global_views=2",
            *_common(data_root, run_dir),
        ]
    )
    assert os.path.isdir(os.path.join(run_dir, "last_model"))


def test_resume_reproduces_continuous_training(data_root, tmp_path):
    """1 epoch + resume + 1 epoch must equal 2 continuous epochs: the lr
    schedule, PRNG streams, and optimizer state are all pure functions of
    the restored step/state, and the loader reshuffles per epoch."""
    import jax
    import numpy as np

    from vit_ssl_tpu.utils.checkpoint import load_checkpoint

    base = [
        "--config-name", "supervised",
        f"data.data_dir={data_root}/train_images",
        f"data.data_csv={data_root}/train_labels.json",
        "model.num_classes=3",
    ]

    cont_dir = str(tmp_path / "cont")
    args = _common(data_root, cont_dir, extra=["training.num_epochs=2"])
    train_cli.main(base + args)
    cont_tree, _ = load_checkpoint(os.path.join(cont_dir, "last_model"))

    two_dir = str(tmp_path / "twostep")
    args1 = _common(data_root, two_dir, extra=["training.num_epochs=1"])
    train_cli.main(base + args1)
    train_cli.main(
        base
        + args1
        + [f"training.resume_from_checkpoint={two_dir}/last_model"]
    )
    resumed_tree, meta = load_checkpoint(os.path.join(two_dir, "last_model"))
    assert meta["epoch"] == 2

    flat_c = jax.tree_util.tree_leaves(cont_tree["params"])
    flat_r = jax.tree_util.tree_leaves(resumed_tree["params"])
    for a, b in zip(flat_c, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_freeze_backbone_keeps_backbone_fixed(data_root, tmp_path):
    """finetune with freeze_backbone: encoder/patch-embed params (except the
    CLS token) must not move; the classification head must."""
    import jax
    import numpy as np

    from vit_ssl_tpu.utils.checkpoint import load_checkpoint

    ssl_dir = str(tmp_path / "ssl")
    train_cli.main(
        [
            "--config-name", "simmim",
            f"data.data_dir={data_root}/unlabeled_images",
            *_common(data_root, ssl_dir),
        ]
    )
    ft_dir = str(tmp_path / "ft_frozen")
    train_cli.main(
        [
            "--config-name", "finetune",
            f"data.data_dir={data_root}/train_images",
            f"data.data_csv={data_root}/train_labels.json",
            "model.num_classes=3",
            f"training.pretrained_path={ssl_dir}/best_model",
            "training.freeze_backbone=true",
            *_common(data_root, ft_dir, extra=["training.num_epochs=2"]),
        ]
    )
    ssl_tree, _ = load_checkpoint(os.path.join(ssl_dir, "best_model"))
    ft_tree, _ = load_checkpoint(os.path.join(ft_dir, "last_model"))
    # encoder weights were transferred and must be bit-identical after
    # 2 epochs of frozen finetuning
    np.testing.assert_array_equal(
        np.asarray(ssl_tree["params"]["encoder_blocks_0"]["feed_forward"]["w1"]),
        np.asarray(ft_tree["params"]["encoder_blocks_0"]["feed_forward"]["w1"]),
    )
    # the head trained
    head = np.asarray(ft_tree["params"]["classification_head"]["linear"]["kernel"])
    assert np.abs(head).sum() > 0


def test_unfreeze_at_epoch_resumes_backbone_updates(data_root, tmp_path):
    """freeze_backbone_epochs=N unfreezes the backbone and rebuilds the
    optimizer at epoch N (`supervised_trainer.py:88-90` parity)."""
    import numpy as np

    from vit_ssl_tpu.utils.checkpoint import load_checkpoint

    ssl_dir = str(tmp_path / "ssl2")
    train_cli.main(
        [
            "--config-name", "simmim",
            f"data.data_dir={data_root}/unlabeled_images",
            *_common(data_root, ssl_dir),
        ]
    )
    ft_dir = str(tmp_path / "ft_unfreeze")
    train_cli.main(
        [
            "--config-name", "finetune",
            f"data.data_dir={data_root}/train_images",
            f"data.data_csv={data_root}/train_labels.json",
            "model.num_classes=3",
            f"training.pretrained_path={ssl_dir}/best_model",
            "training.freeze_backbone=true",
            "+freeze_backbone_epochs=2",
            # lr large enough that one unfrozen epoch visibly moves weights
            "training.warmup_final_learning_rate=1e-2",
            *_common(data_root, ft_dir, extra=["training.num_epochs=2"]),
        ]
    )
    ssl_tree, _ = load_checkpoint(os.path.join(ssl_dir, "best_model"))
    ft_tree, _ = load_checkpoint(os.path.join(ft_dir, "last_model"))
    a = np.asarray(ssl_tree["params"]["encoder_blocks_0"]["feed_forward"]["w1"])
    b = np.asarray(ft_tree["params"]["encoder_blocks_0"]["feed_forward"]["w1"])
    assert not np.array_equal(a, b), "backbone should train after unfreezing"


def test_eval_of_finetune_experiment_loads_trained_checkpoint(data_root, tmp_path):
    """Regression: evaluating a FINISHED finetune experiment must load its
    own best_model — not re-derive the (PARTIAL) pretrained-path surgery
    tree, which is missing e.g. the patch embedding for DINO sources and
    crashed apply with ScopeParamNotFoundError."""
    import jax.numpy as jnp

    from vit_ssl_tpu.config import compose
    from vit_ssl_tpu.evaluators.evaluator_utils import (
        merge_with_experiment_config,
    )
    from vit_ssl_tpu.evaluators.unsupervised_evaluator import load_model_state
    from vit_ssl_tpu.utils.checkpoint import load_checkpoint

    ssl_dir = str(tmp_path / "ssl3")
    train_cli.main(
        [
            "--config-name", "simmim",
            f"data.data_dir={data_root}/unlabeled_images",
            *_common(data_root, ssl_dir),
        ]
    )
    ft_dir = str(tmp_path / "ft_eval")
    train_cli.main(
        [
            "--config-name", "finetune",
            f"data.data_dir={data_root}/train_images",
            f"data.data_csv={data_root}/train_labels.json",
            "model.num_classes=3",
            f"training.pretrained_path={ssl_dir}/best_model",
            *_common(data_root, ft_dir),
        ]
    )

    cfg = compose(
        "configs", "supervised_eval",
        [f"eval.experiment_path={ft_dir}", "data.num_workers=0"],
    )
    cfg = merge_with_experiment_config(cfg)
    bundle, state = load_model_state(cfg)

    # the trained checkpoint's weights, not the surgery re-derivation
    best, _ = load_checkpoint(os.path.join(ft_dir, "best_model"))
    got = np.asarray(state.params["classification_head"]["linear"]["kernel"])
    want = np.asarray(best["params"]["classification_head"]["linear"]["kernel"])
    np.testing.assert_array_equal(got, want)

    # and the params tree must be applyable end to end
    logits = bundle.module.apply(
        {"params": state.params}, jnp.zeros((2, 16, 16, 3))
    )
    assert logits.shape == (2, 3)


def test_dino_step_granular_schedules(data_root, tmp_path):
    """training.step_granular_schedules=true (paper granularity) trains
    through the CLI; the schedule point is per-batch but coincides with the
    reference's epoch-granular value at each epoch boundary."""
    from vit_ssl_tpu.train.trainers.dino import DINOTrainer

    # pure schedule math: within-epoch points interpolate, boundary points
    # equal the integer epoch index the reference would use
    pts = [DINOTrainer._schedule_point(None, 3, i, 4) for i in range(4)]
    assert pts == [2.25, 2.5, 2.75, 3.0]
    assert DINOTrainer._schedule_point(None, 1, 9, 10) == 1.0

    run_dir = str(tmp_path / "dino_sg")
    train_cli.main(
        [
            "--config-name", "dino",
            f"data.data_dir={data_root}/unlabeled_images",
            "data.local_img_size=8",
            "model.output_dim=32",
            "training.num_all_views=3",
            "training.num_global_views=2",
            "training.step_granular_schedules=true",
            *_common(data_root, run_dir),
        ]
    )
    meta = json.load(open(os.path.join(run_dir, "best_model", "metadata.json")))
    assert meta["config"]["training"]["step_granular_schedules"] is True


def test_host_schedule_mirror_matches_jnp():
    """The host-side (math) schedule mirror used by the step-granular
    prefetch path must match the jnp schedule functions everywhere."""
    from types import SimpleNamespace

    import numpy as np

    from vit_ssl_tpu.models.dino import (
        cosine_momentum_schedule,
        teacher_temp_schedule,
    )
    from vit_ssl_tpu.train.trainers.dino import DINOTrainer

    for kind in ("cosine", "linear"):
        ns = SimpleNamespace(
            num_epochs=100, t_start=0.04, t_end=0.07,
            m_start=0.996, m_end=1.0, temp_kind=kind,
        )
        for at in [0.0, 0.01, 0.5, 1.0, 37.25, 99.99, 100.0, 120.0]:
            temp, mom = DINOTrainer._host_schedule_values(ns, at)
            ref_t = float(teacher_temp_schedule(at, 0.04, 0.07, 100, kind))
            ref_m = float(cosine_momentum_schedule(at, 0.996, 1.0, 100))
            np.testing.assert_allclose(temp, ref_t, rtol=0, atol=1e-6)
            np.testing.assert_allclose(mom, ref_m, rtol=0, atol=1e-6)
