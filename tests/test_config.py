"""Tests for the Hydra-compatible config composition engine.

The composition semantics under test mirror what the reference's Hydra usage
relies on (`/root/reference/configs/dino.yaml:1-14`,
`/root/reference/train.py:103`).
"""

from pathlib import Path

import pytest

from vit_ssl_tpu.config import (
    Config,
    ConfigValidationError,
    compose,
    is_list,
    to_container,
    validate_train_config,
)

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


def test_compose_default_root_is_dino():
    cfg = compose(CONFIG_DIR, "config")
    assert cfg.training.type == "dino"
    assert cfg.model.patch_size == 8  # dino override over base's 16
    assert cfg.model.embed_dim == 384  # from base
    assert cfg.model.output_dim == 16384  # dino override over base's 65536


def test_compose_supervised_root():
    cfg = compose(CONFIG_DIR, "supervised")
    assert cfg.training.type == "supervised"
    assert cfg.model.num_classes == 10
    assert cfg.training.criterion.name == "CrossEntropyLoss"
    assert cfg.data.img_size == 192
    assert cfg.metrics == ["Accuracy", "F1Score", "Recall", "Precision"]


def test_interpolation_resolution():
    cfg = compose(CONFIG_DIR, "dino")
    # ${data.img_size} inside globals transforms resolves to 96
    globals_pipeline = cfg.transforms["globals"]
    rrc = globals_pipeline[0]
    assert rrc["name"] == "RandomResizedCrop"
    assert rrc["params"]["size"] == 96
    locals_pipeline = cfg.transforms["locals"]
    assert locals_pipeline[0]["params"]["size"] == 48
    # ${training.warmup_initial_learning_rate} with scientific notation
    assert cfg.training.optimizer.params.lr == pytest.approx(1e-6)


def test_scientific_notation_floats():
    cfg = compose(CONFIG_DIR, "supervised")
    assert isinstance(cfg.training.warmup_initial_learning_rate, float)
    assert cfg.training.warmup_initial_learning_rate == pytest.approx(1e-6)
    assert cfg.training.lr_scheduler.main.params.eta_min == pytest.approx(1e-6)


def test_dotlist_overrides():
    cfg = compose(
        CONFIG_DIR,
        "supervised",
        overrides=[
            "training.num_epochs=3",
            "training.batch_size=4",
            "data.img_size=32",
            "model.embed_dim=64",
        ],
    )
    assert cfg.training.num_epochs == 3
    assert cfg.data.img_size == 32
    # interpolations resolve against overridden values
    assert cfg.transforms["train"][0]["params"]["size"] == 32


def test_override_creates_new_keys():
    cfg = compose(CONFIG_DIR, "supervised", overrides=["+training.extra_flag=true"])
    assert cfg.training.extra_flag is True


def test_attribute_and_item_access_equivalent():
    cfg = compose(CONFIG_DIR, "dino")
    assert cfg["training"]["teacher_temp"] == cfg.training.teacher_temp
    assert cfg.training.get("teacher_temp_final", None) == pytest.approx(0.07)
    assert cfg.get("eval", {}).get("interval", 0) == 10


def test_now_interpolation_in_hydra_run_dir():
    cfg = compose(CONFIG_DIR, "dino")
    run_dir = cfg.hydra.run.dir
    assert run_dir.startswith("./experiments/dino/")
    assert "${" not in run_dir


def test_is_list_helper():
    cfg = compose(CONFIG_DIR, "dino")
    assert is_list(cfg.eval.mode)
    assert not is_list("eval_knn")


def test_validate_train_config_ok():
    for name in ["supervised", "simmim", "dino"]:
        validate_train_config(compose(CONFIG_DIR, name))


def test_validate_rejects_bad_mode():
    cfg = compose(CONFIG_DIR, "supervised", overrides=["training.type=bogus"])
    with pytest.raises(ConfigValidationError):
        validate_train_config(cfg)


def test_validate_rejects_bad_metric():
    cfg = compose(CONFIG_DIR, "supervised")
    cfg["metrics"] = ["Accuracy", "NotAMetric"]
    with pytest.raises(ConfigValidationError):
        validate_train_config(cfg)


def test_eval_config_composition():
    cfg = compose(CONFIG_DIR, "eval_config")
    assert is_list(cfg.eval.mode)
    assert cfg.eval.num_classes == 10
    assert cfg.eval.transforms["val"][0]["name"] == "Resize"


def test_to_container_roundtrip():
    cfg = compose(CONFIG_DIR, "supervised")
    d = to_container(cfg)
    assert isinstance(d, dict)
    assert d["training"]["type"] == "supervised"
    cfg2 = Config(d)
    assert cfg2 == cfg


def test_tilde_override_removes_key():
    from vit_ssl_tpu.config import apply_overrides

    cfg = compose(CONFIG_DIR, "supervised")
    apply_overrides(cfg, ["~eval.save_confusion_matrix"])
    assert "save_confusion_matrix" not in cfg.eval


def test_vit_b_stretch_config_composes():
    cfg = compose(CONFIG_DIR, "vit_b_imagenet")
    assert cfg.model.embed_dim == 768
    assert cfg.model.num_blocks == 12
    assert cfg.data.dataset_name == "imagefolder"
    assert cfg.parallel.remat is True
    assert cfg.model.use_flash_attention is True
    validate_train_config(cfg)


def test_missing_group_file_raises_filenotfound():
    import tempfile

    import yaml

    d = tempfile.mkdtemp()
    with open(f"{d}/root.yaml", "w") as f:
        yaml.safe_dump({"defaults": [{"grp@pkg": "nope"}]}, f)
    with pytest.raises(FileNotFoundError):
        compose(d, "root")


def test_defaults_order_later_wins():
    import tempfile

    import os
    import yaml

    d = tempfile.mkdtemp()
    os.makedirs(f"{d}/a")
    yaml.safe_dump({"x": 1, "y": 1}, open(f"{d}/a/first.yaml", "w"))
    yaml.safe_dump({"x": 2}, open(f"{d}/a/second.yaml", "w"))
    yaml.safe_dump(
        {"defaults": [{"a@p": "first"}, {"a@p": "second"}]},
        open(f"{d}/root.yaml", "w"),
    )
    cfg = compose(d, "root")
    assert cfg.p.x == 2  # later defaults entry wins
    assert cfg.p.y == 1  # earlier keys survive


def test_self_position_controls_override_priority():
    import tempfile

    import os
    import yaml

    d = tempfile.mkdtemp()
    os.makedirs(f"{d}/a")
    yaml.safe_dump({"x": 1}, open(f"{d}/a/g.yaml", "w"))
    # _self_ before the group: group wins
    yaml.safe_dump(
        {"defaults": ["_self_", {"a@p": "g"}], "p": {"x": 99}},
        open(f"{d}/r1.yaml", "w"),
    )
    # _self_ after the group: own content wins
    yaml.safe_dump(
        {"defaults": [{"a@p": "g"}, "_self_"], "p": {"x": 99}},
        open(f"{d}/r2.yaml", "w"),
    )
    assert compose(d, "r1").p.x == 1
    assert compose(d, "r2").p.x == 99


# --- config-group overrides (round 2: VERDICT r1 item 9) -------------------


def test_group_override_full_key():
    # select the ViT-B option for the base model group
    cfg = compose("configs", "supervised", overrides=["base@model=model_vit_b"])
    assert cfg.model.embed_dim == 768
    assert cfg.model.num_blocks == 12
    # the mode-specific model group still layers on top (defaults order)
    assert cfg.model.num_classes is not None


def test_group_override_composes_with_dotlist():
    cfg = compose(
        "configs", "supervised",
        overrides=["base@model=model_vit_b", "model.num_heads=16"],
    )
    assert cfg.model.embed_dim == 768
    assert cfg.model.num_heads == 16


def test_group_override_unknown_option_lists_choices():
    import pytest

    with pytest.raises(ValueError, match="Available options"):
        compose("configs", "supervised", overrides=["base@model=nonexistent"])


def test_group_override_unmatched_key_raises():
    import pytest

    with pytest.raises(ValueError, match="did not match any"):
        compose("configs", "supervised", overrides=["dino@model=model"])


def test_plus_group_addition():
    cfg = compose(
        "configs", "supervised", overrides=["+base@extra_model: model".replace(": ", "=")]
    )
    assert cfg.extra_model.embed_dim == 384


def test_expand_multirun_choice_sweep():
    from vit_ssl_tpu.config import expand_multirun

    jobs = expand_multirun(["a.b=1,2", "c=x"])
    assert jobs == [["a.b=1", "c=x"], ["a.b=2", "c=x"]]


def test_expand_multirun_cartesian_order():
    """Hydra BasicSweeper order: rightmost sweep axis varies fastest."""
    from vit_ssl_tpu.config import expand_multirun

    jobs = expand_multirun(["a=1,2", "b=x,y"])
    assert jobs == [
        ["a=1", "b=x"], ["a=1", "b=y"], ["a=2", "b=x"], ["a=2", "b=y"],
    ]


def test_expand_multirun_ignores_brackets_and_quotes():
    from vit_ssl_tpu.config import expand_multirun

    # list values and quoted commas are literals, not sweeps (Hydra parity)
    assert expand_multirun(["a=[1,2]"]) == [["a=[1,2]"]]
    assert expand_multirun(["a='x,y'"]) == [["a='x,y'"]]
    assert expand_multirun(["~a.b", "c=1"]) == [["~a.b", "c=1"]]


def test_expand_multirun_no_sweep_is_one_job():
    from vit_ssl_tpu.config import expand_multirun

    assert expand_multirun(["a=1"]) == [["a=1"]]
    assert expand_multirun([]) == [[]]


def test_preflight_eval_data_catches_shadowed_override(tmp_path):
    """Overriding only data.data_dir leaves eval pointed at the preset's
    (nonexistent) STL10 path; the preflight must catch that at startup
    rather than at the first eval epoch."""
    from vit_ssl_tpu.config import preflight_eval_data

    cfg = compose(
        CONFIG_DIR,
        "dino",
        overrides=[
            f"data.data_dir={tmp_path}",
            "eval.interval=8",
        ],
    )
    with pytest.raises(ConfigValidationError, match="eval.* shadows data"):
        preflight_eval_data(cfg)


def test_preflight_eval_data_passes_with_real_paths(tmp_path):
    from vit_ssl_tpu.config import preflight_eval_data

    csv = tmp_path / "train_labels.json"
    csv.write_text("{}")
    cfg = compose(
        CONFIG_DIR,
        "dino",
        overrides=[
            f"data.data_dir={tmp_path}",
            f"eval.data_dir={tmp_path}",
            f"eval.data_csv={csv}",
            "eval.interval=8",
        ],
    )
    preflight_eval_data(cfg)  # must not raise


def test_preflight_eval_data_noop_when_eval_disabled(tmp_path):
    from vit_ssl_tpu.config import preflight_eval_data

    cfg = compose(
        CONFIG_DIR, "dino",
        overrides=[f"data.data_dir={tmp_path}", "eval.interval=0"],
    )
    preflight_eval_data(cfg)  # disabled eval: no path checks

    # supervised in-fit eval reuses precomputed preds - no data load to check
    sup = compose(
        CONFIG_DIR, "supervised",
        overrides=[f"data.data_dir={tmp_path}", "eval.interval=5"],
    )
    preflight_eval_data(sup)


def test_preflight_skips_when_eval_never_fires(tmp_path):
    """num_epochs < interval on a fresh run: in-fit eval never executes,
    so missing eval paths must not block the run. A resumed run continues
    epoch numbering, so the check stays armed there."""
    from vit_ssl_tpu.config import preflight_eval_data

    cfg = compose(
        CONFIG_DIR, "dino",
        overrides=[f"data.data_dir={tmp_path}", "eval.interval=8",
                   "training.num_epochs=5"],
    )
    preflight_eval_data(cfg)  # must not raise

    resumed = compose(
        CONFIG_DIR, "dino",
        overrides=[f"data.data_dir={tmp_path}", "eval.interval=8",
                   "training.num_epochs=5",
                   "training.resume_from_checkpoint=/tmp/x/last_model"],
    )
    with pytest.raises(ConfigValidationError):
        preflight_eval_data(resumed)


def test_preflight_present_but_empty_eval_key_fails(tmp_path):
    """Builder semantics: a PRESENT-but-empty eval.data_dir reaches the
    dataset constructor as-is (no fallback to data.*) - preflight must
    fail it rather than silently falling back."""
    from vit_ssl_tpu.config import preflight_eval_data

    csv = tmp_path / "train_labels.json"
    csv.write_text("{}")
    cfg = compose(
        CONFIG_DIR, "dino",
        overrides=[f"data.data_dir={tmp_path}",
                   "eval.data_dir=", f"eval.data_csv={csv}",
                   "eval.interval=8"],
    )
    with pytest.raises(ConfigValidationError):
        preflight_eval_data(cfg)
