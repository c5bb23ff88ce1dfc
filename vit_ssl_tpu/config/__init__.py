from .compose import (
    Config,
    apply_overrides,
    compose,
    from_container,
    is_list,
    load_yaml,
    merge,
    resolve,
    save_yaml,
    to_container,
)
from .schemas import (
    ConfigValidationError,
    EVAL_MODES,
    METRIC_NAMES,
    TRAIN_MODES,
    validate_eval_config,
    validate_train_config,
)

__all__ = [
    "Config",
    "apply_overrides",
    "compose",
    "from_container",
    "is_list",
    "load_yaml",
    "merge",
    "resolve",
    "save_yaml",
    "to_container",
    "ConfigValidationError",
    "EVAL_MODES",
    "METRIC_NAMES",
    "TRAIN_MODES",
    "validate_eval_config",
    "validate_train_config",
]
