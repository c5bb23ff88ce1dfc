"""Matmul precision policy.

The reference trains under torch autocast bf16
(`/root/reference/utils/trainers/dino_trainer.py:86`), i.e. every hot-path
matmul runs on the native bf16 tensor cores. The TPU equivalent is
``jax.lax.Precision.DEFAULT`` — one MXU pass per dot. Round 1 shipped
``Precision.HIGHEST`` everywhere (multi-pass fp32 emulation on the MXU,
chosen for torch-parity test tolerances), which taxed every dense matmul in
the hot path; this module makes the policy explicit and configurable.

``model.matmul_precision`` in the config selects the policy for every Dense
/ conv / einsum in the model stack:

- ``"default"`` (production, the shipped default): native MXU passes.
  bf16 inputs take one pass; fp32 accumulation is still requested where it
  matters via ``preferred_element_type``.
- ``"high"``: 3-pass bf16x6-style emulation (~tf32 quality).
- ``"highest"`` (parity mode): 6-pass fp32 emulation — bitwise closest to
  the round-1 behavior and to fp32 torch; use for oracle-parity runs.
"""

from __future__ import annotations

from typing import Optional, Union

import jax

Precision = jax.lax.Precision

_ALIASES = {
    "default": Precision.DEFAULT,
    "bfloat16": Precision.DEFAULT,
    "fastest": Precision.DEFAULT,
    "high": Precision.HIGH,
    "tensorfloat32": Precision.HIGH,
    "highest": Precision.HIGHEST,
    "float32": Precision.HIGHEST,
}

PrecisionLike = Union[str, Precision, None]


def resolve_precision(name: PrecisionLike) -> Optional[Precision]:
    """Map a config string (or an already-resolved Precision) to
    ``jax.lax.Precision``. ``None`` defers to jax's global default."""
    if name is None or isinstance(name, Precision):
        return name
    key = str(name).lower()
    if key in ("none",):
        return None
    if key not in _ALIASES:
        raise ValueError(
            f"Unknown matmul_precision {name!r}; expected one of "
            f"{sorted(_ALIASES)} or 'none'"
        )
    return _ALIASES[key]
