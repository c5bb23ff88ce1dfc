"""Trace-time parallel context.

The reference has no distributed execution (SURVEY.md §2.6); here the
mesh is a first-class training input, but flax modules are constructed
from *model* config alone — threading the mesh through every module
attribute would leak an execution concern into the model surface (and
make checkpoint/param-tree parity fragile). Instead the trainer publishes
the active mesh here before building + jitting its step functions, and
the few ops that dispatch on parallel axes (``MultiHeadAttention`` for
sequence parallelism, ``parallel.integrate`` for pipeline parallelism)
read it **at trace time**.

Contract: set the context before compiling step functions and leave it
fixed for their lifetime — compiled executables bake the routing in, and
changing the context does NOT retrigger compilation. ``BaseTrainer``
(and ``__graft_entry__``) follow this: ``set_parallel_context(mesh)``
runs before ``_build_steps``.
"""

from __future__ import annotations

from typing import Optional

from jax.sharding import Mesh

from .mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS, PIPE_AXIS, SEQ_AXIS

_MESH: Optional[Mesh] = None


def set_parallel_context(mesh: Optional[Mesh]) -> None:
    global _MESH
    _MESH = mesh


def current_mesh() -> Optional[Mesh]:
    return _MESH


def axis_size(name: str) -> int:
    if _MESH is None:
        return 1
    return int(_MESH.shape.get(name, 1))


def dp_size() -> int:
    return axis_size(DATA_AXIS)


def tp_size() -> int:
    return axis_size(MODEL_AXIS)


def pp_size() -> int:
    return axis_size(PIPE_AXIS)


def sp_size() -> int:
    return axis_size(SEQ_AXIS)


def ep_size() -> int:
    return axis_size(EXPERT_AXIS)
