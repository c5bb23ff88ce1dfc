from .mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    mesh_from_config,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .sharding_rules import (
    MODEL_AXIS,
    create_dp_tp_mesh,
    shard_params,
    tp_spec_for,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "create_mesh",
    "mesh_from_config",
    "replicate",
    "replicated_sharding",
    "shard_batch",
    "MODEL_AXIS",
    "create_dp_tp_mesh",
    "shard_params",
    "tp_spec_for",
]
