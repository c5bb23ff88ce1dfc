from .mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    mesh_from_config,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .fsdp import apply_fsdp, fsdp_enabled, fsdp_spec_for, shard_tree_fsdp
from .ring_attention import (
    SEQ_AXIS,
    create_seq_mesh,
    ring_attention,
    ring_attention_available,
    ring_attention_sharded,
)
from .pipeline import (
    PIPE_AXIS,
    create_pipe_mesh,
    pipeline_apply,
    pipeline_sharding,
    stack_block_params,
    unstack_block_params,
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
    "apply_fsdp",
    "fsdp_enabled",
    "fsdp_spec_for",
    "shard_tree_fsdp",
    "SEQ_AXIS",
    "create_seq_mesh",
    "ring_attention",
    "ring_attention_available",
    "ring_attention_sharded",
    "MODEL_AXIS",
    "create_dp_tp_mesh",
    "shard_params",
    "tp_spec_for",
    "PIPE_AXIS",
    "create_pipe_mesh",
    "pipeline_apply",
    "pipeline_sharding",
    "stack_block_params",
    "unstack_block_params",
]
