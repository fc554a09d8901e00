from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    param_sharding_rules,
    shard_params,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "param_sharding_rules",
    "shard_params",
]
