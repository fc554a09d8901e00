from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    param_sharding_rules,
    shard_params,
)
from .sp import make_sp_stylize_fn
from .pp import make_pp_stylize_fn

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "param_sharding_rules",
    "shard_params",
    "make_sp_stylize_fn",
    "make_pp_stylize_fn",
]
