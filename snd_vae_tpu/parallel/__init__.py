from .distributed import initialize_distributed, is_primary
from .hints import constrain, shard_nodes
from .mesh import (
    batch_sharding,
    make_mesh,
    mesh_from_config,
    param_shardings,
    replicated,
    shard_graphbatch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "mesh_from_config",
    "batch_sharding",
    "replicated",
    "shard_graphbatch",
    "shard_params",
    "param_shardings",
    "initialize_distributed",
    "is_primary",
    "constrain",
    "shard_nodes",
]
