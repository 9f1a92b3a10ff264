from .mesh import (
    batch_sharding,
    create_mesh,
    param_sharding_rules,
    replicated,
    shard_pytree,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "param_sharding_rules",
    "replicated",
    "shard_pytree",
]
