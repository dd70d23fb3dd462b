from .sharding import (
    check_shardable,
    kv_spec,
    make_mesh,
    param_specs,
    shard_kv,
    shard_params,
)

__all__ = [
    "make_mesh", "check_shardable", "param_specs", "kv_spec",
    "shard_params", "shard_kv",
]
