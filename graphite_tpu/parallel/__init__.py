from .sharding import (
    make_mesh,
    shard_data,
    sharded_linearize_fn,
    sharded_lm,
)

__all__ = ["make_mesh", "shard_data", "sharded_linearize_fn", "sharded_lm"]
