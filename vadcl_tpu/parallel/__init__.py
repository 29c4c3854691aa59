from vadcl_tpu.parallel.sharding import (
    cross_host_concat,
    local_batch_to_global,
)
from vadcl_tpu.parallel.tp import model_parallel, shard_dim

__all__ = [
    "cross_host_concat",
    "local_batch_to_global",
    "model_parallel",
    "shard_dim",
]
