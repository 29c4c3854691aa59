from vadcl_tpu.parallel.sharding import (
    cross_host_concat,
    local_batch_to_global,
)

__all__ = ["cross_host_concat", "local_batch_to_global"]
