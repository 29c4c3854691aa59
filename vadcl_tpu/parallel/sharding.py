"""Multi-host sharding helpers.

The reference's cross-rank machinery is DDP + gloo all-reduce plus result
gathering in its vendored eval hooks (``mmaction/apis/test.py:99-159``).  Here
cross-host needs reduce to two operations: (a) assembling a global sharded
batch from per-host local shards, (b) gathering per-video eval scores to every
host.  Both ride jax.experimental.multihost_utils; on a single host they
degrade to no-ops.
"""

from __future__ import annotations

from typing import Any, List

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_batch_to_global(
    local_batch: np.ndarray, mesh: Mesh, axis_name: str = "data"
) -> jax.Array:
    """Form the global device array from this host's batch shard.

    Single-host: a plain device_put with batch sharding.  Multi-host: each
    host contributes its local slice of the global batch
    (host-sharded input pipeline replaces DistributedSampler)."""
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        local_batch, mesh, P(axis_name)
    )


def cross_host_concat(values: List[Any]) -> List[Any]:
    """Gather per-video eval results across hosts (order not guaranteed);
    single-host passthrough."""
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(values)
    out: List[Any] = []
    for per_host in gathered:
        out.extend(per_host)
    return out
