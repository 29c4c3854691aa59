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


def cross_host_gather_ragged(arr: np.ndarray) -> np.ndarray:
    """Concatenate per-host ndarrays of DIFFERING leading length across all
    processes (deterministic process order).  Single-host passthrough.

    ``process_allgather`` requires equal shapes, so lengths gather first and
    every host pads to the global max before the data gather."""
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    arr = np.asarray(arr)
    lens = np.asarray(
        multihost_utils.process_allgather(
            np.asarray([arr.shape[0]], np.int64)
        )
    ).reshape(-1)
    m = int(lens.max()) if lens.size else 0
    padded = np.zeros((m,) + arr.shape[1:], arr.dtype)
    padded[: arr.shape[0]] = arr
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return np.concatenate(
        [gathered[p, : int(lens[p])] for p in range(gathered.shape[0])], axis=0
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
