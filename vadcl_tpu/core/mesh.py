"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's distributed bootstrap
(``utils/distritributed_model.py:23-100``: gloo process groups, env/SLURM rank
discovery, DDP wrapping).  Here there is no user-level communication backend:
we build a ``jax.sharding.Mesh`` over all addressable devices, annotate batch
shardings, and let XLA emit the collectives over ICI/DCN.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """Multi-host bootstrap.  Replaces ``dist.init_process_group("gloo")``
    (``utils/distritributed_model.py:59-64``): under a multi-host launcher the
    coordinator address comes from the environment; single-host runs no-op."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(
    num_devices: int = 0,
    axis_name: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data-parallel mesh.  Parity with the reference's only parallelism
    mode (pure DP via DDP, ``main_predict.py:171``); extra axes can be added
    by reshaping the device array without touching model code."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    data: int,
    model: int,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """2-D ``(data, model)`` mesh for combined data + tensor parallelism:
    the batch shards over ``data`` and attention heads / MLP hidden width
    shard over ``model`` (parallel/tp.py).  Device order keeps the model
    axis innermost so its collectives ride the fastest ICI links."""
    if devices is None:
        devices = jax.devices()
    need = data * model
    assert len(devices) >= need, (need, len(devices))
    grid = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(grid, tuple(axis_names))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-leading sharding: replaces DistributedSampler rank slicing."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host-global batch onto the mesh, sharded over the batch dim."""
    sh = data_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
