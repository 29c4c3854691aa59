"""Model-axis (tensor) parallelism via GSPMD sharding constraints.

The reference's only parallelism is pure data-parallel DDP
(``main_predict.py:171``, ``utils/distritributed_model.py:23-100``).  On TPU
the natural extension is a 2-D device mesh ``(data, model)``: the batch
shards over ``data`` exactly as before, and *within* each data shard the
attention heads and the MLP hidden width shard over ``model``.  No manual
collectives: the model code places ``with_sharding_constraint`` annotations
on the head/hidden axes of the XLA attention and MLP paths and XLA's SPMD
partitioner (GSPMD) inserts the all-gathers / reduce-scatters over ICI —
Megatron-style tensor parallelism, derived by the compiler instead of
hand-written (the scaling-book recipe: pick a mesh, annotate, let XLA work).

Mechanics: constraints are *baked at trace time*.  ``model_parallel(mesh,
axis)`` activates a module-level context; ``shard_dim(x, d)`` is a no-op
outside it (or when the axis does not divide the dimension — e.g. a 6-head
stage on a 4-way model axis simply stays replicated on that axis).  The
train step enters the context inside its jitted body so every trace through
the model sees it (vadcl_tpu/train/step.py:make_train_step).

Scope: the model axis drives the **XLA attention path** — the Pallas fused
kernels are single-device programs (GSPMD cannot partition an opaque
``pallas_call``), so ``make_train_step`` rejects ``model_axis`` combined
with ``fused_attention``.  At the flagship's scale (~30M params) tensor
parallelism is about activation footprint and latency at large spatial
inputs, not weight memory; weights stay replicated.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_CTX: Optional[Tuple[Mesh, str]] = None


@contextmanager
def model_parallel(mesh: Optional[Mesh], axis: Optional[str]):
    """Activate model-axis sharding constraints for the enclosed trace.

    ``mesh`` must contain ``axis``; passing ``axis=None`` (or a 1-sized
    axis) makes the context a no-op so call sites need no branching."""
    global _CTX
    prev = _CTX
    if mesh is not None and axis is not None and mesh.shape.get(axis, 1) > 1:
        _CTX = (mesh, axis)
    try:
        yield
    finally:
        _CTX = prev


def active_axis() -> Optional[Tuple[Mesh, str]]:
    """The (mesh, axis) pair currently driving constraints, or None."""
    return _CTX


def shard_dim(x: jax.Array, dim: int) -> jax.Array:
    """Constrain dimension ``dim`` of ``x`` to shard over the active model
    axis.  No-op outside ``model_parallel`` or when the axis size does not
    divide the dimension (that tensor stays replicated on the model axis —
    correctness never depends on the annotation)."""
    if _CTX is None:
        return x
    mesh, axis = _CTX
    size = mesh.shape[axis]
    if dim < 0:
        dim += x.ndim
    if size <= 1 or x.shape[dim] % size:
        return x
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
