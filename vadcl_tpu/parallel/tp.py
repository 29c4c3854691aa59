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

Scope: the model axis drives two mechanisms, selected by the attention path:

* **XLA path** (``fused_attention=False``): GSPMD constraints shard the
  attention heads and MLP hidden width (``shard_dim``) — classic Megatron
  partitioning, collectives derived by the compiler.
* **Pallas fold path** (``attn_kernel in ("fold", "fold_block")``): a
  ``pallas_call`` is opaque to GSPMD (it would replicate the compute), so
  the kernels are instead dispatched through ``jax.shard_map`` with the Hp
  *window rows* split over the model axis (``shard_windows_call``).  Window
  attention has no cross-window interaction and LN/residual/MLP are
  token-pointwise, so every device runs the SAME single-device kernel on
  its rows — zero collectives inside, weights replicated, and shard_map's
  transpose psums the weight cotangents on the backward (verified against
  the single-device fold path in tests/test_tp.py).  The fused LN+MLP tail
  shards the same rows (``shard_tokens_call``) so no reshard happens
  between the two kernels of a block.

The remaining fused kernels ("base"/"packed" window layouts) stay
single-device; ``make_train_step`` rejects ``model_axis`` with those.  At
the flagship's scale (~30M params) tensor parallelism is about activation
footprint and latency at large spatial inputs, not weight memory; weights
stay replicated.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
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
    correctness never depends on the annotation).

    Every OTHER dimension is left ``UNCONSTRAINED`` so GSPMD propagates
    whatever sharding those dims already carry (in a dp×tp step the batch
    dim stays sharded over 'data').  A ``None`` there instead *pins the dim
    replicated*, which forced an all-gather of the batch axis on every
    constraint — the "Involuntary full rematerialization" warnings the
    round-3 dryrun tail was full of."""
    if _CTX is None:
        return x
    mesh, axis = _CTX
    size = mesh.shape[axis]
    if dim < 0:
        dim += x.ndim
    if size <= 1 or x.shape[dim] % size:
        return x
    spec = [P.UNCONSTRAINED] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def _batch_spec_axes(mesh: Mesh, axis: str):
    """The mesh axes OTHER than the model axis, for the batch dimension of a
    shard_map in_spec (in a dp×tp mesh the batch stays sharded over 'data')."""
    rest = tuple(a for a in mesh.axis_names if a != axis)
    if not rest:
        return None
    return rest if len(rest) > 1 else rest[0]


def shard_windows_call(fn, x: jax.Array, mask, window) -> jax.Array:
    """Dispatch a folded window-attention kernel with the Hp *window rows*
    split over the active model axis via ``jax.shard_map``.

    ``fn(x_local, mask_local)`` must be shape-preserving and treat each
    (wd, wh, Wp)-row independently — true of all three fold variants
    (ops/pallas_attn_fold.py): window attention never crosses windows, and
    the fused LN, residual add, and MLP tail are token-pointwise.  Each
    device therefore runs the SAME single-device Pallas program on its rows
    with ZERO collectives inside; parameters enter as closure constants
    (replicated), and shard_map's transpose psums their cotangents on the
    backward — verified equal to the single-device fold path in
    tests/test_tp.py.

    ``mask`` is the (nW, N, N) shift mask (window order (d, h, w),
    ops/window.py:window_partition) or None; its h axis is exposed so it
    shards alongside x's rows.  Falls back to the plain call when no model
    axis is active or the row count does not divide.
    """
    maskj = None if mask is None else jnp.asarray(mask)
    ctx = _CTX
    if ctx is None:
        return fn(x, maskj)
    mesh, axis = ctx
    tp = mesh.shape[axis]
    _, dp, hp, wp, _ = x.shape
    wd, wh, ww = window
    nd, nhb, wins = dp // wd, hp // wh, wp // ww
    if tp <= 1 or nhb % tp:
        return fn(x, maskj)
    n = wd * wh * ww
    bspec = _batch_spec_axes(mesh, axis)
    xspec = P(bspec, None, axis)
    if maskj is None:
        mask_op, mspec = None, P()
    else:
        mask_op = maskj.reshape(nd, nhb, wins, n, n)
        mspec = P(None, axis)

    def local(xl, ml):
        if ml is not None:
            ml = ml.reshape(-1, n, n)
        return fn(xl, ml)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(xspec, mspec),
        out_specs=xspec,
        check_vma=False,
    )(x, mask_op)


def shard_tokens_call(fn, x: jax.Array, dim: int = 2) -> jax.Array:
    """Dispatch a token-pointwise Pallas kernel (e.g. the fused LN+MLP tail,
    ops/pallas_mlp.py) with dimension ``dim`` of ``x`` split over the active
    model axis — the same rows ``shard_windows_call`` splits, so a fold-mode
    Swin block runs both its kernels without any reshard in between.
    ``fn`` must be shape-preserving and independent across ``dim``."""
    ctx = _CTX
    if ctx is None:
        return fn(x)
    mesh, axis = ctx
    tp = mesh.shape[axis]
    if tp <= 1 or x.shape[dim] % tp:
        return fn(x)
    spec = [None] * x.ndim
    spec[0] = _batch_spec_axes(mesh, axis)
    spec[dim] = axis
    xspec = P(*spec)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(xspec,), out_specs=xspec, check_vma=False
    )(x)
