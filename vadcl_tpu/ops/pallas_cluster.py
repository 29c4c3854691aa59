"""Fused Pallas cluster-assignment kernel (TPU).

The XLA path of the feature cluster head materializes the (tokens, K) fp32
distance and assignment tensors in HBM (at flagship batch 128 that is
~820 MB each, several passes).  This kernel computes, per token tile held in
VMEM:

  cdist (one MXU matmul + norms, torch.cdist parity) -> first-occurrence
  argmin labels -> NegSoftAssign(alpha) -> soft reconstruction assign@centers
  -> in-kernel reduction of sum((dist * assign)^2)

so only tokens in / (recon, labels) out + one scalar cross HBM.  The cluster
loss is sqrt of the returned sum — exactly ``frobenius_norm(dist * assign)``.

Forward is exact vs ``ops.cluster.feature_cluster_assign`` (all fp32).  A
custom VJP backs it with the plain-JAX math (recompute), so it is safe under
autodiff; the fast path is inference/eval where the clips/sec metric lives.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vadcl_tpu.ops.cluster import cdist, neg_soft_assign


def _cluster_kernel(
    x_ref,  # (T, C) fp32 tokens (post-LayerNorm)
    centers_ref,  # (K, C) fp32
    recon_ref,  # (T, C) fp32 out
    labels_ref,  # (T, 1) int32 out
    loss_ref,  # (1, 1) fp32 accumulator: sum((d * assign)^2)
    *,
    alpha: float,
):
    t, c = x_ref.shape
    k = centers_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        loss_ref[0, 0] = jnp.float32(0.0)

    x = x_ref[:]
    cen = centers_ref[:]
    cross = jax.lax.dot_general(
        x, cen, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, K)
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)
    c_sq = jnp.sum(cen * cen, axis=1, keepdims=True)  # (K, 1)
    d2 = x_sq + c_sq.reshape(1, k) - 2.0 * cross
    d = jnp.sqrt(jnp.maximum(d2, 0.0))  # torch.cdist parity

    d_min = jnp.min(d, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
    labels = jnp.min(jnp.where(d == d_min, col, k), axis=1)  # first argmin
    labels_ref[:] = labels.reshape(t, 1)

    e = jnp.exp(-alpha * (d - d_min))
    assign = e / jnp.sum(e, axis=1, keepdims=True)

    da = d * assign
    loss_ref[0, 0] += jnp.sum(da * da)

    recon_ref[:] = jnp.dot(
        assign, cen, preferred_element_type=jnp.float32
    )


class FusedClusterOut(NamedTuple):
    recon: jax.Array  # (N, C) fp32
    labels: jax.Array  # (N,) int32
    loss_sq_sum: jax.Array  # scalar fp32: sum((dist*assign)^2)


def _forward_pallas(
    tokens: jax.Array, centers: jax.Array, alpha: float, interpret: bool
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    n, c = tokens.shape
    # Mosaic requires the block's second-to-last dim to be a multiple of 8 or
    # the whole array dim.  Prefer the largest 8-aligned divisor of n; when
    # none exists (e.g. n = 196 at the tiny test geometry) fall back to one
    # whole-array block — (n, c) == array dims is always a legal block — and
    # for ill-shaped LARGE token counts compute in plain XLA instead of
    # risking VMEM (the custom VJP already owns that math).
    tile = 512
    while tile >= 8 and n % tile != 0:
        tile //= 2
    if tile < 8:
        if not interpret and n * c * 4 > 4 * 1024 * 1024:
            d = cdist(tokens.astype(jnp.float32), centers.astype(jnp.float32))
            labels = jnp.argmin(d, axis=1).astype(jnp.int32)
            recon, loss_sq = _forward_xla(tokens, centers, alpha)
            return recon, labels, loss_sq
        tile = n
    grid = (n // tile,)
    recon, labels, loss = pl.pallas_call(
        functools.partial(_cluster_kernel, alpha=alpha),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(tokens.astype(jnp.float32), centers.astype(jnp.float32))
    return recon, labels.reshape(-1), loss[0, 0]


def _forward_xla(tokens, centers, alpha):
    """Plain-JAX equivalent (the autodiff path for the custom VJP)."""
    d = cdist(tokens, centers)
    assign = neg_soft_assign(d, alpha)
    recon = jnp.einsum(
        "nk,kc->nc", assign, centers.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    da = d * assign
    return recon, jnp.sum(da * da)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_cluster_assign(
    tokens: jax.Array,  # (N, C) post-LayerNorm tokens
    centers: jax.Array,  # (K, C)
    alpha: float,
    interpret: bool = False,
) -> FusedClusterOut:
    recon, labels, loss = _forward_pallas(tokens, centers, alpha, interpret)
    return FusedClusterOut(recon=recon, labels=labels, loss_sq_sum=loss)


def _fwd(tokens, centers, alpha, interpret):
    out = fused_cluster_assign(tokens, centers, alpha, interpret)
    return out, (tokens, centers)


def _bwd(alpha, interpret, res, cot: FusedClusterOut):
    tokens, centers = res

    def f(t, c):
        recon, loss_sq = _forward_xla(t, c, alpha)
        return recon, loss_sq

    _, vjp = jax.vjp(f, tokens.astype(jnp.float32), centers.astype(jnp.float32))
    d_tokens, d_centers = vjp((cot.recon, cot.loss_sq_sum))
    return d_tokens.astype(tokens.dtype), d_centers.astype(centers.dtype)


fused_cluster_assign.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Spatial-pattern head (model/cluster.py:102-149): per-channel clustering of
# (H*W)-dim spatial maps.  Loss-only (the reference's recon path is dead), so
# the kernel reduces sum((dist*assign)^2) in SMEM and nothing score-sized
# leaves VMEM.
# ---------------------------------------------------------------------------


def _space_kernel(
    x_ref,  # (CT, BD, HW) fp32 per-channel spatial maps (post-LayerNorm)
    cen_ref,  # (CT, K, HW) fp32
    loss_ref,  # (1, 1) fp32 SMEM accumulator
    *,
    alpha: float,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        loss_ref[0, 0] = jnp.float32(0.0)

    x = x_ref[:]
    cen = cen_ref[:]
    cross = jax.lax.dot_general(
        x, cen, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (CT, BD, K)
    x_sq = jnp.sum(x * x, axis=2, keepdims=True)  # (CT, BD, 1)
    c_sq = jax.lax.expand_dims(jnp.sum(cen * cen, axis=2), (1,))  # (CT, 1, K)
    d = jnp.sqrt(jnp.maximum(x_sq + c_sq - 2.0 * cross, 0.0))
    d_min = jnp.min(d, axis=2, keepdims=True)
    e = jnp.exp(-alpha * (d - d_min))
    assign = e / jnp.sum(e, axis=2, keepdims=True)
    da = d * assign
    loss_ref[0, 0] += jnp.sum(da * da)


def _space_forward_pallas(maps, centers, alpha, interpret):
    c, bd, hw = maps.shape
    ct = 4
    while c % ct != 0:
        ct //= 2
    loss = pl.pallas_call(
        functools.partial(_space_kernel, alpha=alpha),
        grid=(c // ct,),
        in_specs=[
            pl.BlockSpec((ct, bd, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, centers.shape[1], hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(maps.astype(jnp.float32), centers.astype(jnp.float32))
    return loss[0, 0]


def _space_forward_xla(maps, centers, alpha):
    d = cdist(maps, centers)  # (C, BD, K)
    assign = neg_soft_assign(d, alpha)
    da = d * assign
    return jnp.sum(da * da)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_space_cluster_loss(
    maps: jax.Array,  # (C, B*D, H*W) post-LayerNorm spatial maps
    centers: jax.Array,  # (C, K, H*W)
    alpha: float,
    interpret: bool = False,
) -> jax.Array:
    """sum((dist * assign)^2) for the spatial head; space_loss = sqrt of it."""
    return _space_forward_pallas(maps, centers, alpha, interpret)


def _space_fwd(maps, centers, alpha, interpret):
    return fused_space_cluster_loss(maps, centers, alpha, interpret), (maps, centers)


def _space_bwd(alpha, interpret, res, cot):
    maps, centers = res
    _, vjp = jax.vjp(
        lambda m, c: _space_forward_xla(m, c, alpha),
        maps.astype(jnp.float32),
        centers.astype(jnp.float32),
    )
    dm, dc = vjp(cot)
    return dm.astype(maps.dtype), dc.astype(centers.dtype)


fused_space_cluster_loss.defvjp(_space_fwd, _space_bwd)
