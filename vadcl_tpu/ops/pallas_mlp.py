"""Fused LayerNorm->MLP->residual Pallas kernel (TPU), forward + custom VJP.

The Swin block tail ``x + Mlp(LN(x))`` is HBM-bound on XLA: the 4x-wide
hidden tensor (e.g. 154 MB at stage-0 batch-32) round-trips HBM twice, and
LN adds two more full passes.  This kernel tiles the token axis and keeps
LN statistics, the hidden activation, and the GELU entirely in VMEM: HBM
traffic drops to read-x + write-y (plus the small weights), ~5x less than
the unfused chain.  The backward kernel recomputes the forward per tile
(flash-style: residuals are just the inputs) and accumulates weight grads
across the sequential grid.

Math parity: LN with flax's fast-variance formula (eps 1e-5, fp32 stats),
exact erf GELU (``model/swin_transformer.py:17-35`` uses nn.GELU), dots in
fp32 accumulation with compute-dtype (bf16) inputs at the same cast
boundaries as the nn.Dense path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _erf_f32(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7).

    Mosaic has no TPU lowering for the ``erf`` primitive, so the kernel
    builds it from ``exp`` (supported).  The 1.5e-7 absolute error is far
    below the bf16 rounding already present at this point in the chain.
    """
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _ln_f32(x32, scale, bias):
    """flax nn.LayerNorm numerics: fast variance, eps 1e-5, fp32."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    mu2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(mu2 - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (x32 - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _gelu_f32(h32):
    return h32 * 0.5 * (1.0 + _erf_f32(h32 * _INV_SQRT2))


def _dgelu_f32(h32):
    cdf = 0.5 * (1.0 + _erf_f32(h32 * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * h32 * h32) * _INV_SQRT2PI
    return cdf + h32 * pdf


def _fwd_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    dtype = x_ref.dtype
    x32 = x_ref[:].astype(jnp.float32)
    z, _, _ = _ln_f32(x32, ls_ref[0, :], lb_ref[0, :])
    h = (
        jnp.dot(z.astype(dtype), w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0, :]
    )
    # cast boundary mirrors nn.Dense(dtype) -> gelu -> nn.Dense(dtype)
    g = _gelu_f32(h.astype(dtype).astype(jnp.float32))
    o = (
        jnp.dot(g.astype(dtype), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0, :]
    )
    y_ref[:] = (x32 + o).astype(y_ref.dtype)


def _bwd_kernel(
    x_ref,  # (T, C)
    dy_ref,  # (T, C)
    ls_ref,  # (1, C) fp32
    lb_ref,  # (1, C) fp32
    w1_ref,  # (C, Ch)
    b1_ref,  # (1, Ch) fp32
    w2_ref,  # (Ch, C)
    dx_ref,  # (T, C) out
    dls_ref,  # (1, C) fp32 accum
    dlb_ref,  # (1, C) fp32 accum
    dw1_ref,  # (C, Ch) fp32 accum
    db1_ref,  # (1, Ch) fp32 accum
    dw2_ref,  # (Ch, C) fp32 accum
    db2_ref,  # (1, C) fp32 accum
):
    dtype = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    scale = ls_ref[0, :]
    x32 = x_ref[:].astype(jnp.float32)
    dy32 = dy_ref[:].astype(jnp.float32)

    # ---- recompute forward ----
    z, xhat, rstd = _ln_f32(x32, scale, lb_ref[0, :])
    zc = z.astype(dtype)
    h = (
        jnp.dot(zc, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0, :]
    )
    hb = h.astype(dtype).astype(jnp.float32)
    g = _gelu_f32(hb)

    # ---- backward ----
    db2_ref[:] += jnp.sum(dy32, axis=0, keepdims=True)
    dw2_ref[:] += jax.lax.dot_general(
        g, dy32, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dg = jax.lax.dot_general(
        dy32, w2_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = dg * _dgelu_f32(hb)
    db1_ref[:] += jnp.sum(dh, axis=0, keepdims=True)
    dw1_ref[:] += jax.lax.dot_general(
        z, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dz = jax.lax.dot_general(
        dh, w1_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dls_ref[:] += jnp.sum(dz * xhat, axis=0, keepdims=True)
    dlb_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
    dxhat = dz * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = (dy32 + dx_ln).astype(dx_ref.dtype)


def _pad_tokens(x2d: jax.Array) -> Tuple[jax.Array, int]:
    t = x2d.shape[0]
    pad = (-t) % _TILE
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    return x2d, t


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret=False):
    """y = x + fc2(gelu(fc1(LN(x)))) over the last axis.

    x: (..., C) compute dtype; params fp32 ((C,), (C,), (C, Ch), (Ch,),
    (Ch, C), (C,)).  Any leading shape; tokens are tiled internally.
    """
    return _fwd_call(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret)


def _fwd_call(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret):
    shape = x.shape
    c = shape[-1]
    ch = w1.shape[1]
    dtype = x.dtype
    x2d, t = _pad_tokens(x.reshape(-1, c))
    grid = (x2d.shape[0] // _TILE,)
    row = lambda a: a.astype(jnp.float32).reshape(1, -1)
    y = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ls
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec(
            (_TILE, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, dtype),
        interpret=interpret,
    )(
        x2d,
        row(ln_scale),
        row(ln_bias),
        w1.astype(dtype),
        row(b1),
        w2.astype(dtype),
        row(b2),
    )
    return y[:t].reshape(shape)


def _vjp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret):
    y = _fwd_call(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret)
    return y, (x, ln_scale, ln_bias, w1, b1, w2)


def _vjp_bwd(interpret, res, dy):
    x, ln_scale, ln_bias, w1, b1, w2 = res
    shape = x.shape
    c = shape[-1]
    ch = w1.shape[1]
    dtype = x.dtype
    x2d, t = _pad_tokens(x.reshape(-1, c))
    dy2d, _ = _pad_tokens(dy.reshape(-1, c).astype(dtype))
    grid = (x2d.shape[0] // _TILE,)
    row = lambda a: a.astype(jnp.float32).reshape(1, -1)
    acc = lambda shp: jax.ShapeDtypeStruct(shp, jnp.float32)
    const = lambda i: (0, 0)
    dx, dls, dlb, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TILE, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ch), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x2d.shape, dtype),
            acc((1, c)), acc((1, c)), acc((c, ch)), acc((1, ch)),
            acc((ch, c)), acc((1, c)),
        ),
        interpret=interpret,
    )(
        x2d,
        dy2d,
        row(ln_scale),
        row(ln_bias),
        w1.astype(dtype),
        row(b1),
        w2.astype(dtype),
    )
    return (
        dx[:t].reshape(shape),
        dls.reshape(-1),
        dlb.reshape(-1),
        dw1,
        db1.reshape(-1),
        dw2,
        db2.reshape(-1),
    )


fused_ln_mlp.defvjp(_vjp_fwd, _vjp_bwd)
