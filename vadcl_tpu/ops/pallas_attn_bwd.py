"""Backward Pallas kernel for fused window attention + custom VJP wiring.

Flash-attention-style: the forward saves only its *inputs*; the backward
recomputes qkv/scores/softmax per window tile in VMEM and produces
dx, dqkv_w, dqkv_b, dproj_w, dproj_b and d(bias) without ever materializing
the (Bn, nH, N, N) probability tensor in HBM.

Weight/bias gradients accumulate across grid cells into constant-index output
blocks (Mosaic's sequential grid makes revisited blocks a safe reduction).
d(bias) is returned w.r.t. the pre-gathered (nH, N, N) bias; the gather from
the relative-position table differentiates in XLA outside the kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vadcl_tpu.ops.pallas_attn import _pick_wins, fused_window_attention


def _bwd_kernel(
    x_ref,  # (WINS, N, C)
    do_ref,  # (WINS, N, C) upstream grad
    qkv_w_ref,  # (C, 3C)
    qkv_b_ref,  # (1, 3C) fp32
    proj_w_ref,  # (C, C)
    bias_mask_ref,  # (1, nH + WINS, N, N)
    dx_ref,  # (WINS, N, C) out
    dqkv_w_ref,  # (C, 3C) fp32 accumulator
    dqkv_b_ref,  # (1, 3C) fp32 accumulator
    dproj_w_ref,  # (C, C) fp32 accumulator
    dproj_b_ref,  # (1, C) fp32 accumulator
    dbias_ref,  # (nH, N, N) fp32 accumulator
    *,
    num_heads: int,
    scale: float,
):
    wins, n, c = x_ref.shape
    hd = c // num_heads
    dtype = x_ref.dtype
    bias = bias_mask_ref[0, 0:num_heads]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dqkv_w_ref[:] = jnp.zeros_like(dqkv_w_ref)
        dqkv_b_ref[:] = jnp.zeros_like(dqkv_b_ref)
        dproj_w_ref[:] = jnp.zeros_like(dproj_w_ref)
        dproj_b_ref[:] = jnp.zeros_like(dproj_b_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    # ---- recompute forward (same structure as _attn_kernel) ----
    qkvs = []
    for w in range(wins):
        qw = jnp.dot(x_ref[w], qkv_w_ref[:], preferred_element_type=jnp.float32)
        qkvs.append((qw + qkv_b_ref[0, :]).astype(dtype))

    def _wh_stack(base, mats):
        parts = []
        for w in range(wins):
            for h in range(num_heads):
                parts.append(
                    jax.lax.expand_dims(
                        jax.lax.slice_in_dim(
                            mats[w], base + h * hd, base + (h + 1) * hd, axis=1
                        ),
                        (0,),
                    )
                )
        return jnp.concatenate(parts, 0)  # (wins*nH, n, hd)

    q4 = _wh_stack(0, qkvs)
    k4 = _wh_stack(c, qkvs)
    v4 = _wh_stack(2 * c, qkvs)
    s4 = (
        jax.lax.dot_general(
            q4, k4, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    parts = []
    for w in range(wins):
        sw = jax.lax.slice_in_dim(s4, w * num_heads, (w + 1) * num_heads, axis=0)
        mw = jax.lax.expand_dims(bias_mask_ref[0, num_heads + w], (0,))
        parts.append(sw + bias + mw)
    s4 = jnp.concatenate(parts, 0)
    p4f = jax.nn.softmax(s4, axis=-1)  # fp32
    p4 = p4f.astype(dtype)
    o4 = jax.lax.dot_general(
        p4, v4, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (wins*nH, n, hd) fp32

    # ---- backward ----
    do4_parts = []
    dqkv_list = []
    for w in range(wins):
        # o (n, c) recomputed for dproj_w
        o = jnp.concatenate(
            [
                jax.lax.squeeze(
                    jax.lax.slice_in_dim(
                        o4, w * num_heads + h, w * num_heads + h + 1, axis=0
                    ),
                    (0,),
                )
                for h in range(num_heads)
            ],
            axis=-1,
        ).astype(dtype)
        dout = do_ref[w]  # (n, c)
        dproj_b_ref[0, :] += jnp.sum(dout.astype(jnp.float32), axis=0)
        dproj_w_ref[:] += jax.lax.dot_general(
            o, dout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dproj_w_ref.dtype)
        do = jax.lax.dot_general(
            dout, proj_w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)  # (n, c) = dout @ proj_w^T
        for h in range(num_heads):
            do4_parts.append(
                jax.lax.expand_dims(
                    jax.lax.slice_in_dim(do, h * hd, (h + 1) * hd, axis=1), (0,)
                )
            )
    do4 = jnp.concatenate(do4_parts, 0)  # (wins*nH, n, hd)

    # dv = P^T dO ; dP = dO V^T
    dv4 = jax.lax.dot_general(
        p4, do4, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (wins*nH, hd_from... ) -> contract over n (rows): (wins*nH, n, hd)?
    # note: p4 (B, n, m); contracting p4 axis 1 (n) with do4 axis 1 (n)
    # yields (B, m, hd) = dv4  ✓
    dp4 = jax.lax.dot_general(
        do4, v4, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (B, n, m)
    # softmax backward: ds = p * (dp - sum(dp * p, axis=-1, keepdims))
    ds4 = p4f * (dp4 - jnp.sum(dp4 * p4f, axis=-1, keepdims=True))
    # bias grad: sum over windows of each head's ds
    for h in range(num_heads):
        acc = None
        for w in range(wins):
            blk = jax.lax.squeeze(
                jax.lax.slice_in_dim(
                    ds4, w * num_heads + h, w * num_heads + h + 1, axis=0
                ),
                (0,),
            )
            acc = blk if acc is None else acc + blk
        dbias_ref[h] += acc.astype(dbias_ref.dtype)

    ds4s = (ds4 * scale).astype(dtype)
    dq4 = jax.lax.dot_general(
        ds4s, k4, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (B, n, hd)
    dk4 = jax.lax.dot_general(
        ds4s, q4, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (B, m, hd)

    # assemble dqkv per window and push through the qkv matmul
    for w in range(wins):
        cols = []
        for grad4 in (dq4, dk4, dv4):
            for h in range(num_heads):
                cols.append(
                    jax.lax.squeeze(
                        jax.lax.slice_in_dim(
                            grad4, w * num_heads + h, w * num_heads + h + 1,
                            axis=0,
                        ),
                        (0,),
                    )
                )
        dqkv = jnp.concatenate(cols, axis=-1)  # (n, 3c) fp32
        dqkv_b_ref[0, :] += jnp.sum(dqkv, axis=0).astype(dqkv_b_ref.dtype)
        dqkv_w_ref[:] += jax.lax.dot_general(
            x_ref[w], dqkv.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dqkv_w_ref.dtype)
        dx_ref[w] = jax.lax.dot_general(
            dqkv.astype(dtype), qkv_w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dx_ref.dtype)


def _pick_wins_bwd(bn: int, n_windows: int, num_heads: int, n: int) -> int:
    """Like _pick_wins but VMEM-budgeted: the backward holds ~6 live
    (wins*nH, n, n) fp32 score-sized tensors (s, p, dp, ds, + temps)."""
    budget = 8 * 1024 * 1024
    for cand in (8, 4, 2, 1):
        if n_windows % cand != 0 or bn % cand != 0:
            continue
        est = cand * num_heads * n * n * 4 * 6
        if est <= budget or cand == 1:
            return cand
    return 1


def _bwd_call(
    x_windows, qkv_w, qkv_b32, proj_w, proj_b, tables, do,
    num_heads: int, n_windows: int, scale: float, interpret: bool,
):
    bn, n, c = x_windows.shape
    wins = _pick_wins_bwd(bn, n_windows, num_heads, n)
    grid = (bn // wins,)
    dtype = x_windows.dtype
    nH = num_heads
    nW_blocks = n_windows // wins

    kernel = functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale)
    out_shapes = (
        jax.ShapeDtypeStruct((bn, n, c), dtype),  # dx
        jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),  # dqkv_w
        jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),  # dqkv_b
        jax.ShapeDtypeStruct((c, c), jnp.float32),  # dproj_w
        jax.ShapeDtypeStruct((1, c), jnp.float32),  # dproj_b
        jax.ShapeDtypeStruct((nH, n, n), jnp.float32),  # dbias
    )
    out_specs = (
        pl.BlockSpec((wins, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nH, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((wins, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wins, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # proj_w
            pl.BlockSpec(
                (1, nH + wins, n, n),
                lambda i, _nb=nW_blocks: (i % _nb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x_windows, do, qkv_w.astype(dtype), qkv_b32, proj_w.astype(dtype), tables)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10)
)
def fused_window_attention_trainable(
    x_windows: jax.Array,
    qkv_w: jax.Array,
    qkv_b: Optional[jax.Array],
    proj_w: jax.Array,
    proj_b: jax.Array,
    bias: jax.Array,  # (nH, N, N) pre-gathered
    mask: Optional[jax.Array],
    num_heads: int,
    n_windows: int,
    scale: float,
    interpret: bool = False,
):
    """Differentiable fused window attention (Pallas fwd + Pallas bwd)."""
    return fused_window_attention(
        x_windows, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
        num_heads=num_heads, n_windows=n_windows, scale=scale,
        interpret=interpret,
    )


def _fwd(x_windows, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
         num_heads, n_windows, scale, interpret):
    out = fused_window_attention(
        x_windows, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
        num_heads=num_heads, n_windows=n_windows, scale=scale,
        interpret=interpret,
    )
    return out, (x_windows, qkv_w, qkv_b, proj_w, proj_b, bias, mask)


def _bwd(num_heads, n_windows, scale, interpret, res, do):
    x_windows, qkv_w, qkv_b, proj_w, proj_b, bias, mask = res
    bn, n, c = x_windows.shape
    dtype = x_windows.dtype
    wins = _pick_wins_bwd(bn, n_windows, num_heads, n)
    nW_blocks = n_windows // wins
    qkv_b32 = (
        qkv_b.astype(jnp.float32)
        if qkv_b is not None
        else jnp.zeros((3 * c,), jnp.float32)
    ).reshape(1, -1)
    mask_f = (
        mask.astype(jnp.float32)
        if mask is not None
        else jnp.zeros((n_windows, n, n), jnp.float32)
    )
    tables = jnp.concatenate(
        [
            jnp.broadcast_to(
                bias.astype(jnp.float32)[None], (nW_blocks, num_heads, n, n)
            ),
            mask_f.reshape(nW_blocks, wins, n, n),
        ],
        axis=1,
    )
    dx, dqkv_w, dqkv_b, dproj_w, dproj_b, dbias = _bwd_call(
        x_windows, qkv_w, qkv_b32, proj_w, proj_b, tables,
        do.astype(dtype), num_heads, n_windows, scale, interpret,
    )
    return (
        dx,
        dqkv_w.astype(qkv_w.dtype),
        dqkv_b.reshape(-1).astype(qkv_b.dtype) if qkv_b is not None else None,
        dproj_w.astype(proj_w.dtype),
        dproj_b.reshape(-1).astype(proj_b.dtype),
        dbias.astype(bias.dtype),
        None,  # mask: constant
    )


fused_window_attention_trainable.defvjp(_fwd, _bwd)
