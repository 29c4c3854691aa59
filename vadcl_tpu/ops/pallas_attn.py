"""Fused Pallas window-attention kernel (TPU).

The XLA path materializes the per-window score tensor (Bn, nH, N, N) in fp32 —
at the flagship geometry (batch 32, stage 0: Bn=2048, nH=6, N=98) that is
~470 MB round-tripped through HBM several times per block, which dominates the
stage time.  This kernel computes qkv -> scores(+rel-pos bias, +shift mask) ->
softmax -> attn@V -> proj for a tile of windows entirely in VMEM; scores never
touch HBM.

Math parity with ``vadcl_tpu.ops.window.window_attention`` (itself parity with
``model/swin_transformer.py:139-171``): fp32 score accumulation and softmax,
input-dtype (bf16) value matmuls.

Inference/eval path only for now (no custom VJP); the XLA path remains the
autodiff path.  Selected by ``WindowAttention3D(fused=True)``; shapes
specialize per call site (N, heads, C static).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(
    x_ref,  # (WINS, N, C) input windows (compute dtype)
    qkv_w_ref,  # (C, 3C)
    qkv_b_ref,  # (1, 3C) fp32 (zeros when no bias)
    proj_w_ref,  # (C, C)
    proj_b_ref,  # (1, C) fp32
    bias_mask_ref,  # (1, nH + WINS, N, N) fp32: rel-pos bias rows then mask rows
    out_ref,  # (WINS, N, C)
    *,
    num_heads: int,
    scale: float,
):
    wins, n, c = x_ref.shape
    hd = c // num_heads
    dtype = x_ref.dtype
    bias = bias_mask_ref[0, 0:num_heads]  # (nH, n, n)

    # qkv per window as 2D dots (a (wins, n, c) 3D dot hits Mosaic's
    # unsupported-shape-cast for non-sublane-aligned n like 49)
    qkvs = []
    for w in range(wins):
        qw = jnp.dot(
            x_ref[w], qkv_w_ref[:], preferred_element_type=jnp.float32
        )
        qkvs.append((qw + qkv_b_ref[0, :]).astype(dtype))  # (n, 3c)

    def _wh_stack(base):
        # (wins*nH, n, hd): window-major, head-minor.  Explicit lax slices —
        # jnp None-indexing lowers via gather, unsupported in Mosaic.
        parts = []
        for w in range(wins):
            for h in range(num_heads):
                parts.append(
                    jax.lax.expand_dims(
                        jax.lax.slice_in_dim(
                            qkvs[w], base + h * hd, base + (h + 1) * hd, axis=1
                        ),
                        (0,),
                    )
                )
        return jnp.concatenate(parts, 0)

    q4 = _wh_stack(0)
    k4 = _wh_stack(c)
    v4 = _wh_stack(2 * c)

    # ONE batched scores dot + ONE softmax + ONE attn@V for the whole cell
    s4 = (
        jax.lax.dot_general(
            q4, k4, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # (wins*nH, n, n)
    parts = []
    for w in range(wins):
        sw = jax.lax.slice_in_dim(s4, w * num_heads, (w + 1) * num_heads, axis=0)
        mw = jax.lax.expand_dims(bias_mask_ref[0, num_heads + w], (0,))
        parts.append(sw + bias + mw)
    s4 = jnp.concatenate(parts, 0)
    p4 = jax.nn.softmax(s4, axis=-1).astype(dtype)
    o4 = jax.lax.dot_general(
        p4, v4, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (wins*nH, n, hd)

    for w in range(wins):
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
        ).astype(dtype)  # (n, c)
        o2 = jnp.dot(o, proj_w_ref[:], preferred_element_type=jnp.float32)
        out_ref[w] = (o2 + proj_b_ref[0, :]).astype(out_ref.dtype)


def _attn_kernel_packed(
    x_ref,  # (WINS, N, C) input windows (compute dtype)
    qkv_w_ref,  # (C, 3C)
    qkv_b_ref,  # (1, 3C) fp32
    proj_w_ref,  # (C, C)
    proj_b_ref,  # (1, C) fp32
    bias_ref,  # (1, N, nH*N) fp32: rel-pos bias, heads packed in lanes
    mask_ref,  # (1, WINS, N, N) fp32: per-window shift mask (zeros if none)
    out_ref,  # (WINS, N, C)
    *,
    num_heads: int,
    scale: float,
):
    """Head-packed attention: heads live in the LANE dimension throughout.

    The per-head dots of the baseline kernel contract over head_dim (16 at
    the flagship config) — ~12% MXU K-efficiency plus hundreds of per-head
    slice/concat relayouts.  Here scores for ALL heads of a window are ONE
    ``(N, C) x (C, nH*N)`` dot against a head-block-diagonal K built by
    masking a row-tiled copy (``Kblock[h*N+m, ch] = K[m, ch]·[ch//hd == h]``),
    and attn@V is one ``(N, nH*N) x (nH*N, C)`` dot against the same masked
    tile of V — K-extents of C and nH*N instead of hd.  ~2.8x padded FLOPs,
    ~6x fewer+fatter MXU ops: measured ~2x faster at stage geometries.

    Blockwise softmax subtracts a PER-HEAD row max (broadcast back across
    each head's lane block): a global row max would be exact in real
    arithmetic but underflows a whole head's block to exp()=0 when its
    scores sit >~88 below the max in fp32, making sums=0 and 1/sums=inf.
    Per-block denominators come from ONE ``exp_s @ indicator`` dot and are
    broadcast back with a second tiny dot.
    """
    wins, n, c = x_ref.shape
    hd = c // num_heads
    dtype = x_ref.dtype
    L = num_heads * n

    # head-ownership mask for the row-tiled K/V: (L, C)
    row_head = jax.lax.broadcasted_iota(jnp.int32, (L, c), 0) // n
    ch_head = jax.lax.broadcasted_iota(jnp.int32, (L, c), 1) // hd
    own = row_head == ch_head
    # (L, nH) block indicator and its transpose for denominator broadcast
    blk = (
        jax.lax.broadcasted_iota(jnp.int32, (L, num_heads), 0) // n
        == jax.lax.broadcasted_iota(jnp.int32, (L, num_heads), 1)
    ).astype(jnp.float32)

    for w in range(wins):
        qkv = (
            jnp.dot(x_ref[w], qkv_w_ref[:], preferred_element_type=jnp.float32)
            + qkv_b_ref[0, :]
        )  # (n, 3c) fp32
        q = (qkv[:, :c] * scale).astype(dtype)
        k = qkv[:, c : 2 * c].astype(dtype)
        v = qkv[:, 2 * c :].astype(dtype)
        ktile = jnp.where(own, jnp.concatenate([k] * num_heads, axis=0), 0)
        s = jax.lax.dot_general(
            q, ktile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n, L)
        s = s + bias_ref[0] + jnp.concatenate(
            [mask_ref[0, w]] * num_heads, axis=1
        )
        # per-head row max: slice each head's lane block, broadcast back —
        # guarantees every block's max exponent is exactly 0 (sums >= 1)
        m = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.max(
                        jax.lax.slice_in_dim(s, h * n, (h + 1) * n, axis=1),
                        axis=1,
                        keepdims=True,
                    ),
                    (n, n),
                )
                for h in range(num_heads)
            ],
            axis=1,
        )  # (n, L)
        e = jnp.exp(s - m)
        sums = jnp.dot(e, blk, preferred_element_type=jnp.float32)  # (n, nH)
        dbc = jax.lax.dot_general(
            1.0 / sums, blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n, L)
        p = (e * dbc).astype(dtype)
        vtile = jnp.where(own, jnp.concatenate([v] * num_heads, axis=0), 0)
        o = jax.lax.dot_general(
            p, vtile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n, c)
        o2 = (
            jnp.dot(
                o.astype(dtype), proj_w_ref[:],
                preferred_element_type=jnp.float32,
            )
            + proj_b_ref[0, :]
        )
        out_ref[w] = o2.astype(out_ref.dtype)


def _pick_wins(bn: int, n_windows: int, num_heads: int = 1, n: int = 0) -> int:
    """Windows per grid cell: a divisor of the per-image window count (so the
    mask block index repeats cleanly) and of the total count, VMEM-budgeted.

    The forward holds ~4 live (wins*nH, n, n) fp32 score-sized tensors (s4,
    its post-bias copy, p4, plus the lane-padded o4); at stage-1 geometry
    (nH=12, N=98) wins=8 tips over Mosaic's 16 MB scoped-vmem stack, so cap
    the estimated footprint well below it."""
    budget = 12 * 1024 * 1024
    for cand in (8, 4, 2, 1):
        if n_windows % cand != 0 or bn % cand != 0:
            continue
        est = cand * num_heads * n * n * 4 * 4
        if est <= budget or cand == 1:
            return cand
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "n_windows", "scale", "interpret"),
)
def fused_window_attention(
    x_windows: jax.Array,  # (Bn, N, C)
    qkv_w: jax.Array,  # (C, 3C)
    qkv_b: Optional[jax.Array],  # (3C,) or None
    proj_w: jax.Array,  # (C, C)
    proj_b: jax.Array,  # (C,)
    bias: jax.Array,  # (nH, N, N) fp32 — pre-gathered rel-pos bias
    mask: Optional[jax.Array],  # (nW, N, N) fp32 or None
    num_heads: int,
    n_windows: int,  # windows per image (nW)
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    bn, n, c = x_windows.shape
    wins = _pick_wins(bn, n_windows, num_heads, n)
    grid = (bn // wins,)
    dtype = x_windows.dtype

    qkv_b32 = (
        qkv_b.astype(jnp.float32)
        if qkv_b is not None
        else jnp.zeros((3 * c,), jnp.float32)
    ).reshape(1, -1)
    if mask is None:
        mask = jnp.zeros((n_windows, n, n), jnp.float32)
    # one fused table: rows [0, nH) = per-head bias, rows [nH, nH+nW) = masks;
    # the block spec slices out this cell's WINS mask rows alongside the bias.
    nH = num_heads
    bias_f = bias.astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)
    nW_blocks = n_windows // wins

    # Build per-block tables: (nW_blocks, nH + wins, N, N) so a single block
    # index selects bias + the right masks contiguously.
    tables = jnp.concatenate(
        [
            jnp.broadcast_to(bias_f[None], (nW_blocks, nH, n, n)),
            mask_f.reshape(nW_blocks, wins, n, n),
        ],
        axis=1,
    )

    kernel = functools.partial(
        _attn_kernel, num_heads=num_heads, scale=scale
    )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (wins, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # proj_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # proj_b
            pl.BlockSpec(
                (1, nH + wins, n, n),
                lambda i, _nb=nW_blocks: (i % _nb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (wins, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bn, n, c), dtype),
        interpret=interpret,
    )(
        x_windows,
        qkv_w.astype(dtype),
        qkv_b32,
        proj_w.astype(dtype),
        proj_b.astype(jnp.float32).reshape(1, -1),
        tables,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "n_windows", "scale", "interpret", "wins_override"
    ),
)
def fused_window_attention_packed(
    x_windows: jax.Array,  # (Bn, N, C)
    qkv_w: jax.Array,  # (C, 3C)
    qkv_b: Optional[jax.Array],  # (3C,) or None
    proj_w: jax.Array,  # (C, C)
    proj_b: jax.Array,  # (C,)
    bias: jax.Array,  # (nH, N, N) fp32 — pre-gathered rel-pos bias
    mask: Optional[jax.Array],  # (nW, N, N) fp32 or None
    num_heads: int,
    n_windows: int,
    scale: float,
    interpret: bool = False,
    wins_override: Optional[int] = None,
) -> jax.Array:
    """Head-packed forward (see ``_attn_kernel_packed``); same contract as
    ``fused_window_attention``."""
    bn, n, c = x_windows.shape
    if wins_override and (n_windows % wins_override or bn % wins_override):
        raise ValueError(
            f"wins_override={wins_override} must divide n_windows="
            f"{n_windows} and the window batch {bn} (the mask block "
            "indexing tiles per-image window groups)"
        )
    wins = wins_override or _pick_wins(bn, n_windows, num_heads, n)
    grid = (bn // wins,)
    dtype = x_windows.dtype
    nH = num_heads
    L = nH * n

    qkv_b32 = (
        qkv_b.astype(jnp.float32)
        if qkv_b is not None
        else jnp.zeros((3 * c,), jnp.float32)
    ).reshape(1, -1)
    if mask is None:
        mask = jnp.zeros((n_windows, n, n), jnp.float32)
    # bias packed once: (N, nH*N); mask stays un-tiled (the kernel tiles it
    # across heads in VMEM) so wins can grow without a wins*L table block
    bias_packed = jnp.transpose(bias.astype(jnp.float32), (1, 0, 2)).reshape(
        1, n, L
    )
    nW_blocks = n_windows // wins
    masks = mask.astype(jnp.float32).reshape(nW_blocks, wins, n, n)

    kernel = functools.partial(
        _attn_kernel_packed, num_heads=num_heads, scale=scale
    )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (wins, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # proj_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # proj_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (whole)
            pl.BlockSpec(
                (1, wins, n, n),
                lambda i, _nb=nW_blocks: (i % _nb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (wins, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bn, n, c), dtype),
        interpret=interpret,
    )(
        x_windows,
        qkv_w.astype(dtype),
        qkv_b32,
        proj_w.astype(dtype),
        proj_b.astype(jnp.float32).reshape(1, -1),
        bias_packed,
        masks,
    )
