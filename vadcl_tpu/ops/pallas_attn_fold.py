"""Folded Pallas window attention: partition/reverse live in the BlockSpecs.

``fused_window_attention`` (ops/pallas_attn.py) consumes pre-partitioned
``(B*nW, N, C)`` windows, so every Swin block pays two full activation
round-trips through HBM for ``window_partition`` / ``window_reverse``
(``model/swin_transformer.py:38-68`` semantics) around the kernel — at the
flagship stage-0 geometry (batch 128: a 77 MB bf16 activation) that is four
extra HBM passes per block.  This kernel instead reads the *un-partitioned*
``(B, Dp, Hp, Wp, C)`` tensor directly: the grid is ``(B, Dp/wd, Hp/wh)`` and
each cell's block is one full row of windows ``(1, wd, wh, Wp, C)``, so the
DMA engine performs the partition as part of the block fetch and the windows
never exist as a separate HBM tensor.  (The W axis cannot be split into the
grid: Mosaic requires the block's second-to-last dim to be a multiple of 8 or
the full array dim, and a window group ``gw*7`` is neither.)  VMEM pressure
is managed *inside* the cell instead: the kernel walks the row in groups of
``gw`` windows (VMEM-budgeted — a whole stage-0 row unrolled at once holds
~32 MB of fp32 score-size intermediates against Mosaic's 16 MB scoped-vmem
stack), and each group's score/prob/stack tiles die at the end of its
iteration.

Two further wins over the partitioned kernel fall out of the row layout:
the qkv projection runs as ONE ``(wd*wh*Wp, C)`` row-major dot per cell (the
per-token projections are layout-independent) instead of per-window
``(N, C)`` dots, and the per-group proj dot covers ``gw`` windows — fatter
MXU ops, fewer issue slots.

Math parity with ``vadcl_tpu.ops.window.window_attention`` (itself parity
with ``model/swin_transformer.py:139-171``): fp32 score accumulation and
softmax, input-dtype value matmuls.  The shift ``jnp.roll`` (when any) stays
in XLA — block fetches cannot express a modular shift.

``folded_window_attention_trainable`` wraps the forward in a custom VJP.
The backward is folded too (``_fold_bwd_kernel``): the same ``(B, nd, nhb)``
row grid reads the un-partitioned ``x`` and ``do`` blocks directly,
recomputes LN/qkv/softmax in VMEM (flash-style), applies the LN vjp and
residual per stored slice, and accumulates weight grads across grid cells —
so the backward pays zero partition/reverse/LN-replay HBM round-trips.
Geometries whose single-window VMEM estimate exceeds the budget fall back to
the original XLA-partition + flash backward (ops/pallas_attn_bwd.py).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Tri = Tuple[int, int, int]

# Measured on v5e: a stage-0 row fully unrolled (8 windows, nH=6, N=98)
# allocates 31.7 MB of scoped vmem — ~13 live (wins*nH, N⌈8⌉, N⌈128⌉) fp32
# score-size tiles (scores, post-bias copy, probabilities, lane-padded q/k/v
# stacks and output).  Both knobs are env-tunable for on-chip A/B:
# VADCL_ATTN_VMEM_BUDGET_MB sizes the window-group picker,
# VADCL_ATTN_VMEM_LIMIT_MB raises Mosaic's per-kernel VMEM ceiling to match
# (v5e has 128 MB physical VMEM; the 16 MB scoped default is conservative).
# Defaults 24/32 are the round-5 on-chip sweep winner over {12/default,
# 24/32, 48/64}: bigger window groups (gw 2->4 at stage-0 fwd, 2->4/1->2 at
# the bwd) amortize group-loop overhead — inference 690->698 clips/s, Swin
# stage fwd+bwd sum 105.2->101.8 ms at matched chip calibration; 48/64
# (whole-row groups) gives most of it back (692.7).  docs/PERFORMANCE.md.
_VMEM_BUDGET = (
    int(os.environ.get("VADCL_ATTN_VMEM_BUDGET_MB", "24")) * 1024 * 1024
)
_VMEM_LIMIT_BYTES = (
    int(os.environ.get("VADCL_ATTN_VMEM_LIMIT_MB", "32")) * 1024 * 1024
    or None
)
_LIVE_TILES = 13


def _compiler_params():
    """Per-kernel Mosaic params; only set when the env raises the ceiling."""
    if _VMEM_LIMIT_BYTES is None:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        )
    }


def _pad_to(v: int, m: int) -> int:
    return -(-v // m) * m


# The in-kernel MLP tail walks the row in token chunks of this many rows, so
# its hidden-width temporaries stay small regardless of row length.
_TAIL_CHUNK = 128


def _pick_gw(wins: int, num_heads: int, n: int, extra: int = 0) -> int:
    """Windows per in-kernel group: a divisor of the per-row window count,
    VMEM-budgeted (see _LIVE_TILES calibration above).  ``extra`` reserves
    scoped-vmem for non-score-size residents (e.g. the MLP tail's row/chunk
    tiles)."""
    budget = _VMEM_BUDGET - extra
    for cand in (8, 4, 2, 1):
        if wins % cand:
            continue
        est = _LIVE_TILES * cand * num_heads * _pad_to(n, 8) * _pad_to(n, 128) * 4
        if est <= budget or cand == 1:
            return cand
    return 1


def _tail_extra_bytes(r: int, c: int, ch: int) -> int:
    """Scoped-vmem reserved by the MLP tail: the fp32 row accumulation plus
    ~4 chunk-width hidden temporaries."""
    return r * c * 4 * 2 + _TAIL_CHUNK * max(ch, c) * 4 * 4


def _mlp_tail_rows(row1_f32, dtype, ln2_s, ln2_b, w1_ref, b1_ref, w2_ref,
                   b2_ref):
    """y = y1 + fc2(gelu(fc1(LN2(y1)))) over a (r, c) fp32 row, walked in
    _TAIL_CHUNK token chunks; same cast boundaries as ops/pallas_mlp.py
    (_fwd_kernel) so the fused and two-kernel paths are numerically
    interchangeable."""
    from vadcl_tpu.ops.pallas_mlp import _gelu_f32, _ln_f32

    r = row1_f32.shape[0]
    chunks = []
    step = _TAIL_CHUNK if r > _TAIL_CHUNK else r
    nfull = r // step
    sizes = [step] * nfull + ([r - nfull * step] if r % step else [])
    t0 = 0
    for sz in sizes:
        x32 = jax.lax.slice_in_dim(row1_f32, t0, t0 + sz, axis=0)
        z, _, _ = _ln_f32(x32, ln2_s, ln2_b)
        h = (
            jnp.dot(z.astype(dtype), w1_ref[:],
                    preferred_element_type=jnp.float32)
            + b1_ref[0, :]
        )
        g = _gelu_f32(h.astype(dtype).astype(jnp.float32))
        o = (
            jnp.dot(g.astype(dtype), w2_ref[:],
                    preferred_element_type=jnp.float32)
            + b2_ref[0, :]
        )
        chunks.append(x32 + o)
        t0 += sz
    return jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]


def folded_attention_applicable(
    grid_shape: Tri, window: Tri, num_heads: int
) -> bool:
    """True when (Dp, Hp, Wp) can run the folded kernel: window-divisible
    (guaranteed post-pad) and a single window's group fits the VMEM budget."""
    d, h, w = grid_shape
    wd, wh, ww = window
    if d % wd or h % wh or w % ww:
        return False
    n = wd * wh * ww
    est = _LIVE_TILES * num_heads * _pad_to(n, 8) * _pad_to(n, 128) * 4
    return est <= _VMEM_BUDGET


def _fold_kernel(
    x_ref,  # (1, wd, wh, Wp, C) one row of windows (compute dtype)
    qkv_w_ref,  # (C, 3C)
    qkv_b_ref,  # (1, 3C) fp32 (zeros when no bias)
    proj_w_ref,  # (C, C)
    proj_b_ref,  # (1, C) fp32
    ln_s_ref,  # (1, C) fp32 LN scale (unused when not fuse_ln)
    ln_b_ref,  # (1, C) fp32 LN bias
    bias_ref,  # (nH, N, N) fp32 rel-pos bias (same block every cell)
    mask_ref,  # (1, WINS, N, N) fp32 shift masks for this row's windows
    out_ref,  # (1, wd, wh, Wp, C)
    *,
    num_heads: int,
    scale: float,
    window: Tri,
    fuse_ln: bool,
    residual: bool,
    tail=None,  # optional (ln2_s, ln2_b, w1, b1, w2, b2) refs: MLP tail
    has_mask: bool = True,
):
    wd, wh, ww = window
    _, _, _, wp, c = x_ref.shape
    wins = wp // ww
    n = wd * wh * ww
    hd = c // num_heads
    dtype = x_ref.dtype
    npairs = wd * wh
    extra = (
        _tail_extra_bytes(npairs * wp, c, tail[2].shape[1]) if tail else 0
    )
    gw = _pick_gw(wins, num_heads, n, extra)
    bias = bias_ref[:]  # (nH, n, n)
    # Unshifted blocks (mask statically absent — half of every stage's
    # depth): pre-tile the bias once per cell so the group loop adds it in
    # ONE vector op on the batched score tensor, with no per-window slice /
    # re-concat pass and no zeros-mask DMA or add.
    bias_t = (
        None
        if has_mask
        else (bias if gw == 1 else jnp.concatenate([bias] * gw, 0))
    )
    slabs = [[] for _ in range(npairs)]  # tail mode: per-plane y1 pieces

    # All row/window bookkeeping below is strictly 2D concats + slices:
    # Mosaic cannot shape-cast 4D<->2D for narrow dtypes (bf16 tiling), so the
    # (wd, wh, Wp, C) block is flattened by concatenating its (Wp, C) planes.
    row = jnp.concatenate(
        [x_ref[0, d, h] for d in range(wd) for h in range(wh)], axis=0
    )  # (r, c), token order (d, h, wp)
    if fuse_ln:
        # pre-attention LayerNorm in VMEM (flax fast-variance numerics,
        # ops/pallas_mlp._ln_f32) — saves the standalone LN HBM pass
        from vadcl_tpu.ops.pallas_mlp import _ln_f32

        row, _, _ = _ln_f32(
            row.astype(jnp.float32), ln_s_ref[0, :], ln_b_ref[0, :]
        )
        row = row.astype(dtype)

    # qkv for the WHOLE row in one dot — per-token, layout-independent
    qkv_row = (
        jnp.dot(row, qkv_w_ref[:], preferred_element_type=jnp.float32)
        + qkv_b_ref[0, :]
    ).astype(dtype)  # (r, 3c)

    def win_slice(mat, w):
        # (n, X) for window w: wd*wh strided ww-token runs of the row
        return jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    mat, p * wp + w * ww, p * wp + (w + 1) * ww, axis=0
                )
                for p in range(npairs)
            ],
            axis=0,
        )

    # Walk the row in groups of gw windows; each iteration's score-size tiles
    # are dead at its end, bounding live scoped VMEM to one group.
    for g in range(wins // gw):
        # per-window (n, 3c): the W-axis slice IS the window partition here
        qkvs = [win_slice(qkv_row, w) for w in range(g * gw, (g + 1) * gw)]

        def _wh_stack(base):
            # (gw*nH, n, hd): window-major, head-minor (explicit lax slices —
            # jnp None-indexing lowers via gather, unsupported in Mosaic)
            parts = []
            for w in range(gw):
                for h in range(num_heads):
                    parts.append(
                        jax.lax.expand_dims(
                            jax.lax.slice_in_dim(
                                qkvs[w],
                                base + h * hd,
                                base + (h + 1) * hd,
                                axis=1,
                            ),
                            (0,),
                        )
                    )
            return jnp.concatenate(parts, 0)

        q4 = _wh_stack(0)
        k4 = _wh_stack(c)
        v4 = _wh_stack(2 * c)

        # ONE batched scores dot + ONE softmax + ONE attn@V per group
        s4 = (
            jax.lax.dot_general(
                q4, k4, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (gw*nH, n, n)
        if has_mask:
            parts = []
            for w in range(gw):
                sw = jax.lax.slice_in_dim(
                    s4, w * num_heads, (w + 1) * num_heads, axis=0
                )
                mw = jax.lax.expand_dims(mask_ref[0, g * gw + w], (0,))
                parts.append(sw + bias + mw)
            s4 = jnp.concatenate(parts, 0)
        else:
            s4 = s4 + bias_t
        p4 = jax.nn.softmax(s4, axis=-1).astype(dtype)
        o4 = jax.lax.dot_general(
            p4, v4, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (gw*nH, n, hd)

        # reassemble the group's rows in (d, h, w_local, ww) token order —
        # 2D concats only — then ONE proj dot over the whole group, and
        # store each (wd, wh) plane's W-slice of the row
        owins = [
            jnp.concatenate(
                [
                    jax.lax.squeeze(
                        jax.lax.slice_in_dim(
                            o4, w * num_heads + h, w * num_heads + h + 1,
                            axis=0,
                        ),
                        (0,),
                    )
                    for h in range(num_heads)
                ],
                axis=-1,
            ).astype(dtype)  # (n, c), token order (d, h, ww)
            for w in range(gw)
        ]
        orow = jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    owins[w], p * ww, (p + 1) * ww, axis=0
                )
                for p in range(npairs)
                for w in range(gw)
            ],
            axis=0,
        )  # (wd*wh*gw*ww, c), row order (d, h, w_local, ww)
        o2 = (
            jnp.dot(orow, proj_w_ref[:], preferred_element_type=jnp.float32)
            + proj_b_ref[0, :]
        )
        gww = gw * ww
        for d in range(wd):
            for h in range(wh):
                p = d * wh + h
                o_slice = jax.lax.slice_in_dim(
                    o2, p * gww, (p + 1) * gww, axis=0
                )
                if residual:
                    # the block's residual add, in VMEM (fp32 accumulate)
                    o_slice = o_slice + x_ref[
                        0, d, h, g * gww:(g + 1) * gww, :
                    ].astype(jnp.float32)
                if tail is not None:
                    # defer the store: the MLP tail consumes the whole row.
                    # Cast through the compute dtype first — the two-kernel
                    # path round-trips y1 through HBM in bf16, so this keeps
                    # the fused and unfused paths numerically identical.
                    slabs[p].append(o_slice.astype(dtype))
                else:
                    out_ref[0, d, h, g * gww:(g + 1) * gww, :] = (
                        o_slice.astype(out_ref.dtype)
                    )

    if tail is not None:
        ln2_s_ref, ln2_b_ref, w1_ref, b1_ref, w2_ref, b2_ref = tail
        row1 = jnp.concatenate(
            [piece for p in range(npairs) for piece in slabs[p]], axis=0
        ).astype(jnp.float32)  # (r, c), token order (d, h, wp)
        y = _mlp_tail_rows(
            row1, dtype, ln2_s_ref[0, :], ln2_b_ref[0, :],
            w1_ref, b1_ref, w2_ref, b2_ref,
        )
        for d in range(wd):
            for h in range(wh):
                p = d * wh + h
                out_ref[0, d, h] = jax.lax.slice_in_dim(
                    y, p * wp, (p + 1) * wp, axis=0
                ).astype(out_ref.dtype)


def folded_packed_applicable(
    grid_shape: Tri, window: Tri, num_heads: int
) -> bool:
    """Gate for the fold+packed kernel: window-divisible dims and the
    per-window packed score tensors (n, nH*n) within the VMEM budget."""
    d, h, w = grid_shape
    wd, wh, ww = window
    if d % wd or h % wh or w % ww:
        return False
    n = wd * wh * ww
    L = num_heads * n
    # ~6 live fp32 (n, L) tiles (s, bias+mask copy, m, e, dbc, p) + the two
    # bf16 (L, c) masked K/V row-tiles (c <= 128 lanes padded)
    est = 6 * _pad_to(n, 8) * _pad_to(L, 128) * 4 + 2 * _pad_to(L, 8) * 128 * 2
    return est <= _VMEM_BUDGET


def _fold_packed_kernel(
    x_ref,  # (1, wd, wh, Wp, C) one row of windows (compute dtype)
    qkv_w_ref,  # (C, 3C)
    qkv_b_ref,  # (1, 3C) fp32
    proj_w_ref,  # (C, C)
    proj_b_ref,  # (1, C) fp32
    ln_s_ref,  # (1, C) fp32 (unused when not fuse_ln)
    ln_b_ref,  # (1, C) fp32
    biasp_ref,  # (N, nH*N) fp32 rel-pos bias, heads packed in lanes
    mask_ref,  # (1, WINS, N, N) fp32 (or (1, 1, N, N) when has_mask=False)
    out_ref,  # (1, wd, wh, Wp, C)
    *,
    num_heads: int,
    scale: float,
    window: Tri,
    fuse_ln: bool,
    residual: bool,
    has_mask: bool = True,
):
    """Fold layout + head-packed math (inference-only; no VJP).

    The plain fold kernel's per-head dots contract/emit head_dim=16 lanes
    (~12.5% MXU K-efficiency) and pay hundreds of per-head slice/concat
    relayouts per cell (_wh_stack / owins).  Here heads stay in the LANE
    dimension end to end, exactly like ops/pallas_attn.py:_attn_kernel_packed:
    scores for all heads of a window are ONE ``(n, C) x (C→(L, C) masked
    row-tile)`` dot, blockwise softmax comes from indicator matmuls, and
    attn@V is ONE ``(n, L) x (L, C)`` dot whose output already has heads
    merged — the per-head stacking copies disappear entirely.  ~2.8x padded
    kernel FLOPs for ~6x fewer/fatter MXU ops and zero relayouts; composes
    with the fold win (no partition/reverse HBM round-trips, LN + residual
    in-kernel).
    """
    wd, wh, ww = window
    _, _, _, wp, c = x_ref.shape
    wins = wp // ww
    n = wd * wh * ww
    hd = c // num_heads
    dtype = x_ref.dtype
    npairs = wd * wh
    L = num_heads * n

    row_raw = jnp.concatenate(
        [x_ref[0, d, h] for d in range(wd) for h in range(wh)], axis=0
    )  # (r, c), token order (d, h, wp)
    if fuse_ln:
        from vadcl_tpu.ops.pallas_mlp import _ln_f32

        row, _, _ = _ln_f32(
            row_raw.astype(jnp.float32), ln_s_ref[0, :], ln_b_ref[0, :]
        )
        row = row.astype(dtype)
    else:
        row = row_raw

    # qkv for the whole row in one dot — kept fp32 so the per-window q scale
    # and k/v casts match _attn_kernel_packed's numerics exactly
    qkv_row = (
        jnp.dot(row, qkv_w_ref[:], preferred_element_type=jnp.float32)
        + qkv_b_ref[0, :]
    )  # (r, 3c) fp32

    # head-ownership mask for the row-tiled K/V (L, C) and the (L, nH) block
    # indicator for the softmax denominators (ops/pallas_attn.py:149-157)
    row_head = jax.lax.broadcasted_iota(jnp.int32, (L, c), 0) // n
    ch_head = jax.lax.broadcasted_iota(jnp.int32, (L, c), 1) // hd
    own = row_head == ch_head
    blk = (
        jax.lax.broadcasted_iota(jnp.int32, (L, num_heads), 0) // n
        == jax.lax.broadcasted_iota(jnp.int32, (L, num_heads), 1)
    ).astype(jnp.float32)
    biasp = biasp_ref[:]  # (n, L)

    def win_slice(mat, w):
        return jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    mat, p * wp + w * ww, p * wp + (w + 1) * ww, axis=0
                )
                for p in range(npairs)
            ],
            axis=0,
        )

    owins = []
    for w in range(wins):
        qkvw = win_slice(qkv_row, w)  # (n, 3c) fp32
        q = (qkvw[:, :c] * scale).astype(dtype)
        k = qkvw[:, c : 2 * c].astype(dtype)
        v = qkvw[:, 2 * c :].astype(dtype)
        ktile = jnp.where(own, jnp.concatenate([k] * num_heads, axis=0), 0)
        s = jax.lax.dot_general(
            q, ktile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n, L)
        if has_mask:
            s = s + biasp + jnp.concatenate(
                [mask_ref[0, w]] * num_heads, axis=1
            )
        else:
            s = s + biasp
        # per-head row max, broadcast back across the head's lane block
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
        )  # (n, c) — heads already merged in lanes
        owins.append(o.astype(dtype))

    # reassemble the row in (d, h, w_local, ww) token order, ONE proj dot for
    # the whole row, then per-plane residual + store (fold epilogue, gw=wins)
    orow = jnp.concatenate(
        [
            jax.lax.slice_in_dim(owins[w], p * ww, (p + 1) * ww, axis=0)
            for p in range(npairs)
            for w in range(wins)
        ],
        axis=0,
    )  # (npairs*wins*ww, c)
    o2 = (
        jnp.dot(orow, proj_w_ref[:], preferred_element_type=jnp.float32)
        + proj_b_ref[0, :]
    )
    for d in range(wd):
        for h in range(wh):
            p = d * wh + h
            o_slice = jax.lax.slice_in_dim(o2, p * wp, (p + 1) * wp, axis=0)
            if residual:
                o_slice = o_slice + x_ref[0, d, h].astype(jnp.float32)
            out_ref[0, d, h] = o_slice.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window", "scale", "interpret", "residual"),
)
def fused_window_attention_folded_packed(
    x: jax.Array,  # (B, Dp, Hp, Wp, C) — already padded & (if shifted) rolled
    qkv_w: jax.Array,
    qkv_b: Optional[jax.Array],
    proj_w: jax.Array,
    proj_b: jax.Array,
    bias: jax.Array,  # (nH, N, N) fp32
    mask: Optional[jax.Array],  # (nW, N, N) fp32 or None
    num_heads: int,
    window: Tri,
    scale: float,
    interpret: bool = False,
    ln_scale: Optional[jax.Array] = None,
    ln_bias: Optional[jax.Array] = None,
    residual: bool = False,
) -> jax.Array:
    """Inference-only fold+packed attention (no VJP — trainers use "fold")."""
    b, d, h, w, c = x.shape
    wd, wh, ww = window
    assert d % wd == 0 and h % wh == 0 and w % ww == 0, (
        "folded kernel requires window-divisible dims (pad first); use "
        "folded_packed_applicable() to gate"
    )
    nd, nhb, wins = d // wd, h // wh, w // ww
    n = wd * wh * ww
    nrows = nd * nhb
    dtype = x.dtype
    L = num_heads * n

    qkv_b32 = (
        qkv_b.astype(jnp.float32)
        if qkv_b is not None
        else jnp.zeros((3 * c,), jnp.float32)
    ).reshape(1, -1)
    # bias packed once in XLA: (nH, n, n) -> (n, nH*n)
    bias_packed = jnp.transpose(bias.astype(jnp.float32), (1, 0, 2)).reshape(
        n, L
    )
    has_mask = mask is not None
    if has_mask:
        masks = mask.astype(jnp.float32).reshape(nrows, wins, n, n)
        mask_spec = pl.BlockSpec(
            (1, wins, n, n),
            lambda bi, di, hi, _nh=nhb: (di * _nh + hi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        masks = jnp.zeros((1, 1, n, n), jnp.float32)
        mask_spec = pl.BlockSpec(
            (1, 1, n, n),
            lambda bi, di, hi: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    fuse_ln = ln_scale is not None
    ln_s = (
        ln_scale.astype(jnp.float32)
        if fuse_ln
        else jnp.ones((c,), jnp.float32)
    ).reshape(1, -1)
    ln_b = (
        ln_bias.astype(jnp.float32)
        if fuse_ln
        else jnp.zeros((c,), jnp.float32)
    ).reshape(1, -1)

    kernel = functools.partial(
        _fold_packed_kernel, num_heads=num_heads, scale=scale, window=window,
        fuse_ln=fuse_ln, residual=residual, has_mask=has_mask,
    )
    row_spec = pl.BlockSpec(
        (1, wd, wh, w, c),
        lambda bi, di, hi: (bi, di, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nd, nhb),
        in_specs=[
            row_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # proj_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # proj_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_s
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_b
            pl.BlockSpec(
                (n, L), lambda bi, di, hi: (0, 0), memory_space=pltpu.VMEM
            ),
            mask_spec,
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, c), dtype),
        interpret=interpret,
        **_compiler_params(),
    )(
        x,
        qkv_w.astype(dtype),
        qkv_b32,
        proj_w.astype(dtype),
        proj_b.astype(jnp.float32).reshape(1, -1),
        ln_s,
        ln_b,
        bias_packed,
        masks,
    )


# The backward holds roughly 1.5x the forward's live score-size tiles at a
# time (scores, probs fp32+compute, dp, ds, scaled ds, plus the lane-padded
# q/k/v/do/dq/dk/dv stacks — hd pads to a full 128-lane tile, so each stack
# costs a score tile too).  16 was calibrated on-chip: the whole-block
# backward at (C=192, nH=12, N=98, gw=1) + MLP tail compiles and runs within
# Mosaic's 16 MB scoped-vmem stack, so the estimate must admit it; nH=24
# geometries still reject and fall back to the partitioned backward.
_LIVE_TILES_BWD = 16


def _bwd_tail_bytes(tokens: int, c: int, ch: int) -> int:
    """Scoped-vmem reserved by the in-group MLP-tail backward: ~4 hidden-width
    and ~6 feature-width fp32 temporaries over the group's tokens."""
    return tokens * (4 * ch + 6 * c) * 4


def _pick_gw_bwd(
    wins: int, num_heads: int, n: int,
    window: Tri = (1, 1, 1), c: int = 0, ch: int = 0,
) -> int:
    wd, wh, ww = window
    for cand in (8, 4, 2, 1):
        if wins % cand:
            continue
        est = (
            _LIVE_TILES_BWD * cand * num_heads
            * _pad_to(n, 8) * _pad_to(n, 128) * 4
        )
        if ch:
            est += _bwd_tail_bytes(wd * wh * cand * ww, c, ch)
        if est <= _VMEM_BUDGET or cand == 1:
            return cand
    return 1


def folded_bwd_applicable(
    grid_shape: Tri, window: Tri, num_heads: int,
    c: int = 0, mlp_hidden: int = 0,
) -> bool:
    """True when the folded backward kernel fits: window-divisible dims and a
    single window's group under the (more conservative) backward budget.
    ``mlp_hidden`` > 0 additionally reserves room for the in-kernel MLP-tail
    backward (whole-block mode)."""
    d, h, w = grid_shape
    wd, wh, ww = window
    if d % wd or h % wh or w % ww:
        return False
    n = wd * wh * ww
    est = _LIVE_TILES_BWD * num_heads * _pad_to(n, 8) * _pad_to(n, 128) * 4
    if mlp_hidden:
        est += _bwd_tail_bytes(n, c, mlp_hidden)
    return est <= _VMEM_BUDGET


def _fold_bwd_kernel(
    x_ref,  # (1, wd, wh, Wp, C) raw row block (compute dtype)
    do_ref,  # (1, wd, wh, Wp, C) upstream grad
    qkv_w_ref,  # (C, 3C)
    qkv_b_ref,  # (1, 3C) fp32
    proj_w_ref,  # (C, C)
    ln_s_ref,  # (1, C) fp32 (unused when not fuse_ln)
    ln_b_ref,  # (1, C) fp32
    bias_ref,  # (nH, N, N) fp32
    mask_ref,  # (1, WINS, N, N) fp32
    dx_ref,  # (1, wd, wh, Wp, C) out
    dqkv_w_ref,  # (C, 3C) fp32 accumulator
    dqkv_b_ref,  # (1, 3C) fp32 accumulator
    dproj_w_ref,  # (C, C) fp32 accumulator
    dproj_b_ref,  # (1, C) fp32 accumulator
    dbias_ref,  # (nH, N, N) fp32 accumulator
    dln_s_ref,  # (1, C) fp32 accumulator
    dln_b_ref,  # (1, C) fp32 accumulator
    *,
    num_heads: int,
    scale: float,
    window: Tri,
    fuse_ln: bool,
    residual: bool,
    tail_refs=None,  # whole-block mode: dict of MLP-tail refs (see _blk_bwd)
    has_mask: bool = True,
):
    wd, wh, ww = window
    _, _, _, wp, c = x_ref.shape
    wins = wp // ww
    n = wd * wh * ww
    hd = c // num_heads
    dtype = x_ref.dtype
    ch = tail_refs["w1"].shape[1] if tail_refs else 0
    gw = _pick_gw_bwd(wins, num_heads, n, window, c, ch)
    npairs = wd * wh
    bias = bias_ref[:]
    bias_t = (
        None
        if has_mask
        else (bias if gw == 1 else jnp.concatenate([bias] * gw, 0))
    )

    first = jnp.logical_and(
        jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0),
        pl.program_id(2) == 0,
    )

    @pl.when(first)
    def _init():
        dqkv_w_ref[:] = jnp.zeros_like(dqkv_w_ref)
        dqkv_b_ref[:] = jnp.zeros_like(dqkv_b_ref)
        dproj_w_ref[:] = jnp.zeros_like(dproj_w_ref)
        dproj_b_ref[:] = jnp.zeros_like(dproj_b_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dln_s_ref[:] = jnp.zeros_like(dln_s_ref)
        dln_b_ref[:] = jnp.zeros_like(dln_b_ref)
        if tail_refs is not None:
            for k in ("dln2_s", "dln2_b", "dw1", "db1", "dw2", "db2"):
                tail_refs[k][:] = jnp.zeros_like(tail_refs[k])

    # ---- recompute forward for the whole row (same layout as _fold_kernel):
    # 2D concats/slices only (Mosaic narrow-dtype shape-cast restriction)
    row_raw = jnp.concatenate(
        [x_ref[0, d, h] for d in range(wd) for h in range(wh)], axis=0
    )  # (r, c), token order (d, h, wp)
    if fuse_ln:
        from vadcl_tpu.ops.pallas_mlp import _ln_f32

        ln_out, xhat, rstd = _ln_f32(
            row_raw.astype(jnp.float32), ln_s_ref[0, :], ln_b_ref[0, :]
        )
        row = ln_out.astype(dtype)
    else:
        row = row_raw
        xhat = rstd = None
    qkv_row = (
        jnp.dot(row, qkv_w_ref[:], preferred_element_type=jnp.float32)
        + qkv_b_ref[0, :]
    ).astype(dtype)  # (r, 3c)
    do_row = (
        jnp.concatenate(
            [do_ref[0, d, h] for d in range(wd) for h in range(wh)], axis=0
        )  # (r, c)
        if tail_refs is None
        else None  # whole-block mode slices do_ref per group instead
    )

    def win_slice(mat, w):
        return jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    mat, p * wp + w * ww, p * wp + (w + 1) * ww, axis=0
                )
                for p in range(npairs)
            ],
            axis=0,
        )

    gww = gw * ww
    for g in range(wins // gw):
        qkvs = [win_slice(qkv_row, w) for w in range(g * gw, (g + 1) * gw)]

        def _wh_stack(base, mats, width):
            parts = []
            for w in range(gw):
                for h in range(num_heads):
                    parts.append(
                        jax.lax.expand_dims(
                            jax.lax.slice_in_dim(
                                mats[w],
                                base + h * width,
                                base + (h + 1) * width,
                                axis=1,
                            ),
                            (0,),
                        )
                    )
            return jnp.concatenate(parts, 0)  # (gw*nH, n, width)

        q4 = _wh_stack(0, qkvs, hd)
        k4 = _wh_stack(c, qkvs, hd)
        v4 = _wh_stack(2 * c, qkvs, hd)
        s4 = (
            jax.lax.dot_general(
                q4, k4, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        if has_mask:
            parts = []
            for w in range(gw):
                sw = jax.lax.slice_in_dim(
                    s4, w * num_heads, (w + 1) * num_heads, axis=0
                )
                mw = jax.lax.expand_dims(mask_ref[0, g * gw + w], (0,))
                parts.append(sw + bias + mw)
            s4 = jnp.concatenate(parts, 0)
        else:
            s4 = s4 + bias_t
        p4f = jax.nn.softmax(s4, axis=-1)  # fp32
        p4 = p4f.astype(dtype)
        o4 = jax.lax.dot_general(
            p4, v4, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (gw*nH, n, hd) fp32

        # per-window attention outputs (n, c) in the compute dtype
        owins = [
            jnp.concatenate(
                [
                    jax.lax.squeeze(
                        jax.lax.slice_in_dim(
                            o4, w * num_heads + h, w * num_heads + h + 1,
                            axis=0,
                        ),
                        (0,),
                    )
                    for h in range(num_heads)
                ],
                axis=-1,
            ).astype(dtype)
            for w in range(gw)
        ]

        if tail_refs is None:
            douts = [win_slice(do_row, g * gw + w) for w in range(gw)]
            res_rows = None
        else:
            # ---- whole-block mode: recompute y1 for the group, run the MLP
            # tail backward in VMEM, and use dy1 as the attention upstream ----
            from vadcl_tpu.ops.pallas_mlp import (
                _dgelu_f32, _gelu_f32, _ln_f32 as _ln2_f32,
            )

            orow = jnp.concatenate(
                [
                    jax.lax.slice_in_dim(owins[w], p * ww, (p + 1) * ww, axis=0)
                    for p in range(npairs)
                    for w in range(gw)
                ],
                axis=0,
            )  # (T, c), plane order (d, h, w_local, ww)
            o2 = (
                jnp.dot(orow, proj_w_ref[:], preferred_element_type=jnp.float32)
                + tail_refs["proj_b"][0, :]
            )
            xg = jnp.concatenate(
                [
                    x_ref[0, d, h, g * gww:(g + 1) * gww, :]
                    for d in range(wd)
                    for h in range(wh)
                ],
                axis=0,
            )  # (T, c) raw input, plane order
            # bf16 cast boundary = the two-kernel path's y1 HBM round-trip
            y1g = (o2 + xg.astype(jnp.float32)).astype(dtype)
            dog = jnp.concatenate(
                [
                    do_ref[0, d, h, g * gww:(g + 1) * gww, :]
                    for d in range(wd)
                    for h in range(wh)
                ],
                axis=0,
            )  # (T, c) upstream block grad, plane order
            scale2 = tail_refs["ln2_s"][0, :]
            dy32 = dog.astype(jnp.float32)
            z2, xhat2, rstd2 = _ln2_f32(
                y1g.astype(jnp.float32), scale2, tail_refs["ln2_b"][0, :]
            )
            hh = (
                jnp.dot(
                    z2.astype(dtype), tail_refs["w1"][:],
                    preferred_element_type=jnp.float32,
                )
                + tail_refs["b1"][0, :]
            )
            hb = hh.astype(dtype).astype(jnp.float32)
            gact = _gelu_f32(hb)
            tail_refs["db2"][:] += jnp.sum(dy32, axis=0, keepdims=True)
            tail_refs["dw2"][:] += jax.lax.dot_general(
                gact, dy32, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dg = jax.lax.dot_general(
                dy32, tail_refs["w2"][:].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dh = dg * _dgelu_f32(hb)
            tail_refs["db1"][:] += jnp.sum(dh, axis=0, keepdims=True)
            tail_refs["dw1"][:] += jax.lax.dot_general(
                z2, dh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dz = jax.lax.dot_general(
                dh, tail_refs["w1"][:].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            tail_refs["dln2_s"][:] += jnp.sum(dz * xhat2, axis=0, keepdims=True)
            tail_refs["dln2_b"][:] += jnp.sum(dz, axis=0, keepdims=True)
            dxhat2 = dz * scale2
            m1 = jnp.mean(dxhat2, axis=-1, keepdims=True)
            m2 = jnp.mean(dxhat2 * xhat2, axis=-1, keepdims=True)
            # dy1 = dY + LN2 vjp — the upstream grad into the block front;
            # bf16 cast = the two-kernel path's dy1 HBM round-trip
            res_rows = (
                dy32 + rstd2 * (dxhat2 - m1 - xhat2 * m2)
            ).astype(dtype)  # (T, c) plane order

            def g_win_slice(mat, w):
                # plane-ordered group rows -> window token order (n, c)
                return jnp.concatenate(
                    [
                        jax.lax.slice_in_dim(
                            mat, p * gww + w * ww, p * gww + (w + 1) * ww,
                            axis=0,
                        )
                        for p in range(npairs)
                    ],
                    axis=0,
                )

            douts = [g_win_slice(res_rows, w) for w in range(gw)]

        # ---- proj backward per window; build the do stack ----
        do4_parts = []
        for w in range(gw):
            o = owins[w]  # (n, c)
            dout = douts[w]  # (n, c)
            dproj_b_ref[0, :] += jnp.sum(dout.astype(jnp.float32), axis=0)
            dproj_w_ref[:] += jax.lax.dot_general(
                o, dout, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dproj_w_ref.dtype)
            doa = jax.lax.dot_general(
                dout, proj_w_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)  # (n, c) = dout @ proj_w^T
            for h in range(num_heads):
                do4_parts.append(
                    jax.lax.expand_dims(
                        jax.lax.slice_in_dim(
                            doa, h * hd, (h + 1) * hd, axis=1
                        ),
                        (0,),
                    )
                )
        do4 = jnp.concatenate(do4_parts, 0)  # (gw*nH, n, hd)

        # dv = P^T dO ; dP = dO V^T ; softmax backward
        dv4 = jax.lax.dot_general(
            p4, do4, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp4 = jax.lax.dot_general(
            do4, v4, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds4 = p4f * (dp4 - jnp.sum(dp4 * p4f, axis=-1, keepdims=True))
        for h in range(num_heads):
            acc = None
            for w in range(gw):
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
        )
        dk4 = jax.lax.dot_general(
            ds4s, q4, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

        # ---- dqkv per window -> weight grads + d(attention input) ----
        dxa_wins = []
        for w in range(gw):
            cols = []
            for grad4 in (dq4, dk4, dv4):
                for h in range(num_heads):
                    cols.append(
                        jax.lax.squeeze(
                            jax.lax.slice_in_dim(
                                grad4, w * num_heads + h,
                                w * num_heads + h + 1, axis=0,
                            ),
                            (0,),
                        )
                    )
            dqkv = jnp.concatenate(cols, axis=-1)  # (n, 3c) fp32
            dqkv_b_ref[0, :] += jnp.sum(dqkv, axis=0).astype(
                dqkv_b_ref.dtype
            )
            xw = win_slice(row, g * gw + w)  # LN output when fuse_ln
            dqkv_w_ref[:] += jax.lax.dot_general(
                xw, dqkv.astype(dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dqkv_w_ref.dtype)
            dxa_wins.append(
                jax.lax.dot_general(
                    dqkv.astype(dtype), qkv_w_ref[:],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (n, c) fp32 — d(LN output) for this window
            )

        # reassemble the group's rows in (d, h, w_local, ww) order, then per
        # (wd, wh) plane: LN vjp (per-token) + residual + store
        drow = jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    dxa_wins[w], p * ww, (p + 1) * ww, axis=0
                )
                for p in range(npairs)
                for w in range(gw)
            ],
            axis=0,
        )  # (npairs*gww, c) fp32
        for d in range(wd):
            for h in range(wh):
                p = d * wh + h
                dxln = jax.lax.slice_in_dim(
                    drow, p * gww, (p + 1) * gww, axis=0
                )  # (gww, c) fp32
                if fuse_ln:
                    t0 = p * wp + g * gww
                    xh = jax.lax.slice_in_dim(xhat, t0, t0 + gww, axis=0)
                    rs = jax.lax.slice_in_dim(rstd, t0, t0 + gww, axis=0)
                    dln_s_ref[0, :] += jnp.sum(dxln * xh, axis=0)
                    dln_b_ref[0, :] += jnp.sum(dxln, axis=0)
                    dxhat = dxln * ln_s_ref[0, :]
                    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
                    m2 = jnp.mean(dxhat * xh, axis=-1, keepdims=True)
                    dslice = rs * (dxhat - m1 - xh * m2)
                else:
                    dslice = dxln
                if residual:
                    # whole-block mode: the residual branch carries dy1 (the
                    # MLP-tail backward's output), not the raw upstream dY
                    res = (
                        jax.lax.slice_in_dim(
                            res_rows, p * gww, (p + 1) * gww, axis=0
                        )
                        if res_rows is not None
                        else do_ref[0, d, h, g * gww:(g + 1) * gww, :]
                    )
                    dslice = dslice + res.astype(jnp.float32)
                dx_ref[0, d, h, g * gww:(g + 1) * gww, :] = dslice.astype(
                    dx_ref.dtype
                )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "window", "scale", "fuse_ln", "residual", "interpret"
    ),
)
def _fold_bwd_call(
    x: jax.Array,  # (B, Dp, Hp, Wp, C) raw (rolled if shifted)
    do: jax.Array,  # (B, Dp, Hp, Wp, C)
    qkv_w: jax.Array,
    qkv_b32: jax.Array,  # (1, 3C) fp32
    proj_w: jax.Array,
    ln_s: jax.Array,  # (1, C) fp32
    ln_b: jax.Array,  # (1, C) fp32
    bias: jax.Array,  # (nH, N, N)
    mask: Optional[jax.Array],  # (nW, N, N) or None
    num_heads: int,
    window: Tri,
    scale: float,
    fuse_ln: bool,
    residual: bool,
    interpret: bool = False,
    tail=None,  # whole-block mode: (proj_b, ln2_s, ln2_b, w1, b1, w2)
):
    b, d, h, w, c = x.shape
    wd, wh, ww = window
    nd, nhb, wins = d // wd, h // wh, w // ww
    n = wd * wh * ww
    nrows = nd * nhb
    dtype = x.dtype
    nH = num_heads
    has_mask = mask is not None
    if has_mask:
        masks = mask.astype(jnp.float32).reshape(nrows, wins, n, n)
        mask_spec = pl.BlockSpec(
            (1, wins, n, n),
            lambda bi, di, hi, _nh=nhb: (di * _nh + hi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        masks = jnp.zeros((1, 1, n, n), jnp.float32)
        mask_spec = pl.BlockSpec(
            (1, 1, n, n),
            lambda bi, di, hi: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    row_spec = pl.BlockSpec(
        (1, wd, wh, w, c),
        lambda bi, di, hi: (bi, di, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    const2 = lambda bi, di, hi: (0, 0)  # noqa: E731
    out_shapes = [
        jax.ShapeDtypeStruct((b, d, h, w, c), dtype),  # dx
        jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),  # dqkv_w
        jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),  # dqkv_b
        jax.ShapeDtypeStruct((c, c), jnp.float32),  # dproj_w
        jax.ShapeDtypeStruct((1, c), jnp.float32),  # dproj_b
        jax.ShapeDtypeStruct((nH, n, n), jnp.float32),  # dbias
        jax.ShapeDtypeStruct((1, c), jnp.float32),  # dln_s
        jax.ShapeDtypeStruct((1, c), jnp.float32),  # dln_b
    ]
    out_specs = [
        row_spec,
        pl.BlockSpec((c, 3 * c), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * c), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (nH, n, n), lambda bi, di, hi: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
    ]
    in_specs = [
        row_spec,  # x
        row_spec,  # do
        pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_b
        pl.BlockSpec(memory_space=pltpu.VMEM),  # proj_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_s
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_b
        pl.BlockSpec(
            (num_heads, n, n),
            lambda bi, di, hi: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        mask_spec,
    ]
    operands = [
        x,
        do.astype(dtype),
        qkv_w.astype(dtype),
        qkv_b32,
        proj_w.astype(dtype),
        ln_s,
        ln_b,
        bias.astype(jnp.float32),
        masks,
    ]

    if tail is None:
        kernel = functools.partial(
            _fold_bwd_kernel, num_heads=num_heads, scale=scale, window=window,
            fuse_ln=fuse_ln, residual=residual, has_mask=has_mask,
        )
    else:
        proj_b, ln2_s, ln2_b, w1, b1, w2 = tail
        ch = w1.shape[1]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        operands += [
            proj_b.astype(jnp.float32).reshape(1, -1),
            ln2_s.astype(jnp.float32).reshape(1, -1),
            ln2_b.astype(jnp.float32).reshape(1, -1),
            w1.astype(dtype),
            b1.astype(jnp.float32).reshape(1, -1),
            w2.astype(dtype),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((1, c), jnp.float32),  # dln2_s
            jax.ShapeDtypeStruct((1, c), jnp.float32),  # dln2_b
            jax.ShapeDtypeStruct((c, ch), jnp.float32),  # dw1
            jax.ShapeDtypeStruct((1, ch), jnp.float32),  # db1
            jax.ShapeDtypeStruct((ch, c), jnp.float32),  # dw2
            jax.ShapeDtypeStruct((1, c), jnp.float32),  # db2
        ]
        out_specs += [
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ch), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        ]

        def kernel(
            x_r, do_r, qw_r, qb_r, pw_r, ls_r, lb_r, bi_r, mk_r,
            pb_r, l2s_r, l2b_r, w1_r, b1_r, w2_r,
            dx_r, dqw_r, dqb_r, dpw_r, dpb_r, dbi_r, dls_r, dlb_r,
            dl2s_r, dl2b_r, dw1_r, db1_r, dw2_r, db2_r,
        ):
            _fold_bwd_kernel(
                x_r, do_r, qw_r, qb_r, pw_r, ls_r, lb_r, bi_r, mk_r,
                dx_r, dqw_r, dqb_r, dpw_r, dpb_r, dbi_r, dls_r, dlb_r,
                num_heads=num_heads, scale=scale, window=window,
                fuse_ln=fuse_ln, residual=residual, has_mask=has_mask,
                tail_refs={
                    "proj_b": pb_r, "ln2_s": l2s_r, "ln2_b": l2b_r,
                    "w1": w1_r, "b1": b1_r, "w2": w2_r,
                    "dln2_s": dl2s_r, "dln2_b": dl2b_r,
                    "dw1": dw1_r, "db1": db1_r, "dw2": dw2_r, "db2": db2_r,
                },
            )

    return pl.pallas_call(
        kernel,
        grid=(b, nd, nhb),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
        **_compiler_params(),
    )(*operands)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window", "scale", "interpret", "residual"),
)
def fused_window_attention_folded(
    x: jax.Array,  # (B, Dp, Hp, Wp, C) — already padded & (if shifted) rolled
    qkv_w: jax.Array,  # (C, 3C)
    qkv_b: Optional[jax.Array],  # (3C,) or None
    proj_w: jax.Array,  # (C, C)
    proj_b: jax.Array,  # (C,)
    bias: jax.Array,  # (nH, N, N) fp32 — pre-gathered rel-pos bias
    mask: Optional[jax.Array],  # (nW, N, N) fp32 or None (nW windows/image)
    num_heads: int,
    window: Tri,
    scale: float,
    interpret: bool = False,
    ln_scale: Optional[jax.Array] = None,  # (C,) — fuse pre-attention LN
    ln_bias: Optional[jax.Array] = None,
    residual: bool = False,  # add x to the projected output in-kernel
    mlp=None,  # optional (ln2_s, ln2_b, w1, b1, w2, b2): fuse the MLP tail
) -> jax.Array:
    b, d, h, w, c = x.shape
    wd, wh, ww = window
    assert d % wd == 0 and h % wh == 0 and w % ww == 0, (
        "folded kernel requires window-divisible dims (pad first); use "
        "folded_attention_applicable() to gate"
    )
    assert mlp is None or (residual and ln_scale is not None), (
        "the MLP tail implies whole-block semantics (fused LN + residual)"
    )
    nd, nhb, wins = d // wd, h // wh, w // ww
    n = wd * wh * ww
    nrows = nd * nhb
    dtype = x.dtype

    qkv_b32 = (
        qkv_b.astype(jnp.float32)
        if qkv_b is not None
        else jnp.zeros((3 * c,), jnp.float32)
    ).reshape(1, -1)
    # window enumeration order is (d, h, w) (ops/window.py:window_partition),
    # so row (di, hi) covers mask rows [(di*nhb+hi)*wins, +wins)
    has_mask = mask is not None
    if has_mask:
        masks = mask.astype(jnp.float32).reshape(nrows, wins, n, n)
        mask_spec = pl.BlockSpec(
            (1, wins, n, n),
            lambda bi, di, hi, _nh=nhb: (di * _nh + hi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        # unshifted block: the kernel never reads the mask (has_mask=False
        # specialization) — ship one n×n zeros tile instead of a full
        # (rows, wins, n, n) zeros tensor per cell
        masks = jnp.zeros((1, 1, n, n), jnp.float32)
        mask_spec = pl.BlockSpec(
            (1, 1, n, n),
            lambda bi, di, hi: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    fuse_ln = ln_scale is not None
    ln_s = (
        ln_scale.astype(jnp.float32)
        if fuse_ln
        else jnp.ones((c,), jnp.float32)
    ).reshape(1, -1)
    ln_b = (
        ln_bias.astype(jnp.float32)
        if fuse_ln
        else jnp.zeros((c,), jnp.float32)
    ).reshape(1, -1)

    if mlp is None:
        kernel = functools.partial(
            _fold_kernel, num_heads=num_heads, scale=scale, window=window,
            fuse_ln=fuse_ln, residual=residual, has_mask=has_mask,
        )
    else:
        def kernel(x_r, qw_r, qb_r, pw_r, pb_r, ls_r, lb_r, bi_r, mk_r,
                   l2s_r, l2b_r, w1_r, b1_r, w2_r, b2_r, out_r):
            _fold_kernel(
                x_r, qw_r, qb_r, pw_r, pb_r, ls_r, lb_r, bi_r, mk_r, out_r,
                num_heads=num_heads, scale=scale, window=window,
                fuse_ln=fuse_ln, residual=residual, has_mask=has_mask,
                tail=(l2s_r, l2b_r, w1_r, b1_r, w2_r, b2_r),
            )

    in_specs = [
        pl.BlockSpec(
            (1, wd, wh, w, c),
            lambda bi, di, hi: (bi, di, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_b
        pl.BlockSpec(memory_space=pltpu.VMEM),  # proj_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # proj_b
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_s
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_b
        pl.BlockSpec(
            (num_heads, n, n),
            lambda bi, di, hi: (0, 0, 0),  # same block every cell
            memory_space=pltpu.VMEM,
        ),
        mask_spec,
    ]
    operands = [
        x,
        qkv_w.astype(dtype),
        qkv_b32,
        proj_w.astype(dtype),
        proj_b.astype(jnp.float32).reshape(1, -1),
        ln_s,
        ln_b,
        bias.astype(jnp.float32),
        masks,
    ]
    if mlp is not None:
        ln2_s, ln2_b, w1, b1, w2, b2 = mlp
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        operands += [
            ln2_s.astype(jnp.float32).reshape(1, -1),
            ln2_b.astype(jnp.float32).reshape(1, -1),
            w1.astype(dtype),
            b1.astype(jnp.float32).reshape(1, -1),
            w2.astype(dtype),
            b2.astype(jnp.float32).reshape(1, -1),
        ]
    return pl.pallas_call(
        kernel,
        grid=(b, nd, nhb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, wd, wh, w, c),
            lambda bi, di, hi: (bi, di, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, c), dtype),
        interpret=interpret,
        **_compiler_params(),
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def folded_window_attention_trainable(
    x: jax.Array,
    qkv_w: jax.Array,
    qkv_b: Optional[jax.Array],
    proj_w: jax.Array,
    proj_b: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array],
    num_heads: int,
    window: Tri,
    scale: float,
    interpret: bool = False,
):
    """Differentiable folded attention: Pallas folded forward + the existing
    flash-style Pallas backward over XLA-partitioned windows."""
    return fused_window_attention_folded(
        x, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
        num_heads=num_heads, window=window, scale=scale, interpret=interpret,
    )


def _fwd(x, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
         num_heads, window, scale, interpret):
    out = fused_window_attention_folded(
        x, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
        num_heads=num_heads, window=window, scale=scale, interpret=interpret,
    )
    return out, (x, qkv_w, qkv_b, proj_w, proj_b, bias, mask)


def _bwd(num_heads, window, scale, interpret, res, do):
    from vadcl_tpu.ops.pallas_attn_bwd import _bwd_call, _pick_wins_bwd
    from vadcl_tpu.ops.window import window_partition, window_reverse

    x, qkv_w, qkv_b, proj_w, proj_b, bias, mask = res
    b, d, h, w, c = x.shape
    wd, wh, ww = window
    n = wd * wh * ww
    if folded_bwd_applicable((d, h, w), window, num_heads):
        qkv_b32 = (
            qkv_b.astype(jnp.float32)
            if qkv_b is not None
            else jnp.zeros((3 * c,), jnp.float32)
        ).reshape(1, -1)
        ones = jnp.ones((1, c), jnp.float32)
        zeros = jnp.zeros((1, c), jnp.float32)
        dx, dqkv_w, dqkv_b, dproj_w, dproj_b, dbias, _, _ = _fold_bwd_call(
            x, do, qkv_w, qkv_b32, proj_w, ones, zeros, bias, mask,
            num_heads=num_heads, window=window, scale=scale,
            fuse_ln=False, residual=False, interpret=interpret,
        )
        return (
            dx,
            dqkv_w.astype(qkv_w.dtype),
            dqkv_b.reshape(-1).astype(qkv_b.dtype)
            if qkv_b is not None
            else None,
            dproj_w.astype(proj_w.dtype),
            dproj_b.reshape(-1).astype(proj_b.dtype),
            dbias.astype(bias.dtype),
            None,  # mask: constant
        )
    n_windows = (d // wd) * (h // wh) * (w // ww)
    x_windows = window_partition(x, window)
    do_windows = window_partition(do.astype(x.dtype), window)
    bn = x_windows.shape[0]
    wins = _pick_wins_bwd(bn, n_windows, num_heads, n)
    nw_blocks = n_windows // wins
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
                bias.astype(jnp.float32)[None], (nw_blocks, num_heads, n, n)
            ),
            mask_f.reshape(nw_blocks, wins, n, n),
        ],
        axis=1,
    )
    dx_w, dqkv_w, dqkv_b, dproj_w, dproj_b, dbias = _bwd_call(
        x_windows, qkv_w, qkv_b32, proj_w, proj_b, tables,
        do_windows, num_heads, n_windows, scale, interpret,
    )
    dx = window_reverse(dx_w, window, b, d, h, w)
    return (
        dx,
        dqkv_w.astype(qkv_w.dtype),
        dqkv_b.reshape(-1).astype(qkv_b.dtype) if qkv_b is not None else None,
        dproj_w.astype(proj_w.dtype),
        dproj_b.reshape(-1).astype(proj_b.dtype),
        dbias.astype(bias.dtype),
        None,  # mask: constant
    )


folded_window_attention_trainable.defvjp(_fwd, _bwd)


def _ln_xla(x, ln_s, ln_b):
    """XLA replay of the kernel's in-VMEM LN (flax fast-variance, eps 1e-5),
    used only by the backward to re-derive the attention input."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    mu2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(mu2 - mu * mu, 0.0)
    xhat = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
    return (
        xhat * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)
    ).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def folded_block_attention_trainable(
    x: jax.Array,  # (B, Dp, Hp, Wp, C) raw (padded-free, rolled if shifted)
    ln_s: jax.Array,  # (C,) norm1 scale
    ln_b: jax.Array,  # (C,) norm1 bias
    qkv_w: jax.Array,
    qkv_b: Optional[jax.Array],
    proj_w: jax.Array,
    proj_b: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array],
    num_heads: int,
    window: Tri,
    scale: float,
    interpret: bool = False,
):
    """Whole Swin-block attention front half in ONE kernel pass:
    ``x + proj(attn(LN(x)))`` — the standalone LN and residual-add HBM
    passes fold into the attention kernel's block fetch/store.  Backward
    replays LN in XLA and reuses the flash-style attention backward."""
    return fused_window_attention_folded(
        x, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
        num_heads=num_heads, window=window, scale=scale, interpret=interpret,
        ln_scale=ln_s, ln_bias=ln_b, residual=True,
    )


def _blk_fwd(x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
             num_heads, window, scale, interpret):
    out = folded_block_attention_trainable(
        x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
        num_heads, window, scale, interpret,
    )
    return out, (x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, bias, mask)


def _blk_bwd(num_heads, window, scale, interpret, res, do):
    from vadcl_tpu.ops.pallas_attn_bwd import _bwd_call, _pick_wins_bwd
    from vadcl_tpu.ops.window import window_partition, window_reverse

    x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, bias, mask = res
    b, d, h, w, c = x.shape
    wd, wh, ww = window
    n = wd * wh * ww
    if folded_bwd_applicable((d, h, w), window, num_heads):
        qkv_b32 = (
            qkv_b.astype(jnp.float32)
            if qkv_b is not None
            else jnp.zeros((3 * c,), jnp.float32)
        ).reshape(1, -1)
        (
            dx, dqkv_w, dqkv_b, dproj_w, dproj_b, dbias, dln_s, dln_b
        ) = _fold_bwd_call(
            x, do, qkv_w, qkv_b32, proj_w,
            ln_s.astype(jnp.float32).reshape(1, -1),
            ln_b.astype(jnp.float32).reshape(1, -1),
            bias, mask,
            num_heads=num_heads, window=window, scale=scale,
            fuse_ln=True, residual=True, interpret=interpret,
        )
        return (
            dx,
            dln_s.reshape(-1).astype(ln_s.dtype),
            dln_b.reshape(-1).astype(ln_b.dtype),
            dqkv_w.astype(qkv_w.dtype),
            dqkv_b.reshape(-1).astype(qkv_b.dtype)
            if qkv_b is not None
            else None,
            dproj_w.astype(proj_w.dtype),
            dproj_b.reshape(-1).astype(proj_b.dtype),
            dbias.astype(bias.dtype),
            None,  # mask: constant
        )
    n_windows = (d // wd) * (h // wh) * (w // ww)
    x_ln, ln_vjp = jax.vjp(_ln_xla, x, ln_s, ln_b)
    x_windows = window_partition(x_ln, window)
    do_windows = window_partition(do.astype(x.dtype), window)
    bn = x_windows.shape[0]
    wins = _pick_wins_bwd(bn, n_windows, num_heads, n)
    nw_blocks = n_windows // wins
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
                bias.astype(jnp.float32)[None], (nw_blocks, num_heads, n, n)
            ),
            mask_f.reshape(nw_blocks, wins, n, n),
        ],
        axis=1,
    )
    dxln_w, dqkv_w, dqkv_b, dproj_w, dproj_b, dbias = _bwd_call(
        x_windows, qkv_w, qkv_b32, proj_w, proj_b, tables,
        do_windows, num_heads, n_windows, scale, interpret,
    )
    dx_ln = window_reverse(dxln_w, window, b, d, h, w)
    dx, dln_s, dln_b = ln_vjp(dx_ln.astype(x_ln.dtype))
    dx = dx + do.astype(dx.dtype)  # residual branch
    return (
        dx,
        dln_s.astype(ln_s.dtype),
        dln_b.astype(ln_b.dtype),
        dqkv_w.astype(qkv_w.dtype),
        dqkv_b.reshape(-1).astype(qkv_b.dtype) if qkv_b is not None else None,
        dproj_w.astype(proj_w.dtype),
        dproj_b.reshape(-1).astype(proj_b.dtype),
        dbias.astype(bias.dtype),
        None,  # mask: constant
    )


folded_block_attention_trainable.defvjp(_blk_fwd, _blk_bwd)


def folded_full_block_applicable(
    grid_shape: Tri, window: Tri, num_heads: int, c: int, mlp_hidden: int
) -> bool:
    """True when the whole Swin block (LN1+attn+residual+LN2+MLP+residual)
    fits both the forward and backward folded kernels' VMEM budgets."""
    d, h, w = grid_shape
    wd, wh, ww = window
    if d % wd or h % wh or w % ww:
        return False
    n = wd * wh * ww
    r = wd * wh * w  # a full row of tokens (forward tail accumulates it)
    fwd_est = (
        _LIVE_TILES * num_heads * _pad_to(n, 8) * _pad_to(n, 128) * 4
        + _tail_extra_bytes(r, c, mlp_hidden)
    )
    return fwd_est <= _VMEM_BUDGET and folded_bwd_applicable(
        grid_shape, window, num_heads, c, mlp_hidden
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18))
def folded_full_block_trainable(
    x: jax.Array,  # (B, Dp, Hp, Wp, C) raw (rolled if shifted)
    ln_s: jax.Array,  # (C,) norm1
    ln_b: jax.Array,
    qkv_w: jax.Array,
    qkv_b: Optional[jax.Array],
    proj_w: jax.Array,
    proj_b: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array],
    ln2_s: jax.Array,  # (C,) norm2
    ln2_b: jax.Array,
    w1: jax.Array,  # (C, Ch) mlp fc1
    b1: jax.Array,
    w2: jax.Array,  # (Ch, C) mlp fc2
    b2: jax.Array,
    num_heads: int,
    window: Tri,
    scale: float,
    interpret: bool = False,
):
    """The ENTIRE Swin block in one kernel pass each way:
    ``y = y1 + mlp(LN2(y1))``, ``y1 = x + proj(attn(LN1(x)))`` —
    ``model/swin_transformer.py:174-277`` semantics.  The forward stores only
    y; the backward recomputes attention and the MLP tail per row-group in
    VMEM and chains MLP-vjp -> attention-vjp -> LN1-vjp without any
    intermediate HBM tensor.  Gate with ``folded_full_block_applicable``."""
    return fused_window_attention_folded(
        x, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
        num_heads=num_heads, window=window, scale=scale, interpret=interpret,
        ln_scale=ln_s, ln_bias=ln_b, residual=True,
        mlp=(ln2_s, ln2_b, w1, b1, w2, b2),
    )


def _full_fwd(x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
              ln2_s, ln2_b, w1, b1, w2, b2,
              num_heads, window, scale, interpret):
    out = folded_full_block_trainable(
        x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
        ln2_s, ln2_b, w1, b1, w2, b2, num_heads, window, scale, interpret,
    )
    return out, (x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
                 ln2_s, ln2_b, w1, b1, w2, b2)


def _full_bwd(num_heads, window, scale, interpret, res, do):
    (x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, bias, mask,
     ln2_s, ln2_b, w1, b1, w2, b2) = res
    c = x.shape[-1]
    qkv_b32 = (
        qkv_b.astype(jnp.float32)
        if qkv_b is not None
        else jnp.zeros((3 * c,), jnp.float32)
    ).reshape(1, -1)
    (
        dx, dqkv_w, dqkv_b, dproj_w, dproj_b, dbias, dln_s, dln_b,
        dln2_s, dln2_b, dw1, db1, dw2, db2,
    ) = _fold_bwd_call(
        x, do, qkv_w, qkv_b32, proj_w,
        ln_s.astype(jnp.float32).reshape(1, -1),
        ln_b.astype(jnp.float32).reshape(1, -1),
        bias, mask,
        num_heads=num_heads, window=window, scale=scale,
        fuse_ln=True, residual=True, interpret=interpret,
        tail=(proj_b, ln2_s, ln2_b, w1, b1, w2),
    )
    return (
        dx,
        dln_s.reshape(-1).astype(ln_s.dtype),
        dln_b.reshape(-1).astype(ln_b.dtype),
        dqkv_w.astype(qkv_w.dtype),
        dqkv_b.reshape(-1).astype(qkv_b.dtype) if qkv_b is not None else None,
        dproj_w.astype(proj_w.dtype),
        dproj_b.reshape(-1).astype(proj_b.dtype),
        dbias.astype(bias.dtype),
        None,  # mask: constant
        dln2_s.reshape(-1).astype(ln2_s.dtype),
        dln2_b.reshape(-1).astype(ln2_b.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(-1).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(-1).astype(b2.dtype),
    )


folded_full_block_trainable.defvjp(_full_fwd, _full_bwd)
