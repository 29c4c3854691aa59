"""Windowed, shifted 3D attention primitives.

Capability parity with the reference's Swin machinery
(``model/swin_transformer.py:38-84`` window partition/reverse/shrink,
``:87-171`` WindowAttention3D with relative-position bias, ``:320-333``
shift-mask) rebuilt TPU-first:

* window partition/reverse are pure reshape+transpose (free under XLA);
* the shift mask and relative-position index are **host-computed numpy
  constants** (shapes are static at trace time), so inside jit they are
  baked-in constants rather than the reference's lru_cache'd device tensors;
* attention itself runs all windows x heads as one batched matmul pair so the
  MXU sees large contractions; softmax is computed in fp32.

A fused Pallas kernel (roll+partition+attn+reverse in VMEM) lives in
``vadcl_tpu.ops.pallas_attn`` and is selected by ``window_attention`` when the
shapes qualify.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Tri = Tuple[int, int, int]


def pallas_interpret() -> bool:
    """Pallas TPU kernels lower only on TPU; on the CPU backend (unit tests,
    the 8-virtual-device multichip dryrun) the model dispatches them in
    interpret mode instead, so ``fused_attention`` configs stay portable."""
    return jax.default_backend() == "cpu"


def window_partition(x: jax.Array, window_size: Tri) -> jax.Array:
    """(B, D, H, W, C) -> (B * nW, wd*wh*ww, C).  Parity:
    ``model/swin_transformer.py:38-51`` (same window enumeration order)."""
    B, D, H, W, C = x.shape
    wd, wh, ww = window_size
    x = x.reshape(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, C)


def window_reverse(
    windows: jax.Array, window_size: Tri, B: int, D: int, H: int, W: int
) -> jax.Array:
    """Inverse of window_partition (``model/swin_transformer.py:54-68``)."""
    wd, wh, ww = window_size
    C = windows.shape[-1]
    x = windows.reshape(B, D // wd, H // wh, W // ww, wd, wh, ww, C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, C)


def get_window_size(
    x_size: Sequence[int],
    window_size: Sequence[int],
    shift_size: Optional[Sequence[int]] = None,
):
    """Auto-shrink windows to the input and zero the shift on collapsed axes
    (``model/swin_transformer.py:71-84``).  Static python — resolved at trace
    time, which is exactly what XLA's static-shape model needs (SURVEY §7.3.1)."""
    use_window = list(window_size)
    use_shift = list(shift_size) if shift_size is not None else None
    for i, s in enumerate(x_size):
        if s <= window_size[i]:
            use_window[i] = s
            if use_shift is not None:
                use_shift[i] = 0
    if use_shift is None:
        return tuple(use_window)
    return tuple(use_window), tuple(use_shift)


@lru_cache(maxsize=None)
def relative_position_index(window_size: Tri) -> np.ndarray:
    """(N, N) int32 index into the (2wd-1)(2wh-1)(2ww-1) bias table.

    Same construction as ``model/swin_transformer.py:115-128``; computed once
    per window size on host.  When the runtime window is smaller than the
    configured one, callers slice ``[:N, :N]`` exactly as the reference's
    forward does (``model/swin_transformer.py:152-153``).
    """
    wd, wh, ww = window_size
    coords = np.stack(
        np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij")
    )  # 3, wd, wh, ww
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 3, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@lru_cache(maxsize=None)
def compute_attn_mask(
    Dp: int, Hp: int, Wp: int, window_size: Tri, shift_size: Tri
) -> Optional[np.ndarray]:
    """Shifted-window attention mask, (nW, N, N) float32 of {0, -100}.

    Reproduces the 3x3x3 slice-region construction of ``compute_mask``
    (``model/swin_transformer.py:320-333``) in host numpy; returns None when no
    axis is shifted (mask would be all zeros).
    """
    if not any(s > 0 for s in shift_size):
        return None
    img_mask = np.zeros((1, Dp, Hp, Wp, 1), dtype=np.float32)
    cnt = 0
    for d in (
        slice(-window_size[0]),
        slice(-window_size[0], -shift_size[0] if shift_size[0] else None),
        slice(-shift_size[0], None) if shift_size[0] else slice(0, 0),
    ):
        for h in (
            slice(-window_size[1]),
            slice(-window_size[1], -shift_size[1] if shift_size[1] else None),
            slice(-shift_size[1], None) if shift_size[1] else slice(0, 0),
        ):
            for w in (
                slice(-window_size[2]),
                slice(-window_size[2], -shift_size[2] if shift_size[2] else None),
                slice(-shift_size[2], None) if shift_size[2] else slice(0, 0),
            ):
                img_mask[:, d, h, w, :] = cnt
                cnt += 1
    wd, wh, ww = window_size
    m = img_mask.reshape(
        1, Dp // wd, wd, Hp // wh, wh, Wp // ww, ww, 1
    ).transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wd * wh * ww)
    attn_mask = m[:, None, :] - m[:, :, None]
    # NOTE: orientation matters only through symmetry of the region partition —
    # the reference uses unsqueeze(1) - unsqueeze(2); regions are symmetric so
    # (mask != 0) is identical either way.
    out = np.where(attn_mask != 0, np.float32(-100.0), np.float32(0.0))
    return out


def window_attention(
    x_windows: jax.Array,  # (Bn, N, C)
    qkv_w: jax.Array,  # (C, 3C)
    qkv_b: Optional[jax.Array],  # (3C,)
    proj_w: jax.Array,  # (C, C)
    proj_b: Optional[jax.Array],  # (C,)
    bias_table: jax.Array,  # ((2wd-1)(2wh-1)(2ww-1), nH)
    rel_index: np.ndarray,  # (N, N) — static host constant
    num_heads: int,
    mask: Optional[np.ndarray] = None,  # (nW, N, N) static host constant
    scale: Optional[float] = None,
) -> jax.Array:
    """Multi-head window attention with relative position bias and optional
    shift mask.  Math parity: ``model/swin_transformer.py:139-171``.

    All windows and heads run as two batched matmuls (scores and output), bf16
    on the MXU with fp32 softmax.
    """
    Bn, N, C = x_windows.shape
    head_dim = C // num_heads
    scale = scale if scale is not None else head_dim**-0.5

    qkv = x_windows @ qkv_w.astype(x_windows.dtype)
    if qkv_b is not None:
        qkv = qkv + qkv_b.astype(qkv.dtype)
    qkv = qkv.reshape(Bn, N, 3, num_heads, head_dim)
    # model-axis (tensor) parallelism: heads shard over the mesh's model
    # axis when one is active (parallel/tp.py) — no-op otherwise
    from vadcl_tpu.parallel.tp import shard_dim

    q = shard_dim(
        qkv[:, :, 0].transpose(0, 2, 1, 3), 1
    ) * jnp.asarray(scale, qkv.dtype)
    k = shard_dim(qkv[:, :, 1].transpose(0, 2, 1, 3), 1)
    v = shard_dim(qkv[:, :, 2].transpose(0, 2, 1, 3), 1)  # (Bn, nH, N, hd)

    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    )  # (Bn, nH, N, N) fp32
    attn = shard_dim(attn, 1)

    bias = bias_table[np.asarray(rel_index[:N, :N]).reshape(-1)]
    bias = bias.reshape(N, N, -1).transpose(2, 0, 1)  # (nH, N, N)
    attn = attn + bias[None].astype(attn.dtype)

    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(Bn // nW, nW, num_heads, N, N)
        attn = attn + jnp.asarray(mask, attn.dtype)[None, :, None]
        attn = attn.reshape(Bn, num_heads, N, N)

    attn = jax.nn.softmax(attn, axis=-1).astype(x_windows.dtype)
    out = shard_dim(
        jnp.einsum(
            "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32
        ).astype(x_windows.dtype),
        1,
    )
    out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
    out = out @ proj_w.astype(out.dtype)
    if proj_b is not None:
        out = out + proj_b.astype(out.dtype)
    return out
