"""Fused Pallas window-attention kernel vs the XLA reference path
(interpret mode on CPU; the compiled TPU path is exercised by bench/verify)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vadcl_tpu.ops.pallas_attn import (
    fused_window_attention,
    fused_window_attention_packed,
)
from vadcl_tpu.ops.window import (
    compute_attn_mask,
    relative_position_index,
    window_attention,
)


def _bias_from_table(tbl, idx, N, nH):
    b = np.asarray(tbl)[np.asarray(idx[:N, :N]).reshape(-1)]
    return jnp.asarray(b.reshape(N, N, nH).transpose(2, 0, 1))


@pytest.mark.parametrize(
    "geom",
    [
        # (window, dims, C, nH)  — encoder stage0/1 and decoder geometries
        ((2, 7, 7), (2, 28, 28), 48, 4),
        ((1, 7, 7), (1, 14, 14), 24, 2),  # N=49, non-sublane-aligned
    ],
)
@pytest.mark.parametrize("shifted", [False, True])
@pytest.mark.parametrize("impl", [fused_window_attention, fused_window_attention_packed],
                         ids=["baseline", "packed"])
def test_fused_matches_xla(geom, shifted, impl):
    ws, dims, C, nH = geom
    D, H, W = dims
    N = ws[0] * ws[1] * ws[2]
    nW = (D // ws[0]) * (H // ws[1]) * (W // ws[2])
    B = 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B * nW, N, C), jnp.float32)
    qkv_w = jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.float32)
    qkv_b = jnp.asarray(rng.randn(3 * C) * 0.05, jnp.float32)
    proj_w = jnp.asarray(rng.randn(C, C) * 0.05, jnp.float32)
    proj_b = jnp.asarray(rng.randn(C) * 0.05, jnp.float32)
    tlen = (2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1)
    tbl = jnp.asarray(rng.randn(tlen, nH) * 0.02, jnp.float32)
    idx = relative_position_index(ws)
    shift = tuple(w // 2 for w in ws)
    mask = compute_attn_mask(D, H, W, ws, shift) if shifted else None

    want = np.asarray(
        window_attention(x, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, nH, mask=mask)
    )
    got = np.asarray(
        impl(
            x,
            qkv_w,
            qkv_b,
            proj_w,
            proj_b,
            _bias_from_table(tbl, idx, N, nH),
            jnp.asarray(mask) if mask is not None else None,
            num_heads=nH,
            n_windows=nW,
            scale=(C // nH) ** -0.5,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_no_qkv_bias():
    ws, (D, H, W), C, nH = (2, 7, 7), (2, 14, 14), 24, 4
    N, nW = 98, 4
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2 * nW, N, C), jnp.float32)
    qkv_w = jnp.asarray(rng.randn(C, 3 * C) * 0.05)
    proj_w = jnp.asarray(rng.randn(C, C) * 0.05)
    proj_b = jnp.asarray(rng.randn(C) * 0.05)
    tbl = jnp.asarray(rng.randn(3 * 13 * 13, nH) * 0.02)
    idx = relative_position_index(ws)
    want = np.asarray(
        window_attention(x, qkv_w, None, proj_w, proj_b, tbl, idx, nH, mask=None)
    )
    got = np.asarray(
        fused_window_attention(
            x, qkv_w, None, proj_w, proj_b,
            _bias_from_table(tbl, idx, N, nH), None,
            num_heads=nH, n_windows=nW, scale=(C // nH) ** -0.5, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
