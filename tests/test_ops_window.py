"""Window attention primitive parity: partition/reverse roundtrip, shift mask
vs the reference's slice-loop construction, and attention vs a naive torch
einsum implementation of model/swin_transformer.py:139-171."""

import numpy as np
import pytest
import torch

from vadcl_tpu.ops import (
    compute_attn_mask,
    get_window_size,
    relative_position_index,
    window_attention,
    window_partition,
    window_reverse,
)


def test_partition_reverse_roundtrip():
    x = np.random.RandomState(0).randn(2, 4, 14, 14, 8).astype(np.float32)
    ws = (2, 7, 7)
    wins = window_partition(x, ws)
    assert wins.shape == (2 * 2 * 2 * 2, 2 * 7 * 7, 8)
    back = window_reverse(wins, ws, 2, 4, 14, 14)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_partition_order_matches_torch_view_permute():
    """Window enumeration order must match the reference exactly (it determines
    which mask row applies to which window)."""
    x = np.arange(1 * 2 * 4 * 4 * 1, dtype=np.float32).reshape(1, 2, 4, 4, 1)
    ws = (2, 2, 2)
    got = np.asarray(window_partition(x, ws))
    tx = torch.tensor(x)
    B, D, H, W, C = tx.shape
    tv = tx.view(B, D // 2, 2, H // 2, 2, W // 2, 2, C)
    want = tv.permute(0, 1, 3, 5, 2, 4, 6, 7).contiguous().view(-1, 8, C).numpy()
    np.testing.assert_array_equal(got, want)


def test_get_window_size_shrinks_and_zeroes_shift():
    ws, ss = get_window_size((2, 56, 56), (8, 7, 7), (4, 3, 3))
    assert ws == (2, 7, 7) and ss == (0, 3, 3)
    ws2 = get_window_size((16, 7, 7), (8, 7, 7))
    assert ws2 == (8, 7, 7)


def _torch_reference_mask(D, H, W, window_size, shift_size):
    """Verbatim logic of compute_mask (model/swin_transformer.py:320-333)."""
    img_mask = torch.zeros((1, D, H, W, 1))
    cnt = 0
    for d in (
        slice(-window_size[0]),
        slice(-window_size[0], -shift_size[0] if shift_size[0] else None),
        slice(-shift_size[0], None),
    ):
        for h in (
            slice(-window_size[1]),
            slice(-window_size[1], -shift_size[1] if shift_size[1] else None),
            slice(-shift_size[1], None),
        ):
            for w in (
                slice(-window_size[2]),
                slice(-window_size[2], -shift_size[2] if shift_size[2] else None),
                slice(-shift_size[2], None),
            ):
                img_mask[:, d, h, w, :] = cnt
                cnt += 1
    wd, wh, ww = window_size
    m = (
        img_mask.view(1, D // wd, wd, H // wh, wh, W // ww, ww, 1)
        .permute(0, 1, 3, 5, 2, 4, 6, 7)
        .contiguous()
        .view(-1, wd * wh * ww)
    )
    attn_mask = m.unsqueeze(1) - m.unsqueeze(2)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0).masked_fill(
        attn_mask == 0, 0.0
    )
    return attn_mask.numpy()


@pytest.mark.parametrize(
    "dims,ws,ss",
    [
        ((2, 56, 56), (2, 7, 7), (0, 3, 3)),  # flagship encoder stage geometry
        ((2, 28, 28), (2, 7, 7), (0, 3, 3)),
        ((8, 14, 14), (4, 7, 7), (2, 3, 3)),
    ],
)
def test_shift_mask_matches_reference(dims, ws, ss):
    got = compute_attn_mask(*dims, ws, ss)
    want = _torch_reference_mask(*dims, ws, ss)
    np.testing.assert_array_equal(got, want)


def test_no_shift_mask_is_none():
    assert compute_attn_mask(2, 56, 56, (2, 7, 7), (0, 0, 0)) is None


def _torch_window_attention(x, qkv_w, qkv_b, proj_w, proj_b, table, index,
                            num_heads, mask):
    """Naive torch re-derivation of WindowAttention3D.forward (:139-171)."""
    x = torch.tensor(x)
    B_, N, C = x.shape
    qkv = x @ torch.tensor(qkv_w) + torch.tensor(qkv_b)
    qkv = qkv.reshape(B_, N, 3, num_heads, C // num_heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (C // num_heads) ** -0.5
    attn = q @ k.transpose(-2, -1)
    bias = torch.tensor(table)[torch.tensor(index[:N, :N].reshape(-1)).long()]
    bias = bias.reshape(N, N, -1).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.view(B_ // nW, nW, num_heads, N, N) + torch.tensor(
            mask
        ).unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, num_heads, N, N)
    attn = torch.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
    out = out @ torch.tensor(proj_w) + torch.tensor(proj_b)
    return out.numpy()


@pytest.mark.parametrize("shifted", [False, True])
def test_window_attention_matches_naive_torch(shifted):
    rng = np.random.RandomState(1)
    ws = (2, 7, 7)
    N = 2 * 7 * 7
    C, nH = 24, 4
    D, H, W = 2, 14, 14
    nW = (D // ws[0]) * (H // ws[1]) * (W // ws[2])
    B = 2
    x = rng.randn(B * nW, N, C).astype(np.float32)
    qkv_w = (rng.randn(C, 3 * C) * 0.05).astype(np.float32)
    qkv_b = (rng.randn(3 * C) * 0.05).astype(np.float32)
    proj_w = (rng.randn(C, C) * 0.05).astype(np.float32)
    proj_b = (rng.randn(C) * 0.05).astype(np.float32)
    table_len = (2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1)
    table = (rng.randn(table_len, nH) * 0.02).astype(np.float32)
    index = relative_position_index(ws)
    mask = compute_attn_mask(D, H, W, ws, (0, 3, 3)) if shifted else None

    got = np.asarray(
        window_attention(
            x, qkv_w, qkv_b, proj_w, proj_b, table, index, nH, mask=mask
        )
    )
    want = _torch_window_attention(
        x, qkv_w, qkv_b, proj_w, proj_b, table, index, nH, mask
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_relative_position_index_matches_torch_construction():
    ws = (3, 5, 5)
    got = relative_position_index(ws)
    coords = torch.stack(
        torch.meshgrid(
            torch.arange(ws[0]), torch.arange(ws[1]), torch.arange(ws[2]),
            indexing="ij",
        )
    )
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 2] += ws[2] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= 2 * ws[2] - 1
    want = rel.sum(-1).numpy()
    np.testing.assert_array_equal(got, want)
