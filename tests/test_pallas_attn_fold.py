"""Folded Pallas window attention (partition/reverse in the BlockSpecs) vs
the XLA reference path (interpret mode on CPU; the compiled TPU path is
exercised by bench/verify — measured bit-identical to the partitioned fused
kernel on-chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vadcl_tpu.ops.pallas_attn_fold import (
    folded_attention_applicable,
    folded_window_attention_trainable,
    fused_window_attention_folded,
)
from vadcl_tpu.ops.window import (
    compute_attn_mask,
    relative_position_index,
    window_attention,
    window_partition,
    window_reverse,
)


def _bias_from_table(tbl, idx, N, nH):
    b = np.asarray(tbl)[np.asarray(idx[:N, :N]).reshape(-1)]
    return jnp.asarray(b.reshape(N, N, nH).transpose(2, 0, 1))


def _setup(ws, dims, C, nH, shifted, seed=0):
    D, H, W = dims
    N = ws[0] * ws[1] * ws[2]
    B = 2
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, D, H, W, C) * 0.5, jnp.float32)
    qkv_w = jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.float32)
    qkv_b = jnp.asarray(rng.randn(3 * C) * 0.05, jnp.float32)
    proj_w = jnp.asarray(rng.randn(C, C) * 0.05, jnp.float32)
    proj_b = jnp.asarray(rng.randn(C) * 0.05, jnp.float32)
    tlen = (2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1)
    tbl = jnp.asarray(rng.randn(tlen, nH) * 0.02, jnp.float32)
    idx = relative_position_index(ws)
    shift = tuple(w // 2 for w in ws)
    mask = compute_attn_mask(D, H, W, ws, shift) if shifted else None
    return x, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, N, mask


@pytest.mark.parametrize(
    "geom",
    [
        # (window, dims, C, nH) — multi-window rows exercise the in-kernel
        # group walk; the small geometry exercises gw == wins
        ((2, 7, 7), (2, 14, 28), 48, 4),
        ((1, 7, 7), (1, 14, 14), 24, 2),  # N=49, non-sublane-aligned
    ],
)
@pytest.mark.parametrize("shifted", [False, True])
def test_folded_matches_xla(geom, shifted):
    ws, dims, C, nH = geom
    D, H, W = dims
    x, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, N, mask = _setup(
        ws, dims, C, nH, shifted
    )
    B = x.shape[0]
    assert folded_attention_applicable(dims, ws, nH)

    xw = window_partition(x, ws)
    want = window_reverse(
        window_attention(xw, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, nH,
                         mask=mask),
        ws, B, D, H, W,
    )
    got = fused_window_attention_folded(
        x, qkv_w, qkv_b, proj_w, proj_b,
        _bias_from_table(tbl, idx, N, nH),
        jnp.asarray(mask) if mask is not None else None,
        num_heads=nH, window=ws, scale=(C // nH) ** -0.5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_folded_no_qkv_bias():
    ws, dims, C, nH = (2, 7, 7), (2, 14, 14), 24, 4
    x, qkv_w, _, proj_w, proj_b, tbl, idx, N, _ = _setup(ws, dims, C, nH, False)
    D, H, W = dims
    xw = window_partition(x, ws)
    want = window_reverse(
        window_attention(xw, qkv_w, None, proj_w, proj_b, tbl, idx, nH,
                         mask=None),
        ws, 2, D, H, W,
    )
    got = fused_window_attention_folded(
        x, qkv_w, None, proj_w, proj_b, _bias_from_table(tbl, idx, N, nH),
        None, num_heads=nH, window=ws, scale=(C // nH) ** -0.5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shifted", [False, True])
def test_folded_trainable_grads_match_xla(shifted):
    ws, dims, C, nH = (2, 7, 7), (2, 14, 28), 48, 4
    D, H, W = dims
    x, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, N, mask = _setup(
        ws, dims, C, nH, shifted, seed=3
    )
    B = x.shape[0]
    probe = jnp.asarray(np.random.RandomState(9).randn(B, D, H, W, C),
                        jnp.float32)
    maskj = jnp.asarray(mask) if mask is not None else None

    def loss_ref(x, qkv_w, qkv_b, proj_w, proj_b, tbl):
        xw = window_partition(x, ws)
        o = window_attention(xw, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, nH,
                             mask=mask)
        return jnp.sum(window_reverse(o, ws, B, D, H, W) * probe)

    idx_flat = np.asarray(idx[:N, :N]).reshape(-1)

    def loss_fold(x, qkv_w, qkv_b, proj_w, proj_b, tbl):
        bias = jnp.transpose(tbl[idx_flat].reshape(N, N, nH), (2, 0, 1))
        o = folded_window_attention_trainable(
            x, qkv_w, qkv_b, proj_w, proj_b, bias, maskj,
            nH, ws, (C // nH) ** -0.5, True,
        )
        return jnp.sum(o * probe)

    args = (x, qkv_w, qkv_b, proj_w, proj_b, tbl)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    gf = jax.grad(loss_fold, argnums=tuple(range(6)))(*args)
    for name, a, b in zip(
        ["dx", "dqkv_w", "dqkv_b", "dproj_w", "dproj_b", "dtable"], gr, gf
    ):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        d = float(jnp.max(jnp.abs(a - b)))
        assert d / scale < 5e-5, (name, d, scale)


@pytest.mark.parametrize("shifted", [False, True])
def test_folded_block_front_matches_xla(shifted):
    """x + attn(LN(x)) in one kernel pass == the XLA composition."""
    from vadcl_tpu.ops.pallas_attn_fold import folded_block_attention_trainable

    ws, dims, C, nH = (2, 7, 7), (2, 14, 28), 48, 4
    D, H, W = dims
    x, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, N, mask = _setup(
        ws, dims, C, nH, shifted, seed=5
    )
    B = x.shape[0]
    rng = np.random.RandomState(11)
    ln_s = jnp.asarray(1.0 + rng.randn(C) * 0.1, jnp.float32)
    ln_b = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)

    def ln(x):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        return (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b

    xw = window_partition(ln(x).astype(jnp.float32), ws)
    want = x + window_reverse(
        window_attention(xw, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, nH,
                         mask=mask),
        ws, B, D, H, W,
    )
    got = folded_block_attention_trainable(
        x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b,
        _bias_from_table(tbl, idx, N, nH),
        jnp.asarray(mask) if mask is not None else None,
        nH, ws, (C // nH) ** -0.5, True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_folded_block_front_grads_match_xla():
    from vadcl_tpu.ops.pallas_attn_fold import folded_block_attention_trainable

    ws, dims, C, nH = (2, 7, 7), (2, 14, 14), 24, 4
    D, H, W = dims
    x, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, N, mask = _setup(
        ws, dims, C, nH, True, seed=7
    )
    B = x.shape[0]
    rng = np.random.RandomState(13)
    ln_s = jnp.asarray(1.0 + rng.randn(C) * 0.1, jnp.float32)
    ln_b = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    probe = jnp.asarray(rng.randn(B, D, H, W, C), jnp.float32)
    maskj = jnp.asarray(mask) if mask is not None else None
    idx_flat = np.asarray(idx[:N, :N]).reshape(-1)

    def loss_ref(x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, tbl):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        y = (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b
        xw = window_partition(y, ws)
        o = window_attention(xw, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, nH,
                             mask=mask)
        return jnp.sum((x + window_reverse(o, ws, B, D, H, W)) * probe)

    def loss_fold(x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, tbl):
        bias = jnp.transpose(tbl[idx_flat].reshape(N, N, nH), (2, 0, 1))
        o = folded_block_attention_trainable(
            x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, bias, maskj,
            nH, ws, (C // nH) ** -0.5, True,
        )
        return jnp.sum(o * probe)

    args = (x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, tbl)
    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    gf = jax.grad(loss_fold, argnums=tuple(range(8)))(*args)
    names = ["dx", "dln_s", "dln_b", "dqkv_w", "dqkv_b", "dproj_w",
             "dproj_b", "dtable"]
    for name, a, b in zip(names, gr, gf):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        d = float(jnp.max(jnp.abs(a - b)))
        assert d / scale < 1e-4, (name, d, scale)


def _mlp_setup(C, seed):
    rng = np.random.RandomState(seed)
    Ch = 4 * C
    return (
        jnp.asarray(1.0 + rng.randn(C) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(C, Ch) * 0.05, jnp.float32),
        jnp.asarray(rng.randn(Ch) * 0.05, jnp.float32),
        jnp.asarray(rng.randn(Ch, C) * 0.05, jnp.float32),
        jnp.asarray(rng.randn(C) * 0.05, jnp.float32),
    )


def _ln_oracle(x, s, b):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0.0)
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * s + b


def _gelu_oracle(h):
    return h * 0.5 * (1.0 + jax.lax.erf(h * 0.7071067811865476))


@pytest.mark.parametrize("shifted", [False, True])
def test_folded_full_block_matches_xla(shifted):
    """The whole Swin block (LN1+attn+residual+LN2+MLP+residual) in one
    kernel pass == the XLA composition (fwd), multi-window rows."""
    from vadcl_tpu.ops.pallas_attn_fold import (
        folded_full_block_applicable, folded_full_block_trainable,
    )

    ws, dims, C, nH = (2, 7, 7), (2, 14, 28), 48, 4
    D, H, W = dims
    x, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, N, mask = _setup(
        ws, dims, C, nH, shifted, seed=17
    )
    B = x.shape[0]
    ln_s, ln_b, *_ = _mlp_setup(C, 19)
    ln2_s, ln2_b, w1, b1, w2, b2 = _mlp_setup(C, 23)
    assert folded_full_block_applicable(dims, ws, nH, C, 4 * C)
    maskj = jnp.asarray(mask) if mask is not None else None

    xw = window_partition(_ln_oracle(x, ln_s, ln_b), ws)
    y1 = x + window_reverse(
        window_attention(xw, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, nH,
                         mask=mask),
        ws, B, D, H, W,
    )
    z = _ln_oracle(y1, ln2_s, ln2_b)
    want = y1 + (_gelu_oracle(z @ w1 + b1) @ w2 + b2)

    got = folded_full_block_trainable(
        x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b,
        _bias_from_table(tbl, idx, N, nH), maskj,
        ln2_s, ln2_b, w1, b1, w2, b2,
        nH, ws, (C // nH) ** -0.5, True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_folded_full_block_grads_match_xla():
    """All 14 gradients of the whole-block kernel vs the XLA composition."""
    from vadcl_tpu.ops.pallas_attn_fold import folded_full_block_trainable

    ws, dims, C, nH = (2, 7, 7), (2, 14, 14), 24, 4
    D, H, W = dims
    x, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, N, mask = _setup(
        ws, dims, C, nH, True, seed=29
    )
    B = x.shape[0]
    ln_s, ln_b, *_ = _mlp_setup(C, 31)
    ln2_s, ln2_b, w1, b1, w2, b2 = _mlp_setup(C, 37)
    probe = jnp.asarray(np.random.RandomState(41).randn(B, D, H, W, C),
                        jnp.float32)
    maskj = jnp.asarray(mask)
    idx_flat = np.asarray(idx[:N, :N]).reshape(-1)

    def loss_ref(x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, tbl,
                 ln2_s, ln2_b, w1, b1, w2, b2):
        y = _ln_oracle(x, ln_s, ln_b)
        xw = window_partition(y, ws)
        o = window_attention(xw, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, nH,
                             mask=mask)
        y1 = x + window_reverse(o, ws, B, D, H, W)
        z = _ln_oracle(y1, ln2_s, ln2_b)
        out = y1 + (_gelu_oracle(z @ w1 + b1) @ w2 + b2)
        return jnp.sum(out * probe)

    def loss_fold(x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, tbl,
                  ln2_s, ln2_b, w1, b1, w2, b2):
        bias = jnp.transpose(tbl[idx_flat].reshape(N, N, nH), (2, 0, 1))
        o = folded_full_block_trainable(
            x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, bias, maskj,
            ln2_s, ln2_b, w1, b1, w2, b2,
            nH, ws, (C // nH) ** -0.5, True,
        )
        return jnp.sum(o * probe)

    args = (x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, tbl,
            ln2_s, ln2_b, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=tuple(range(14)))(*args)
    gf = jax.grad(loss_fold, argnums=tuple(range(14)))(*args)
    names = ["dx", "dln_s", "dln_b", "dqkv_w", "dqkv_b", "dproj_w",
             "dproj_b", "dtable", "dln2_s", "dln2_b", "dw1", "db1",
             "dw2", "db2"]
    for name, a, b in zip(names, gr, gf):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        d = float(jnp.max(jnp.abs(a - b)))
        assert d / scale < 1e-4, (name, d, scale)


def test_applicability_gate():
    # window-divisible dims qualify; ragged dims do not
    assert folded_attention_applicable((2, 56, 56), (2, 7, 7), 6)
    assert not folded_attention_applicable((2, 55, 56), (2, 7, 7), 6)
    assert not folded_attention_applicable((3, 56, 56), (2, 7, 7), 6)


def test_swin_block_fold_param_tree_and_fallback():
    """attn_kernel='fold' declares the identical param tree as 'base' (same
    checkpoints), and the block falls back to the windowed path when the
    folded kernel is not applicable."""
    from vadcl_tpu.models.swin import SwinBlock3D

    x = jnp.zeros((1, 2, 14, 14, 24), jnp.float32)
    trees = []
    # fused fold triggers the block-front path (LN folded into the kernel);
    # its param tree must stay checkpoint-compatible with the base path
    for kernel, fused in (
        ("base", False), ("fold", False), ("fold", True),
        ("fold_block", True),  # whole-block path must keep the same tree
    ):
        blk = SwinBlock3D(dim=24, num_heads=4, window_size=(2, 7, 7),
                          fused=fused, attn_kernel=kernel)
        v = jax.eval_shape(blk.init, jax.random.key(0), x)
        trees.append(jax.tree_util.tree_structure(v))
    assert all(t == trees[0] for t in trees[1:])


# ---------------------------------------------------------------------------
# fold_packed: fold layout + head-packed in-lane dots
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "geom",
    [
        # flagship-structure rows: head_dim=16 (C/nH = 96/6), N=98 — the
        # geometry the packing targets; grid (1, 1, 2), 4-window rows
        ((2, 7, 7), (2, 14, 28), 96, 6),
        # small odd case: N=49 non-sublane-aligned, single-window rows
        ((1, 7, 7), (1, 14, 14), 24, 2),
    ],
)
@pytest.mark.parametrize("shifted", [False, True])
def test_folded_packed_matches_xla(geom, shifted):
    from vadcl_tpu.ops.pallas_attn_fold import (
        folded_packed_applicable,
        fused_window_attention_folded_packed,
    )

    ws, dims, C, nH = geom
    D, H, W = dims
    x, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, N, mask = _setup(
        ws, dims, C, nH, shifted, seed=13
    )
    B = x.shape[0]
    assert folded_packed_applicable(dims, ws, nH)

    xw = window_partition(x, ws)
    want = window_reverse(
        window_attention(xw, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, nH,
                         mask=mask),
        ws, B, D, H, W,
    )
    got = fused_window_attention_folded_packed(
        x, qkv_w, qkv_b, proj_w, proj_b,
        _bias_from_table(tbl, idx, N, nH),
        jnp.asarray(mask) if mask is not None else None,
        num_heads=nH, window=ws, scale=(C // nH) ** -0.5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shifted", [False, True])
def test_folded_packed_block_front_matches_xla(shifted):
    """fold_packed with fused LN + residual == x + attn(LN(x)) in XLA."""
    from vadcl_tpu.ops.pallas_attn_fold import (
        fused_window_attention_folded_packed,
    )

    ws, dims, C, nH = (2, 7, 7), (2, 14, 28), 96, 6
    D, H, W = dims
    x, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, N, mask = _setup(
        ws, dims, C, nH, shifted, seed=17
    )
    B = x.shape[0]
    rng = np.random.RandomState(19)
    ln_s = jnp.asarray(1.0 + rng.randn(C) * 0.1, jnp.float32)
    ln_b = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)

    def ln(v):
        v32 = v.astype(jnp.float32)
        mu = jnp.mean(v32, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(v32 * v32, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        return (v32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b

    xw = window_partition(ln(x).astype(jnp.float32), ws)
    want = x + window_reverse(
        window_attention(xw, qkv_w, qkv_b, proj_w, proj_b, tbl, idx, nH,
                         mask=mask),
        ws, B, D, H, W,
    )
    got = fused_window_attention_folded_packed(
        x, qkv_w, qkv_b, proj_w, proj_b,
        _bias_from_table(tbl, idx, N, nH),
        jnp.asarray(mask) if mask is not None else None,
        num_heads=nH, window=ws, scale=(C // nH) ** -0.5, interpret=True,
        ln_scale=ln_s, ln_bias=ln_b, residual=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_folded_packed_no_qkv_bias():
    from vadcl_tpu.ops.pallas_attn_fold import (
        fused_window_attention_folded_packed,
    )

    ws, dims, C, nH = (2, 7, 7), (2, 14, 14), 24, 4
    x, qkv_w, _, proj_w, proj_b, tbl, idx, N, _ = _setup(
        ws, dims, C, nH, False, seed=23
    )
    D, H, W = dims
    xw = window_partition(x, ws)
    want = window_reverse(
        window_attention(xw, qkv_w, None, proj_w, proj_b, tbl, idx, nH,
                         mask=None),
        ws, 2, D, H, W,
    )
    got = fused_window_attention_folded_packed(
        x, qkv_w, None, proj_w, proj_b, _bias_from_table(tbl, idx, N, nH),
        None, num_heads=nH, window=ws, scale=(C // nH) ** -0.5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_folded_packed_applicability_gate():
    from vadcl_tpu.ops.pallas_attn_fold import folded_packed_applicable

    # flagship stage-0 (C=96, nH=6) and stage-1 (C=192, nH=12) shapes pass
    assert folded_packed_applicable((2, 56, 56), (2, 7, 7), 6)
    assert folded_packed_applicable((2, 28, 28), (2, 7, 7), 12)
    # non-divisible dims reject
    assert not folded_packed_applicable((2, 15, 28), (2, 7, 7), 6)


@pytest.mark.parametrize("num_heads,expect", [(2, "fold"), (4, "fold"),
                                              (12, "fold_packed")])
def test_fold_mix_resolution(num_heads, expect):
    """``fold_mix`` dispatches per stage geometry: fold at nH<12 (stage-0),
    fold_packed at nH>=12 (stage-1) — the measured per-geometry winners
    (docs/PERFORMANCE.md fold_packed A/B).  Every other name is identity."""
    from vadcl_tpu.models.swin import _resolve_attn_kernel

    assert _resolve_attn_kernel("fold_mix", num_heads) == expect
    for k in ("base", "packed", "fold", "fold_block", "fold_packed"):
        assert _resolve_attn_kernel(k, num_heads) == k


@pytest.mark.parametrize("num_heads", [2, 12])
def test_fold_mix_block_matches_fold(num_heads):
    """A SwinBlock3D under ``fold_mix`` is numerically interchangeable with
    the same block under the kernel it resolves to (params are shared; only
    the dispatch differs), at both resolution branches."""
    import flax.linen as nn

    from vadcl_tpu.models.swin import SwinBlock3D, _resolve_attn_kernel

    C = 16 * num_heads if num_heads == 2 else 8 * num_heads  # 32 / 96
    ws = (2, 7, 7)
    D, H, W = 2, 7, 14
    rng = np.random.RandomState(41)
    x = jnp.asarray(rng.randn(2, D, H, W, C) * 0.3, jnp.float32)

    def block(ak):
        return SwinBlock3D(
            dim=C, num_heads=num_heads, window_size=ws,
            shift_size=(0, 0, 0), fused=True, attn_kernel=ak,
        )

    ref_kernel = _resolve_attn_kernel("fold_mix", num_heads)
    m_mix, m_ref = block("fold_mix"), block(ref_kernel)
    v = m_ref.init(jax.random.key(0), x)
    got = m_mix.apply(v, x)
    want = m_ref.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6,
                               atol=1e-6)
