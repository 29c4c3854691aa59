"""Custom-VJP fused attention: gradients vs plain-JAX autodiff (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from vadcl_tpu.ops.pallas_attn_bwd import fused_window_attention_trainable
from vadcl_tpu.ops.window import compute_attn_mask, relative_position_index


def test_fused_gradients_match_autodiff():
    rng = np.random.RandomState(0)
    ws = (2, 7, 7)
    N, C, nH, nW, B = 98, 24, 4, 4, 2
    D, H, W = 2, 14, 14
    x = jnp.asarray(rng.randn(B * nW, N, C), jnp.float32)
    qkv_w = jnp.asarray(rng.randn(C, 3 * C) * 0.1)
    qkv_b = jnp.asarray(rng.randn(3 * C) * 0.1)
    proj_w = jnp.asarray(rng.randn(C, C) * 0.1)
    proj_b = jnp.asarray(rng.randn(C) * 0.1)
    tbl = jnp.asarray(rng.randn(3 * 13 * 13, nH) * 0.02)
    idx = relative_position_index(ws)
    mask = jnp.asarray(compute_attn_mask(D, H, W, ws, (0, 3, 3)))
    bias = jnp.asarray(
        np.asarray(tbl)[np.asarray(idx[:N, :N]).reshape(-1)]
        .reshape(N, N, nH)
        .transpose(2, 0, 1)
    )
    cot = jnp.asarray(rng.randn(B * nW, N, C), jnp.float32)

    def attn_xla(x_, qw, qb, pw, pb, b_):
        Bn, n, c = x_.shape
        hd = c // nH
        qkv = (x_ @ qw + qb).reshape(Bn, n, 3, nH, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3) * (hd**-0.5)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k) + b_[None]
        s = s.reshape(Bn // nW, nW, nH, n, n) + mask[None, :, None]
        s = s.reshape(Bn, nH, n, n)
        p = jax.nn.softmax(s, -1)
        o = (
            jnp.einsum("bhnm,bhmd->bhnd", p, v)
            .transpose(0, 2, 1, 3)
            .reshape(Bn, n, c)
        )
        return o @ pw + pb

    args = (x, qkv_w, qkv_b, proj_w, proj_b, bias)
    g_ref = jax.grad(lambda a: jnp.sum(attn_xla(*a) * cot))(args)
    g_pal = jax.grad(
        lambda a: jnp.sum(
            fused_window_attention_trainable(
                a[0], a[1], a[2], a[3], a[4], a[5], mask, nH, nW,
                (C // nH) ** -0.5, True,
            )
            * cot
        )
    )(args)
    for name, a, b in zip(
        ["dx", "dqkv_w", "dqkv_b", "dproj_w", "dproj_b", "dbias"], g_ref, g_pal
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_fused_gradients_no_mask_no_qkv_bias():
    rng = np.random.RandomState(1)
    N, C, nH, nW, B = 49, 24, 2, 4, 2
    x = jnp.asarray(rng.randn(B * nW, N, C), jnp.float32)
    qkv_w = jnp.asarray(rng.randn(C, 3 * C) * 0.1)
    proj_w = jnp.asarray(rng.randn(C, C) * 0.1)
    proj_b = jnp.asarray(rng.randn(C) * 0.1)
    bias = jnp.asarray(rng.randn(nH, N, N) * 0.02)
    cot = jnp.asarray(rng.randn(B * nW, N, C), jnp.float32)

    def attn_xla(x_, qw, pw, pb, b_):
        Bn, n, c = x_.shape
        hd = c // nH
        qkv = (x_ @ qw).reshape(Bn, n, 3, nH, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3) * (hd**-0.5)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k) + b_[None]
        p = jax.nn.softmax(s, -1)
        o = (
            jnp.einsum("bhnm,bhmd->bhnd", p, v)
            .transpose(0, 2, 1, 3)
            .reshape(Bn, n, c)
        )
        return o @ pw + pb

    args = (x, qkv_w, proj_w, proj_b, bias)
    g_ref = jax.grad(lambda a: jnp.sum(attn_xla(*a) * cot))(args)
    g_pal = jax.grad(
        lambda a: jnp.sum(
            fused_window_attention_trainable(
                a[0], a[1], None, a[2], a[3], a[4], None, nH, nW,
                (C // nH) ** -0.5, True,
            )
            * cot
        )
    )(args)
    for name, a, b in zip(["dx", "dqkv_w", "dproj_w", "dproj_b", "dbias"], g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )
