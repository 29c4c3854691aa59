"""Conv primitive parity vs torch (gold): conv3d, conv_transpose3d, same-pool.

torch here is the oracle for the math the reference delegates to cuDNN —
not a runtime dependency of the framework.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from vadcl_tpu.ops import conv3d, conv_transpose3d, max_pool3d_same

RTOL, ATOL = 2e-4, 2e-4


def _rand(*shape):
    return np.random.RandomState(0).randn(*shape).astype(np.float32)


@pytest.mark.parametrize(
    "stride,padding,kernel",
    [
        ((1, 1, 1), (0, 0, 0), (1, 1, 1)),
        ((1, 1, 1), (1, 1, 1), (3, 3, 3)),
        ((2, 4, 4), (0, 0, 0), (2, 4, 4)),  # patchify conv
        ((1, 2, 2), (0, 0, 0), (1, 2, 2)),  # stage downsample
        ((1, 1, 1), (1, 0, 0), (3, 2, 2)),
    ],
)
def test_conv3d_matches_torch(stride, padding, kernel):
    cin, cout = 5, 7
    x = _rand(2, 4, 12, 12, cin)
    w = _rand(*kernel, cin, cout)
    b = _rand(cout)
    got = np.asarray(conv3d(x, w, b, stride=stride, padding=padding))
    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)
    tw = torch.tensor(w).permute(4, 3, 0, 1, 2)  # DHWIO -> OIDHW
    want = tF.conv3d(tx, tw, torch.tensor(b), stride=stride, padding=padding)
    want = want.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize(
    "stride,padding,kernel",
    [
        ((2, 1, 1), (0, 0, 0), (2, 1, 1)),  # timedebd recon
        ((1, 2, 2), (0, 0, 0), (1, 2, 2)),  # up_sampling
        ((1, 2, 2), (1, 0, 0), (3, 2, 2)),  # patchdebed stages
        ((2, 1, 2), (0, 1, 0), (2, 3, 2)),  # mixed stride/kernel dims
        ((2, 2, 2), (1, 0, 0), (3, 2, 2)),  # overlapping taps on every dim
    ],
)
def test_conv_transpose3d_matches_torch(stride, padding, kernel):
    cin, cout = 6, 4
    x = _rand(2, 2, 8, 8, cin)
    w = _rand(*kernel, cin, cout)
    b = _rand(cout)
    got = np.asarray(conv_transpose3d(x, w, b, stride=stride, padding=padding))
    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)
    tw = torch.tensor(w).permute(3, 4, 0, 1, 2)  # DHW,I,O -> I,O,DHW
    want = tF.conv_transpose3d(
        tx, tw, torch.tensor(b), stride=stride, padding=padding
    )
    want = want.permute(0, 2, 3, 4, 1).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_max_pool3d_same_matches_reference_semantics():
    """The reference zero-pads then max-pools (model/I3D.py:8-42)."""
    x = _rand(2, 4, 9, 9, 3)  # odd spatial to exercise asymmetric padding
    got = np.asarray(max_pool3d_same(x, kernel=3, stride=1))

    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)
    k, s = (3, 3, 3), (1, 1, 1)

    def compute_pad(dim, size):
        if size % s[dim] == 0:
            return max(k[dim] - s[dim], 0)
        return max(k[dim] - (size % s[dim]), 0)

    _, _, t, h, w = tx.shape
    pt, ph, pw = compute_pad(0, t), compute_pad(1, h), compute_pad(2, w)
    pad = (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2, pt // 2, pt - pt // 2)
    tx = tF.pad(tx, pad)  # zero padding, deliberately
    want = tF.max_pool3d(tx, k, s).permute(0, 2, 3, 4, 1).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_patchify_matmul_equals_conv3d():
    from vadcl_tpu.ops.convs import patchify_matmul

    x = _rand(2, 4, 16, 16, 3)
    w = _rand(2, 4, 4, 3, 8)
    b = _rand(8)
    got = np.asarray(patchify_matmul(x, w, b))
    want = np.asarray(conv3d(x, w, b, stride=(2, 4, 4)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_unpatchify_matmul_equals_conv_transpose3d():
    from vadcl_tpu.ops.convs import unpatchify_matmul

    x = _rand(2, 2, 8, 8, 6)
    w = _rand(2, 2, 2, 6, 4)
    b = _rand(4)
    got = np.asarray(unpatchify_matmul(x, w, b))
    want = np.asarray(conv_transpose3d(x, w, b, stride=(2, 2, 2)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "shape,kernel,stride,padding",
    [
        ((2, 1, 8, 8, 6), (3, 2, 2), (1, 2, 2), (1, 0, 0)),  # PatchDebed D=1
        ((2, 4, 8, 8, 6), (3, 2, 2), (1, 2, 2), (1, 0, 0)),  # recon mode D=4
        ((2, 2, 7, 5, 4), (1, 2, 2), (1, 2, 2), (0, 0, 0)),  # UpSampling
        ((1, 3, 6, 6, 5), (2, 3, 3), (1, 3, 3), (0, 0, 0)),  # generic k_d=2
    ],
)
def test_conv_transpose3d_subpixel_equals_dilated(shape, kernel, stride, padding):
    """The pixel-shuffle decomposition is bit-level-equal math (fp32 noise
    only) to the generic lhs-dilated lowering, forward and backward."""
    import jax
    import jax.numpy as jnp

    from vadcl_tpu.ops.convs import (
        conv_transpose3d_subpixel,
        subpixel_applicable,
    )

    assert subpixel_applicable(kernel, stride, padding)
    x = _rand(*shape)
    w = _rand(*kernel, shape[-1], 7)
    b = _rand(7)
    got = np.asarray(
        conv_transpose3d_subpixel(x, w, b, stride=stride, padding=padding)
    )
    want = np.asarray(
        conv_transpose3d(x, w, b, stride=stride, padding=padding)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def loss(fn, w_):
        return jnp.sum(fn(x, w_, None, stride, padding) ** 2)

    g_sub = np.asarray(
        jax.grad(lambda w_: loss(conv_transpose3d_subpixel, w_))(jnp.asarray(w))
    )
    g_dil = np.asarray(
        jax.grad(lambda w_: loss(conv_transpose3d, w_))(jnp.asarray(w))
    )
    np.testing.assert_allclose(g_sub, g_dil, rtol=2e-3, atol=2e-3)


def test_subpixel_applicable_gate():
    from vadcl_tpu.ops.convs import subpixel_applicable

    assert not subpixel_applicable((2, 1, 1), (2, 1, 1), (0, 0, 0))  # s_d=2
    assert not subpixel_applicable((3, 3, 2), (1, 2, 2), (1, 0, 0))  # k_h!=s_h
    assert not subpixel_applicable((3, 2, 2), (1, 2, 2), (1, 1, 0))  # pad_h
