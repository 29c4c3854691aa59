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
