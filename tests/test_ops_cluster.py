"""Cluster assignment parity vs torch.cdist and the reference soft-assign
formulas (model/cluster.py)."""

import numpy as np
import torch

from vadcl_tpu.ops import (
    cdist,
    feature_cluster_assign,
    neg_soft_assign,
    pos_soft_assign,
    space_cluster_assign,
)
from vadcl_tpu.ops.cluster import frobenius_norm


def test_cdist_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 50, 16).astype(np.float32)
    c = rng.randn(1, 24, 16).astype(np.float32)
    got = np.asarray(cdist(x, c))
    want = torch.cdist(torch.tensor(x), torch.tensor(c)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cdist_batched_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(6, 10, 49).astype(np.float32)  # (C, BD, HW)
    c = rng.randn(6, 8, 49).astype(np.float32)  # (C, K, HW)
    got = np.asarray(cdist(x, c))
    want = torch.cdist(torch.tensor(x), torch.tensor(c)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_neg_soft_assign_matches_reference_formula():
    rng = np.random.RandomState(2)
    d = rng.rand(3, 5, 7).astype(np.float32) * 4
    alpha = 16.0
    got = np.asarray(neg_soft_assign(d, alpha))
    td = torch.tensor(d)
    x_min, _ = torch.min(td, -1, keepdim=True)
    e = torch.exp(-alpha * (td - x_min))
    want = (e / e.sum(-1, keepdim=True)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_pos_soft_assign_matches_reference_formula():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 9).astype(np.float32)
    alpha = 8.0
    got = np.asarray(pos_soft_assign(x, alpha))
    tx = torch.tensor(x)
    x_max, _ = torch.max(tx, -1, keepdim=True)
    e = torch.exp(alpha * (tx - x_max))
    want = (e / e.sum(-1, keepdim=True)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_feature_cluster_assign_labels_and_recon():
    rng = np.random.RandomState(4)
    B, D, H, W, C, K = 2, 2, 4, 4, 16, 12
    x = rng.randn(B, D, H, W, C).astype(np.float32)
    centers = rng.rand(K, C).astype(np.float32)
    out = feature_cluster_assign(x, centers, alpha=16.0)
    assert out.distance.shape == (B, D, H, W, K)
    assert out.assign.shape == (B, D, H, W, K)
    assert out.labels.shape == (B * D * H * W,)
    assert out.recon.shape == (B, D, H, W, C)
    # labels = argmin over torch.cdist distances
    td = torch.cdist(
        torch.tensor(x.reshape(B, -1, C)), torch.tensor(centers).unsqueeze(0)
    )
    want_labels = torch.argmin(td, dim=2).reshape(-1).numpy()
    np.testing.assert_array_equal(np.asarray(out.labels), want_labels)
    # recon = assign @ centers
    want_recon = np.einsum(
        "bnk,kc->bnc", np.asarray(out.assign).reshape(B, -1, K), centers
    ).reshape(B, D, H, W, C)
    np.testing.assert_allclose(np.asarray(out.recon), want_recon, rtol=1e-4, atol=1e-5)


def test_space_cluster_assign_layout():
    """Space head rearrange parity: B D H W C -> C (B D) (H W), dist back to
    B D C K (model/cluster.py:132-135)."""
    rng = np.random.RandomState(5)
    B, D, H, W, C, K = 2, 3, 4, 4, 6, 5
    x = rng.randn(B, D, H, W, C).astype(np.float32)
    centers = rng.rand(C, K, H * W).astype(np.float32)
    out = space_cluster_assign(x, centers, alpha=32.0)
    assert out.distance.shape == (B, D, C, K)
    # independent check for one (b, d, c) triple
    b, d, c = 1, 2, 3
    vec = x[b, d, :, :, c].reshape(-1)
    want = np.sqrt(
        np.maximum(((vec[None, :] - centers[c]) ** 2).sum(-1), 0)
    )
    np.testing.assert_allclose(
        np.asarray(out.distance)[b, d, c], want, rtol=1e-4, atol=1e-4
    )


def test_frobenius_norm_matches_torch_norm():
    rng = np.random.RandomState(6)
    x = rng.randn(3, 4, 5).astype(np.float32)
    got = float(frobenius_norm(x))
    want = float(torch.norm(torch.tensor(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
