"""Memory addressing parity vs a direct torch re-derivation of the reference
equations (model/Memory.py:133-261), including the per-slot update loop that we
replace with a segment-sum."""

import numpy as np
import torch
import torch.nn.functional as tF

from vadcl_tpu.ops import memory_read, memory_update, memory_losses
from vadcl_tpu.ops.memory import memory_loss_regularizer


def _setup(seed=0, B=2, H=4, W=4, d=8, M=6):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, d, H, W).astype(np.float32)
    keys = rng.randn(M, d).astype(np.float32)
    keys /= np.linalg.norm(keys, axis=1, keepdims=True)
    tq = tF.normalize(torch.tensor(q), dim=1).permute(0, 2, 3, 1)  # B H W d
    return np.asarray(tq.numpy()), keys


def _torch_scores(keys, query_flat):
    score = query_flat @ torch.t(keys)
    return tF.softmax(score, dim=0), tF.softmax(score, dim=1)


def test_memory_read_matches_torch():
    q, keys = _setup()
    out = memory_read(q, keys)
    B, H, W, d = q.shape
    tq = torch.tensor(q).reshape(-1, d)
    tkeys = torch.tensor(keys)
    s_q, s_m = _torch_scores(tkeys, tq)
    concat_memory = s_m @ tkeys
    want = torch.cat([tq, concat_memory], dim=1).reshape(B, H, W, 2 * d).numpy()
    np.testing.assert_allclose(np.asarray(out.updated_query), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.score_query), s_q.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.score_memory), s_m.numpy(), rtol=1e-4, atol=1e-6)


def test_memory_update_matches_torch_loop():
    q, keys = _setup(seed=1)
    got = np.asarray(memory_update(q, keys))

    d = q.shape[-1]
    tq = torch.tensor(q).reshape(-1, d)
    tkeys = torch.tensor(keys)
    s_q, s_m = _torch_scores(tkeys, tq)
    _, gathering = torch.topk(s_m, 1, dim=1)
    m = keys.shape[0]
    query_update = torch.zeros((m, d))
    for i in range(m):  # verbatim loop, model/Memory.py:100-114
        idx = torch.nonzero(gathering.squeeze(1) == i)
        if idx.numel() != 0:
            query_update[i] = torch.sum(
                (s_q[idx, i] / torch.max(s_q[:, i])) * tq[idx].squeeze(1), dim=0
            )
    want = tF.normalize(query_update + tkeys, dim=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_memory_losses_match_torch():
    q, keys = _setup(seed=2)
    got = memory_losses(q, keys)

    d = q.shape[-1]
    tq = torch.tensor(q).reshape(-1, d)
    tkeys = torch.tensor(keys)
    _, s_m = _torch_scores(tkeys, tq)
    _, top2 = torch.topk(s_m, 2, dim=1)
    pos, neg = tkeys[top2[:, 0]], tkeys[top2[:, 1]]
    want_compact = tF.mse_loss(tq, pos.detach()).item()
    want_sep = torch.nn.TripletMarginLoss(margin=1.0)(
        tq, pos.detach(), neg.detach()
    ).item()
    np.testing.assert_allclose(float(got.compactness), want_compact, rtol=1e-4)
    np.testing.assert_allclose(float(got.separateness), want_sep, rtol=1e-4, atol=1e-6)


def test_memory_loss_regularizer_matches_torch():
    _, keys = _setup(seed=3)
    got = float(memory_loss_regularizer(keys))
    tkeys = torch.tensor(keys)
    m = keys.shape[0]
    sim = (tkeys @ torch.t(tkeys)) / 2 + 0.5
    sim = torch.abs(sim - torch.eye(m))
    want = (torch.sum(sim) / (m * (m - 1))).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)
