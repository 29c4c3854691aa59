"""Memory-variant parity against the ACTUAL reference files (VERDICT round-1
item 8): loads ``model/conv_mae/Memory.py`` and ``model/conv_mae/
memory_final_spatial_sumonly_weight_ranking_top1.py`` from /root/reference
verbatim (read-only, `.cuda()` no-op'd for CPU), proves the two torch variants
agree on their shared math, and checks our fused ops/MemoryModule against the
`memory_final` oracle in both train and test modes — including its extra
test-mode outputs (top-1 keys/indices) and the unreduced pointwise
compactness loss."""

import importlib.util
import os

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from vadcl_tpu.ops.memory import (
    memory_losses,
    memory_pointwise_compactness,
    memory_read,
    memory_top1,
    memory_update,
)

REF = "/root/reference/model/conv_mae"


def _load(fname, name):
    if not os.path.exists(os.path.join(REF, fname)):
        pytest.skip("reference tree not available")
    # the reference hardcodes .cuda() inside get_update_query; run it on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _inputs(seed=0, B=2, H=4, W=4, d=8, M=6):
    rng = np.random.RandomState(seed)
    q_bdhw = rng.randn(B, d, H, W).astype(np.float32)
    keys = rng.randn(M, d).astype(np.float32)
    keys /= np.linalg.norm(keys, axis=1, keepdims=True)
    return q_bdhw, keys


def _normalized_bhwd(q_bdhw):
    return (
        tF.normalize(torch.tensor(q_bdhw), dim=1).permute(0, 2, 3, 1).numpy()
    )


def test_reference_variants_equivalent_train():
    """model/conv_mae/Memory.py vs memory_final_…top1.py: identical
    updated_query / updated_memory / scores in train mode; the base variant's
    (gathering=MSE, spreading=triplet) losses equal the final variant's
    (compactness, separateness)."""
    base = _load("Memory.py", "ref_memory_base")
    final = _load(
        "memory_final_spatial_sumonly_weight_ranking_top1.py", "ref_memory_final"
    )
    q_bdhw, keys = _inputs()
    tq = torch.tensor(q_bdhw)
    tk = torch.tensor(keys)

    mb = base.Memory(keys.shape[0], q_bdhw.shape[1], q_bdhw.shape[1], 0.1, 0.1)
    mf = final.Memory(keys.shape[0], q_bdhw.shape[1], q_bdhw.shape[1], 0.1, 0.1)
    with torch.no_grad():
        uq_b, um_b, sq_b, sm_b, gather_b, spread_b = mb(tq, tk, train=True)
        uq_f, um_f, sq_f, sm_f, sep_f, comp_f = mf(tq, tk, train=True)

    np.testing.assert_allclose(uq_b.numpy(), uq_f.numpy(), rtol=1e-6)
    np.testing.assert_allclose(um_b.numpy(), um_f.numpy(), rtol=1e-6)
    np.testing.assert_allclose(sq_b.numpy(), sq_f.numpy(), rtol=1e-6)
    np.testing.assert_allclose(sm_b.numpy(), sm_f.numpy(), rtol=1e-6)
    np.testing.assert_allclose(float(gather_b), float(comp_f), rtol=1e-6)
    np.testing.assert_allclose(float(spread_b), float(sep_f), rtol=1e-6)


def test_ops_match_reference_final_train():
    final = _load(
        "memory_final_spatial_sumonly_weight_ranking_top1.py", "ref_memory_final"
    )
    q_bdhw, keys = _inputs(seed=1)
    mf = final.Memory(keys.shape[0], q_bdhw.shape[1], q_bdhw.shape[1], 0.1, 0.1)
    with torch.no_grad():
        uq, um, sq, sm, sep, comp = mf(
            torch.tensor(q_bdhw), torch.tensor(keys), train=True
        )

    q_bhwd = _normalized_bhwd(q_bdhw)
    read = memory_read(q_bhwd, keys)
    B, H, W, d = q_bhwd.shape
    # reference updated_query is (b, 2d, h, w); ours is (B, H, W, 2d)
    want_uq = uq.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(read.updated_query).reshape(B, H, W, 2 * d),
        want_uq, rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(read.score_query), sq.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(read.score_memory), sm.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(memory_update(q_bhwd, keys)), um.numpy(), rtol=1e-4, atol=1e-5
    )
    losses = memory_losses(q_bhwd, keys)
    np.testing.assert_allclose(float(losses.separateness), float(sep), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(losses.compactness), float(comp), rtol=1e-4)


def test_ops_match_reference_final_test_mode():
    """Test-mode extras of the final variant: no memory update, top-1 keys and
    indices, reduced + pointwise compactness."""
    final = _load(
        "memory_final_spatial_sumonly_weight_ranking_top1.py", "ref_memory_final"
    )
    q_bdhw, keys = _inputs(seed=2)
    mf = final.Memory(keys.shape[0], q_bdhw.shape[1], q_bdhw.shape[1], 0.1, 0.1)
    tq, tk = torch.tensor(q_bdhw), torch.tensor(keys)
    with torch.no_grad():
        uq, um, sq, sm, query_re, top1_keys, keys_ind, comp = mf(tq, tk, train=False)
        pointwise = mf.pointwise_gather_loss(query_re, tk, keys_ind[:, None], False)

    # test mode leaves the bank untouched (memory_final_…py:156-158)
    np.testing.assert_array_equal(um.numpy(), keys)

    q_bhwd = _normalized_bhwd(q_bdhw)
    top1 = memory_top1(q_bhwd, keys)
    np.testing.assert_array_equal(np.asarray(top1.index), keys_ind.numpy())
    np.testing.assert_allclose(np.asarray(top1.keys), top1_keys.numpy(), rtol=1e-6)

    pw = np.asarray(memory_pointwise_compactness(q_bhwd, keys))
    np.testing.assert_allclose(pw, pointwise.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(pw.mean()), float(comp), rtol=1e-4)


def test_memory_module_matches_reference_final():
    """Whole-module: our MemoryModule (raw query in, normalization inside) vs
    the reference forward, train mode, including the returned bank."""
    import jax

    from vadcl_tpu.models.memory import MemoryModule

    final = _load(
        "memory_final_spatial_sumonly_weight_ranking_top1.py", "ref_memory_final"
    )
    q_bdhw, keys = _inputs(seed=3)
    mf = final.Memory(keys.shape[0], q_bdhw.shape[1], q_bdhw.shape[1], 0.1, 0.1)
    with torch.no_grad():
        uq, um, _, _, sep, comp = mf(
            torch.tensor(q_bdhw), torch.tensor(keys), train=True
        )

    mod = MemoryModule(memory_size=keys.shape[0], key_dim=q_bdhw.shape[1])
    q_raw_bhwd = np.transpose(q_bdhw, (0, 2, 3, 1))
    variables = jax.jit(mod.init)(jax.random.key(0), q_raw_bhwd)
    variables = {"memory": {"keys": keys}}  # pin the bank to the oracle's
    out, updates = jax.jit(
        lambda v, q: mod.apply(v, q, train=True, mutable=["memory"])
    )(variables, q_raw_bhwd)
    np.testing.assert_allclose(
        np.asarray(out.updated_query), uq.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(updates["memory"]["keys"]), um.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(float(out.separateness), float(sep), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(out.compactness), float(comp), rtol=1e-4)
