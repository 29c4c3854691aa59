"""MNAD-style memory addressing as fused matmul/segment-sum ops.

Capability parity with the reference memory module (``model/Memory.py:62-262``)
— cosine-score addressing with dual softmax, top-1 gathered score-weighted
update, separateness/compactness losses — but the reference's per-slot Python
loop (``model/Memory.py:100-114``) becomes a one-hot segment-sum matmul that
XLA fuses onto the MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    # torch.nn.functional.normalize parity: x / max(||x||, eps)
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def memory_scores(keys: jax.Array, query: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """query: (N, d) flattened normalized queries; keys: (M, d).

    Returns (score_query, score_memory): softmax of ``query @ keys^T`` over the
    query axis and the memory axis respectively (``model/Memory.py:133-143``).
    """
    score = jnp.einsum(
        "nd,md->nm",
        query.astype(jnp.float32),
        keys.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.softmax(score, axis=0), jax.nn.softmax(score, axis=1)


class MemoryReadOut(NamedTuple):
    updated_query: jax.Array  # (B, H, W, 2d): concat(query, score_memory @ keys)
    score_query: jax.Array  # (N, M)
    score_memory: jax.Array  # (N, M)


def memory_read(query_bhwd: jax.Array, keys: jax.Array) -> MemoryReadOut:
    """Read path (``model/Memory.py:249-261``): addressed memory summary is
    concatenated to the query, doubling channels.  The attention weights are
    stop-gradiented exactly as the reference detaches ``softmax_score_memory``.
    query_bhwd: (B, H, W, d) already L2-normalized over d."""
    B, H, W, d = query_bhwd.shape
    q = query_bhwd.reshape(-1, d)
    s_q, s_m = memory_scores(keys, q)
    addressed = jax.lax.stop_gradient(s_m) @ keys.astype(jnp.float32)
    out = jnp.concatenate([q.astype(jnp.float32), addressed], axis=-1)
    return MemoryReadOut(
        updated_query=out.reshape(B, H, W, 2 * d).astype(query_bhwd.dtype),
        score_query=s_q,
        score_memory=s_m,
    )


def memory_update(query_bhwd: jax.Array, keys: jax.Array) -> jax.Array:
    """Update path (``model/Memory.py:177-204``): each memory slot accumulates
    the queries whose top-1 address is that slot, weighted by
    ``score_query / max(score_query[:, slot])``, then the sum is added to the
    key and re-normalized.  Returned detached (the reference returns
    ``updated_memory.detach()``).

    Per-slot loop -> one-hot weighted segment-sum: W[n, m] =
    onehot(top1(n))[m] * score_query[n, m] / colmax(score_query)[m];
    update = W^T @ query.
    """
    d = query_bhwd.shape[-1]
    q = query_bhwd.reshape(-1, d).astype(jnp.float32)
    s_q, s_m = memory_scores(keys, q)
    top1 = jnp.argmax(s_m, axis=1)  # (N,) nearest slot per query
    onehot = jax.nn.one_hot(top1, keys.shape[0], dtype=jnp.float32)  # (N, M)
    col_max = jnp.max(s_q, axis=0, keepdims=True)  # (1, M)
    w = onehot * s_q / jnp.maximum(col_max, 1e-12)
    query_update = w.T @ q  # (M, d)
    updated = _l2_normalize(query_update + keys.astype(jnp.float32), axis=1)
    return jax.lax.stop_gradient(updated).astype(keys.dtype)


class MemoryLosses(NamedTuple):
    compactness: jax.Array  # MSE(query, keys[top1])  (gathering loss)
    separateness: jax.Array  # triplet(query, keys[top1], keys[top2]), margin 1


def memory_losses(query_bhwd: jax.Array, keys: jax.Array) -> MemoryLosses:
    """Gathering (compactness) + spreading (separateness) losses
    (``model/Memory.py:214-247``).  Triplet uses torch's pairwise distance
    including its eps=1e-6 additive term."""
    d = query_bhwd.shape[-1]
    q = query_bhwd.reshape(-1, d).astype(jnp.float32)
    _, s_m = memory_scores(keys, q)
    _, top2 = jax.lax.top_k(s_m, 2)
    pos = jax.lax.stop_gradient(keys.astype(jnp.float32)[top2[:, 0]])
    neg = jax.lax.stop_gradient(keys.astype(jnp.float32)[top2[:, 1]])
    compact = jnp.mean((q - pos) ** 2)
    eps = 1e-6
    d_pos = jnp.linalg.norm(q - pos + eps, axis=1)
    d_neg = jnp.linalg.norm(q - neg + eps, axis=1)
    separate = jnp.mean(jnp.maximum(d_pos - d_neg + 1.0, 0.0))
    return MemoryLosses(compactness=compact, separateness=separate)


class MemoryTop1(NamedTuple):
    keys: jax.Array  # (N, d) nearest memory item per query (detached)
    index: jax.Array  # (N,) its slot index


def memory_top1(query_bhwd: jax.Array, keys: jax.Array) -> MemoryTop1:
    """Test-mode top-1 addressing outputs of the `memory_final_spatial_
    sumonly_weight_ranking_top1` variant (``model/conv_mae/memory_final_…py:
    219-224``): the nearest memory item per query and its index, both used by
    MNAD's test-time anomaly measures."""
    d = query_bhwd.shape[-1]
    q = query_bhwd.reshape(-1, d).astype(jnp.float32)
    _, s_m = memory_scores(keys, q)
    top1 = jnp.argmax(s_m, axis=1)
    return MemoryTop1(
        keys=jax.lax.stop_gradient(keys.astype(jnp.float32)[top1]), index=top1
    )


def memory_pointwise_compactness(
    query_bhwd: jax.Array, keys: jax.Array
) -> jax.Array:
    """Unreduced per-element compactness loss (``model/conv_mae/
    memory_final_…py:185-191`` ``pointwise_gather_loss``: MSELoss(reduction=
    'none') against the detached top-1 key) — the per-location anomaly-energy
    map MNAD scores with at test time.  Returns (N, d) like the reference's
    flattened layout."""
    d = query_bhwd.shape[-1]
    q = query_bhwd.reshape(-1, d).astype(jnp.float32)
    top1 = memory_top1(query_bhwd, keys)
    return (q - top1.keys) ** 2


def memory_loss_regularizer(keys: jax.Array) -> jax.Array:
    """MemoryLoss (``model/Memory.py:52-59``): mean off-diagonal absolute
    shifted cosine similarity of the memory bank."""
    m = keys.shape[0]
    sim = (keys.astype(jnp.float32) @ keys.astype(jnp.float32).T) / 2.0 + 0.5
    sim = jnp.abs(sim - jnp.eye(m, dtype=jnp.float32))
    return jnp.sum(sim) / (m * (m - 1))
