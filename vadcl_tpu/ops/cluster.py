"""Euclidean soft-assignment clustering primitives.

TPU-first rebuild of the reference's cluster heads (``model/cluster.py``):
``torch.cdist`` + argmin + negative soft-assign + optional soft reconstruction
become one fused matmul-dominated pipeline (the cdist *is* a matmul:
``sqrt(clamp(|x|^2 + |c|^2 - 2 x c^T, 0))``), which XLA maps straight onto the
MXU.  All distance/softmax math runs fp32 — bf16 cancellation can flip argmin
labels and change hard assignments (SURVEY §7.3.2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def cdist(x: jax.Array, c: jax.Array) -> jax.Array:
    """Pairwise Euclidean distance, torch.cdist(p=2) parity in its matmul mode:
    distances are sqrt(clamp(|x|^2 + |c|^2 - 2 x c^T, 0)).

    x: (..., N, D), c: (..., K, D) -> (..., N, K).  Leading batch dims follow
    broadcasting, matching torch.cdist's batched semantics
    (``model/cluster.py:87`` uses (B, N, D) x (1, K, D); ``:133`` uses
    (C, N, S) x (C, K, S)).
    """
    x = x.astype(jnp.float32)
    c = c.astype(jnp.float32)
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # (..., N, 1)
    c_sq = jnp.sum(c * c, axis=-1)[..., None, :]  # (..., 1, K)
    cross = jnp.einsum(
        "...nd,...kd->...nk", x, c, preferred_element_type=jnp.float32
    )
    d2 = x_sq + c_sq - 2.0 * cross
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def neg_soft_assign(d: jax.Array, alpha: float) -> jax.Array:
    """softmax(-alpha * (d - min(d))) over the last axis — NegSoftAssign parity
    (``model/cluster.py:42-55``; the min-shift is the usual softmax stabilizer,
    reproduced exactly)."""
    d = d.astype(jnp.float32)
    d_min = jnp.min(d, axis=-1, keepdims=True)
    e = jnp.exp(-alpha * (d - d_min))
    return e / jnp.sum(e, axis=-1, keepdims=True)


def pos_soft_assign(x: jax.Array, alpha: float) -> jax.Array:
    """softmax(alpha * (x - max(x))) — PosSoftAssign parity
    (``model/cluster.py:27-39``)."""
    x = x.astype(jnp.float32)
    x_max = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(alpha * (x - x_max))
    return e / jnp.sum(e, axis=-1, keepdims=True)


class ClusterAssignment(NamedTuple):
    distance: jax.Array  # (B, D, H, W, K) fp32
    assign: jax.Array  # (B, D, H, W, K) fp32 soft assignment
    labels: jax.Array  # (B*D*H*W,) int32 argmin hard labels
    recon: jax.Array  # (B, D, H, W, C) soft reconstruction assign @ centers
    center_self_distance: jax.Array  # (K, K)


def feature_cluster_assign(
    x: jax.Array, centers: jax.Array, alpha: float
) -> ClusterAssignment:
    """Feature-level clustering (``model/cluster.py:81-99``), post-LayerNorm
    input x: (B, D, H, W, C); centers: (K, C)."""
    B, D, H, W, C = x.shape
    tokens = x.reshape(B, D * H * W, C)
    dist = cdist(tokens, centers[None])  # (B, N, K)
    labels = jnp.argmin(dist, axis=-1).reshape(-1).astype(jnp.int32)
    assign = neg_soft_assign(dist, alpha)
    recon = jnp.einsum(
        "bnk,kc->bnc",
        assign,
        centers.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    K = centers.shape[0]
    return ClusterAssignment(
        distance=dist.reshape(B, D, H, W, K),
        assign=assign.reshape(B, D, H, W, K),
        labels=labels,
        recon=recon.reshape(B, D, H, W, C).astype(x.dtype),
        center_self_distance=cdist(centers, centers),
    )


class SpaceClusterAssignment(NamedTuple):
    distance: jax.Array  # (B, D, C, K) fp32
    assign: jax.Array  # (B, D, C, K) fp32
    center_self_distance: jax.Array  # (C, K, K)


def space_cluster_assign(
    x: jax.Array, centers: jax.Array, alpha: float
) -> SpaceClusterAssignment:
    """Spatial-pattern clustering (``model/cluster.py:127-149``): every channel
    clusters its (H*W) spatial maps independently.  x: (B, D, H, W, C) after
    LayerNorm; centers: (C, K, H*W)."""
    B, D, H, W, C = x.shape
    # B D H W C -> C (B D) (H W)
    maps = x.transpose(4, 0, 1, 2, 3).reshape(C, B * D, H * W)
    dist = cdist(maps, centers)  # (C, B*D, K)
    K = centers.shape[1]
    # C (B D) K -> B D C K
    dist_bd = dist.reshape(C, B, D, K).transpose(1, 2, 0, 3)
    assign = neg_soft_assign(dist_bd, alpha)
    return SpaceClusterAssignment(
        distance=dist_bd,
        assign=assign,
        center_self_distance=cdist(centers, centers),
    )


def frobenius_norm(x: jax.Array) -> jax.Array:
    """torch.norm(x) parity (Frobenius over the whole tensor, fp32)."""
    x = x.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(x * x))


def cluster_alpha_schedule(max_n: int = 40) -> "np.ndarray":
    """The reference's annealing helper for the soft-assign temperature
    (``model/cluster.py:15-24``, defined-but-unused in the live path):
    alphas[0] = 0.1; alphas[i] = 2^(1/log(i+1)^2) * alphas[i-1]."""
    import numpy as np

    alphas = np.zeros(max_n, dtype=np.float64)
    alphas[0] = 0.1
    for i in range(1, max_n):
        alphas[i] = (2 ** (1 / (np.log(i + 1)) ** 2)) * alphas[i - 1]
    return alphas


def l1_recon_loss(recon: jax.Array, target: jax.Array, patch_t: int = 2) -> jax.Array:
    """Recon_Loss parity (``loss_tool/Recon_Loss.py:11-32``): pad the time
    axis to a multiple of the temporal patch (edge-replicate the reference's
    zero-pad? — it zero-pads via F.pad) then mean absolute error.
    recon/target: (B, T, H, W, C)."""
    t = target.shape[1]
    pad = (-t) % patch_t
    if pad:
        cfg = ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0))
        target = jnp.pad(target, cfg)
        recon = jnp.pad(recon, cfg)
    return jnp.mean(
        jnp.abs(recon.astype(jnp.float32) - target.astype(jnp.float32))
    )
