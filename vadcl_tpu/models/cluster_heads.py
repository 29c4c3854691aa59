"""Dual Euclidean soft-assignment clustering heads (flax.linen).

Parity with ``model/cluster.py:58-149``: each head LayerNorms its input, then
runs the fused cdist -> argmin -> neg-soft-assign pipeline from
``vadcl_tpu.ops.cluster``.  Centers init uniform[0, 1) like ``torch.rand``
(``model/cluster.py:71,115``); the reference's constant ``identity_matrix``
parameters are not materialized (they were frozen, unused buffers).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vadcl_tpu.models.layers import layer_norm
from vadcl_tpu.ops.cluster import (
    ClusterAssignment,
    SpaceClusterAssignment,
    feature_cluster_assign,
    space_cluster_assign,
)


class FeatureClusterOut(NamedTuple):
    distance: Optional[jax.Array]  # (B, D, H, W, K); None on the fused path
    assign: Optional[jax.Array]  # (B, D, H, W, K); None on the fused path
    labels: jax.Array  # (B*D*H*W,) int32
    recon: jax.Array  # (B, D, H, W, C) soft reconstruction
    feature: jax.Array  # (B*D*H*W, C) LayerNormed tokens (t-SNE / viz tap)
    center_self_distance: Optional[jax.Array]  # (K, K); None on the fused path
    loss_sq_sum: Optional[jax.Array]  # fused path: sum((dist*assign)^2)


class FeatureClusterHead(nn.Module):
    """EuclidDistance_Assign_Module parity (``model/cluster.py:58-99``):
    K=1024 x 192-d centers, alpha=16 in the flagship config."""

    clusters: int = 1024
    alpha: float = 16.0
    fused: bool = False  # Pallas kernel: dist/assign never leave VMEM

    @nn.compact
    def __call__(self, x: jax.Array) -> FeatureClusterOut:
        B, D, H, W, C = x.shape
        centers = self.param(
            "cluster_center",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32),
            (self.clusters, C),
        )
        xn = layer_norm(dtype=jnp.float32, name="norm")(x.astype(jnp.float32))
        feature = xn.reshape(-1, C)
        if self.fused:
            from vadcl_tpu.ops.pallas_cluster import fused_cluster_assign

            fo = fused_cluster_assign(feature, centers, self.alpha)
            return FeatureClusterOut(
                distance=None,
                assign=None,
                labels=fo.labels,
                recon=fo.recon.reshape(B, D, H, W, C).astype(x.dtype),
                feature=feature,
                center_self_distance=None,
                loss_sq_sum=fo.loss_sq_sum,
            )
        out: ClusterAssignment = feature_cluster_assign(xn, centers, self.alpha)
        return FeatureClusterOut(
            distance=out.distance,
            assign=out.assign,
            labels=out.labels,
            recon=out.recon.astype(x.dtype),
            feature=feature,
            center_self_distance=out.center_self_distance,
            loss_sq_sum=None,
        )


class SpaceClusterOut(NamedTuple):
    distance: Optional[jax.Array]  # (B, D, C, K); None on the fused path
    assign: Optional[jax.Array]  # (B, D, C, K); None on the fused path
    center_self_distance: Optional[jax.Array]  # (C, K, K); None when fused
    loss_sq_sum: Optional[jax.Array]  # fused path: sum((dist*assign)^2)


class SpaceClusterHead(nn.Module):
    """Space_EuclidDistance_Assign_Module parity (``model/cluster.py:102-149``):
    per-channel clustering of (space_size^2)-d spatial maps, K=128, alpha=32."""

    clusters: int = 128
    alpha: float = 32.0
    space_size: int = 28
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> SpaceClusterOut:
        B, D, H, W, C = x.shape
        assert H * W == self.space_size * self.space_size, (
            f"space head configured for {self.space_size}^2 spatial maps, "
            f"got {H}x{W}"
        )
        centers = self.param(
            "cluster_center",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32),
            (C, self.clusters, self.space_size * self.space_size),
        )
        xn = layer_norm(dtype=jnp.float32, name="norm")(x.astype(jnp.float32))
        if self.fused:
            from vadcl_tpu.ops.pallas_cluster import fused_space_cluster_loss

            maps = xn.transpose(4, 0, 1, 2, 3).reshape(C, B * D, H * W)
            loss_sq = fused_space_cluster_loss(maps, centers, self.alpha)
            return SpaceClusterOut(
                distance=None, assign=None, center_self_distance=None,
                loss_sq_sum=loss_sq,
            )
        out = space_cluster_assign(xn, centers, self.alpha)
        return SpaceClusterOut(
            distance=out.distance,
            assign=out.assign,
            center_self_distance=out.center_self_distance,
            loss_sq_sum=None,
        )
