"""Memory-augmented 2D conv autoencoder alternates (MNAD-style).

Capability parity with the vendored conv_mae zoo:

* ``ConvAE`` — reconstruction variant (``model/conv_mae/Reconstruction.py:
  9-163``): t_length frames stacked channel-wise, 3-level pooled conv encoder
  to 512-d features, memory read doubling channels, skip-free decoder with
  Tanh head reconstructing all frames.
* ``ConvAEPredict`` — future-frame variant (``model/conv_mae/
  final_future_prediction_with_memory_spatial_sumonly_weight_ranking_top1.py``):
  (t_length-1) input frames, U-Net skips into the decoder, single-frame Tanh
  output.

Frames enter as (B, T, H, W, C) and are flattened to (B, H, W, T*C); 2D convs
are 3D convs with a singleton depth via the shared NDHWC primitives.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vadcl_tpu.models.layers import Conv3d, ConvTranspose3d, FrozenBatchNorm
from vadcl_tpu.models.memory import MemoryModule, MemoryOut


def _as_2d(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, 1, H, W, C) so 3D primitives act as 2D."""
    return x[:, None]


def _from_2d(x: jax.Array) -> jax.Array:
    return x[:, 0]


class _Basic(nn.Module):
    """conv3-BN-ReLU x2 (``Reconstruction.py:13-27``)."""

    features: int
    final_relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _as_2d(x)
        x = Conv3d(self.features, (1, 3, 3), padding=(0, 1, 1), dtype=self.dtype,
                   name="conv1")(x)
        x = FrozenBatchNorm(eps=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = Conv3d(self.features, (1, 3, 3), padding=(0, 1, 1), dtype=self.dtype,
                   name="conv2")(x)
        if self.final_relu:
            x = FrozenBatchNorm(eps=1e-5, dtype=self.dtype, name="bn2")(x)
            x = nn.relu(x)
        return _from_2d(x)


class _Gen(nn.Module):
    """Final generator: conv-BN-ReLU x2 + conv + Tanh (``Reconstruction.py:83-94``)."""

    features: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _as_2d(x)
        x = Conv3d(self.hidden, (1, 3, 3), padding=(0, 1, 1), dtype=self.dtype,
                   name="conv1")(x)
        x = FrozenBatchNorm(eps=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = Conv3d(self.hidden, (1, 3, 3), padding=(0, 1, 1), dtype=self.dtype,
                   name="conv2")(x)
        x = FrozenBatchNorm(eps=1e-5, dtype=self.dtype, name="bn2")(x)
        x = nn.relu(x)
        x = Conv3d(self.features, (1, 3, 3), padding=(0, 1, 1), dtype=self.dtype,
                   name="conv3")(x)
        return jnp.tanh(_from_2d(x))


class _Upsample(nn.Module):
    """ConvT(3, s2, p1, output_padding 1) + BN + ReLU: doubles H, W.

    torch output_padding=1 adds one extra row/col at the bottom/right; with
    k=3, s=2, p=1 this is equivalent to asymmetric padding (k-1-p, k-p) in the
    fractionally-strided formulation.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (1, 3, 3, cin, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = _as_2d(x)
        w_f = jnp.flip(w, axis=(0, 1, 2)).astype(x.dtype)
        out = jax.lax.conv_general_dilated(
            x, w_f,
            window_strides=(1, 1, 1),
            padding=[(0, 0), (1, 2), (1, 2)],  # (k-1-p, k-1-p+output_padding)
            lhs_dilation=(1, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + b.astype(x.dtype)
        out = FrozenBatchNorm(eps=1e-5, dtype=self.dtype, name="bn")(out)
        return _from_2d(nn.relu(out))


def _max_pool_2d(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    ).astype(x.dtype)


class ConvAEOut(NamedTuple):
    recon: jax.Array  # (B, T_out, H, W, C)
    feature: jax.Array  # (B, H/8, W/8, 512) encoder features
    memory: MemoryOut


class ConvAE(nn.Module):
    """Reconstruction variant (skip-free)."""

    n_channel: int = 3
    t_length: int = 2
    memory_size: int = 10
    key_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, clip: jax.Array, train: bool = True) -> ConvAEOut:
        B, T, H, W, C = clip.shape
        x = clip.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)
        x = _Basic(64, dtype=self.dtype, name="enc1")(x)
        x = _max_pool_2d(x)
        x = _Basic(128, dtype=self.dtype, name="enc2")(x)
        x = _max_pool_2d(x)
        x = _Basic(256, dtype=self.dtype, name="enc3")(x)
        x = _max_pool_2d(x)
        fea = _Basic(512, final_relu=False, dtype=self.dtype, name="enc4")(x)

        mem = MemoryModule(
            memory_size=self.memory_size, key_dim=self.key_dim, name="memory"
        )(fea, train=train)
        y = mem.updated_query.astype(self.dtype)  # (B, h, w, 1024)

        y = _Basic(512, dtype=self.dtype, name="dec4")(y)
        y = _Upsample(512, dtype=self.dtype, name="up4")(y)
        y = _Basic(256, dtype=self.dtype, name="dec3")(y)
        y = _Upsample(256, dtype=self.dtype, name="up3")(y)
        y = _Basic(128, dtype=self.dtype, name="dec2")(y)
        y = _Upsample(128, dtype=self.dtype, name="up2")(y)
        y = _Gen(T * C, 64, dtype=self.dtype, name="gen")(y)
        recon = y.reshape(B, H, W, T, C).transpose(0, 3, 1, 2, 4)
        return ConvAEOut(recon=recon, feature=fea, memory=mem)


class ConvAEPredict(nn.Module):
    """Future-frame variant with U-Net skips; input (t_length - 1) frames,
    output 1 frame."""

    n_channel: int = 3
    t_length: int = 5
    memory_size: int = 10
    key_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, clip: jax.Array, train: bool = True) -> ConvAEOut:
        B, T, H, W, C = clip.shape
        assert T == self.t_length - 1, (T, self.t_length)
        x = clip.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)
        s1 = _Basic(64, dtype=self.dtype, name="enc1")(x)
        x = _max_pool_2d(s1)
        s2 = _Basic(128, dtype=self.dtype, name="enc2")(x)
        x = _max_pool_2d(s2)
        s3 = _Basic(256, dtype=self.dtype, name="enc3")(x)
        x = _max_pool_2d(s3)
        fea = _Basic(512, final_relu=False, dtype=self.dtype, name="enc4")(x)

        mem = MemoryModule(
            memory_size=self.memory_size, key_dim=self.key_dim, name="memory"
        )(fea, train=train)
        y = mem.updated_query.astype(self.dtype)

        y = _Basic(512, dtype=self.dtype, name="dec4")(y)
        y = _Upsample(256, dtype=self.dtype, name="up4")(y)
        y = _Basic(256, dtype=self.dtype, name="dec3")(jnp.concatenate([s3, y], -1))
        y = _Upsample(128, dtype=self.dtype, name="up3")(y)
        y = _Basic(128, dtype=self.dtype, name="dec2")(jnp.concatenate([s2, y], -1))
        y = _Upsample(64, dtype=self.dtype, name="up2")(y)
        y = _Gen(C, 64, dtype=self.dtype, name="gen")(jnp.concatenate([s1, y], -1))
        recon = y[:, None]  # (B, 1, H, W, C)
        return ConvAEOut(recon=recon, feature=fea, memory=mem)
