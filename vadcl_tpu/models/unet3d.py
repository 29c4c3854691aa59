"""5-level residual 3D U-Net alternative backbone.

Capability parity with ``model/unet3D.py:6-141``: (1,2,2) max-pool encoder,
double-conv blocks with 1x1x1 residual projection, (1,k,k) transposed-conv
upsampling with skip concatenation, sigmoid head.  The reference's BatchNorms
fall under the same global BN freeze (``misc/utils.py:205``), so blocks use
FrozenBatchNorm here too.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vadcl_tpu.models.layers import Conv3d, ConvTranspose3d, FrozenBatchNorm


class ConvBlock3D(nn.Module):
    """Conv3D_Block parity (``model/unet3D.py:79-109``)."""

    features: int
    residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        y = Conv3d(
            self.features, (1, 3, 3), padding=(0, 1, 1), dtype=self.dtype,
            name="conv1",
        )(x)
        y = FrozenBatchNorm(eps=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = Conv3d(
            self.features, (1, 3, 3), padding=(0, 1, 1), dtype=self.dtype,
            name="conv2",
        )(y)
        y = FrozenBatchNorm(eps=1e-5, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        if self.residual:
            y = y + Conv3d(
                self.features, (1, 1, 1), use_bias=False, dtype=self.dtype,
                name="residual",
            )(res)
        return y


class Deconv3DBlock(nn.Module):
    """Deconv3D_Block parity (``model/unet3D.py:112-126``): ConvT(1,4,4)
    stride (1,2,2) padding (0,1,1) + ReLU."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvTranspose3d(
            self.features, (1, 4, 4), stride=(1, 2, 2), padding=(0, 1, 1),
            dtype=self.dtype, name="deconv",
        )(x)
        return nn.relu(y)


def _max_pool_122(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 2, 2, 1),
        window_strides=(1, 1, 2, 2, 1),
        padding="VALID",
    ).astype(x.dtype)


class UNet3D(nn.Module):
    num_channels: int = 3
    feat_channels: Sequence[int] = (64, 128, 256, 512, 1024)
    residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, D, H, W, C) -> sigmoid reconstruction, same shape."""
        f = self.feat_channels
        x1 = ConvBlock3D(f[0], self.residual, self.dtype, name="enc1")(x)
        x2 = ConvBlock3D(f[1], self.residual, self.dtype, name="enc2")(_max_pool_122(x1))
        x3 = ConvBlock3D(f[2], self.residual, self.dtype, name="enc3")(_max_pool_122(x2))
        x4 = ConvBlock3D(f[3], self.residual, self.dtype, name="enc4")(_max_pool_122(x3))
        base = ConvBlock3D(f[4], self.residual, self.dtype, name="base")(_max_pool_122(x4))

        d4 = jnp.concatenate(
            [Deconv3DBlock(f[3], self.dtype, name="up4")(base), x4], axis=-1
        )
        d4 = ConvBlock3D(f[3], self.residual, self.dtype, name="dec4")(d4)
        d3 = jnp.concatenate(
            [Deconv3DBlock(f[2], self.dtype, name="up3")(d4), x3], axis=-1
        )
        d3 = ConvBlock3D(f[2], self.residual, self.dtype, name="dec3")(d3)
        d2 = jnp.concatenate(
            [Deconv3DBlock(f[1], self.dtype, name="up2")(d3), x2], axis=-1
        )
        d2 = ConvBlock3D(f[1], self.residual, self.dtype, name="dec2")(d2)
        d1 = jnp.concatenate(
            [Deconv3DBlock(f[0], self.dtype, name="up1")(d2), x1], axis=-1
        )
        d1 = ConvBlock3D(f[0], self.residual, self.dtype, name="dec1")(d1)
        seg = Conv3d(self.num_channels, (1, 1, 1), dtype=self.dtype, name="head")(d1)
        return nn.sigmoid(seg)
