"""Hybrid Video-Swin-3D + I3D-Inception encoder.

Capability parity with the modified SwinTransformer3D
(``model/swin_transformer.py:466-759``): 2 stages of depths (3, 6) /
heads (6, 12) at dims (96, 192), each stage fusing windowed attention with a
parallel Inception branch as ``x = attn + attn * conv + x``
(``:739-744``), strided-conv downsampling instead of PatchMerging
(``:575-585``), per-stage feature taps (``x_drec``, ``:745-748``).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vadcl_tpu.models.layers import Conv3d, InceptionModule, gelu
from vadcl_tpu.models.swin import PatchEmbed3D, SwinStage

# Inception branch channel plans per stage dim (model/swin_transformer.py:550-555):
# out channels sum to the stage dim so the fusion is residual-compatible.
INCEPTION_CHANNELS = {
    96: (16, 32, 48, 9, 16, 16),
    192: (32, 64, 96, 16, 32, 32),
    384: (128, 96, 128, 32, 64, 64),
    768: (256, 112, 256, 32, 128, 128),
}


def inception_channels(dim: int) -> Tuple[int, ...]:
    """Branch plan for a stage dim: the reference's table for its dims, a
    proportional split (b0+b1b+b2b+b3b == dim) for any other width."""
    if dim in INCEPTION_CHANNELS:
        return INCEPTION_CHANNELS[dim]
    b0 = max(dim // 6, 1)
    b1b = max(dim // 2, 1)
    b2b = max(dim // 6, 1)
    b3b = dim - (b0 + b1b + b2b)
    assert b3b >= 1, f"dim {dim} too small for an Inception split"
    return (b0, max(dim // 3, 1), b1b, max(dim // 12, 1), b2b, b3b)


class SwinEncoder3D(nn.Module):
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    depths: Sequence[int] = (3, 6)
    num_heads: Sequence[int] = (6, 12)
    window_size: Tuple[int, int, int] = (8, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    remat: bool = False
    fused_attention: bool = False
    attn_kernel: str = "base"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array, List[jax.Array]]:
        """x: (B, D, H, W, C) raw clip -> (latent, patch_embedding, stage taps).

        latent: (B, D/pd, H/(4*2), W/(4*2), 2*embed_dim) for the 2-stage config.
        """
        num_layers = len(self.depths)
        x = PatchEmbed3D(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x_rec = x
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)

        # stochastic depth decay across all blocks (torch.linspace semantics)
        total = sum(self.depths)
        dpr = [
            self.drop_path_rate * i / max(total - 1, 1) for i in range(total)
        ]

        taps: List[jax.Array] = []
        for i in range(num_layers):
            dim = int(self.embed_dim * 2**i)
            attn_x = SwinStage(
                dim=dim,
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=tuple(
                    dpr[sum(self.depths[:i]) : sum(self.depths[: i + 1])]
                ),
                remat=self.remat,
                fused=self.fused_attention,
                attn_kernel=self.attn_kernel,
                dtype=self.dtype,
                name=f"stage{i}",
            )(x, deterministic)
            conv_x = InceptionModule(
                out_channels=inception_channels(dim),
                dtype=self.dtype,
                name=f"inception{i}",
            )(x)
            # fusion: attn + attn*conv + x  (model/swin_transformer.py:741-743)
            x = attn_x + attn_x * conv_x + x
            if i < num_layers - 1:
                # Conv3d(1,2,2) stride (1,2,2) + GELU downsample (:575-585)
                x = Conv3d(
                    dim * 2,
                    kernel_size=(1, 2, 2),
                    stride=(1, 2, 2),
                    dtype=self.dtype,
                    name=f"downsample{i}",
                )(x)
                x = gelu(x)
            taps.append(x)

        return x, x_rec, taps
