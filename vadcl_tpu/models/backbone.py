"""Composite model: encoder + dual cluster heads + decoder.

Capability parity with ``Mymodel`` (``model/backbone.py:28-129``) including the
gradient-flow semantics that decide what actually trains (SURVEY §7.3.3):

* cluster heads see **stop-gradiented** features unless compactness mode is on
  (``model/backbone.py:86-88``);
* in compactness mode the decoder consumes the cluster's soft reconstruction
  ``assign @ centers`` instead of the encoder features (``:89``, via
  ``model/cluster.py:94-95``), coupling encoder <-> centers end to end;
* cluster losses are ``||distance * assign||_F`` (``:94-98``);
* a LayerNorm(192) sits between the (possibly replaced) latent and the decoder
  (``:120``).

The reference's dead-branch bug (non-compactness cluster path unpacks the
wrong arity and leaves ``feature`` unbound, ``model/backbone.py:92-129``) is
fixed rather than reproduced: every mode returns well-defined features/labels.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vadcl_tpu.core.config import ModelConfig
from vadcl_tpu.models.cluster_heads import FeatureClusterHead, SpaceClusterHead
from vadcl_tpu.models.decoder import SwinDecoder3D
from vadcl_tpu.models.encoder import SwinEncoder3D
from vadcl_tpu.models.layers import layer_norm
from vadcl_tpu.ops.cluster import frobenius_norm


class VADOutput(NamedTuple):
    recon: jax.Array  # (B, D_out, H, W, 3)
    cluster_loss: jax.Array  # scalar fp32 (0 when the head is off)
    space_loss: jax.Array  # scalar fp32
    feature: jax.Array  # (B*D'*H'*W', C) latent tokens (viz/t-SNE tap)
    feature_label: jax.Array  # (B*D'*H'*W',) int32 hard cluster labels
    cluster_assign: Optional[jax.Array]  # (B, D', H', W', K) or None
    space_assign: Optional[jax.Array]  # (B, D', C, K) or None


class VADModel(nn.Module):
    """Composite VAD model.  ``config.backbone`` selects the family:

    * ``swin`` — flagship Swin+I3D clustering-guided autoencoder (default);
    * ``unet3d`` — 5-level residual 3D U-Net (``model/unet3D.py``, the
      commented alternative at ``model/backbone.py:32``);
    * ``convae`` / ``convae_predict`` — MNAD memory-augmented conv AEs
      (``model/conv_mae/*``, the commented alternative at
      ``model/backbone.py:31``); their separateness/compactness memory losses
      ride the cluster/space loss slots so one train step serves all familes.
    """

    config: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        clip: jax.Array,  # (B, D, H, W, 3) in [0, 1]
        deterministic: bool = True,
        detach_cluster_input: Optional[bool] = None,
        compactness_gate: Optional[jax.Array] = None,
    ) -> VADOutput:
        """``compactness_gate`` (traced 0/1 scalar) implements the staged
        ``encoder_compatness()`` flip (ScheduleConfig.compactness_start_iter)
        without recompiles: gate=0 -> detached clustering + decode encoder
        features; gate=1 -> gradients flow and the decoder consumes
        assign@centers.  ``None`` keeps the static cfg.compactness behavior."""
        cfg = self.config
        if cfg.backbone != "swin":
            return self._alt_backbone(clip, deterministic)
        x, x_rec, taps = SwinEncoder3D(
            patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim,
            depths=cfg.encoder_depths,
            num_heads=cfg.encoder_heads,
            window_size=cfg.window_size,
            mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias,
            drop_rate=cfg.drop_rate,
            attn_drop_rate=cfg.attn_drop_rate,
            drop_path_rate=cfg.drop_path_rate,
            remat=cfg.remat,
            fused_attention=cfg.fused_attention,
            attn_kernel=cfg.attn_kernel,
            dtype=self.dtype,
            name="encoder",
        )(clip.astype(self.dtype), deterministic)

        latent_dim = int(cfg.embed_dim * 2 ** (len(cfg.encoder_depths) - 1))
        B, Dp, Hp, Wp, C = x.shape
        assert C == latent_dim

        if detach_cluster_input is None:
            detach_cluster_input = not cfg.compactness

        if cfg.use_cluster:
            if compactness_gate is not None and cfg.compactness:
                g = compactness_gate.astype(x.dtype)
                # d/dx of (g*x + (1-g)*sg(x)) is g: gradient flows iff gate on
                x_for_cluster = g * x + (1 - g) * jax.lax.stop_gradient(x)
            else:
                x_for_cluster = (
                    jax.lax.stop_gradient(x) if detach_cluster_input else x
                )
            fc = FeatureClusterHead(
                clusters=cfg.cluster.feature_clusters,
                alpha=cfg.cluster.feature_alpha,
                fused=cfg.fused_cluster,
                name="cluster1",
            )(x_for_cluster)
            sc = SpaceClusterHead(
                clusters=cfg.cluster.space_clusters,
                alpha=cfg.cluster.space_alpha,
                space_size=cfg.cluster.space_size,
                fused=cfg.fused_cluster,
                name="space_cluster",
            )(x_for_cluster)
            if fc.loss_sq_sum is not None:  # fused kernel reduced in VMEM
                cluster_loss = jnp.sqrt(fc.loss_sq_sum)
            else:
                cluster_loss = frobenius_norm(fc.distance * fc.assign)
            if sc.loss_sq_sum is not None:
                space_loss = jnp.sqrt(sc.loss_sq_sum)
            else:
                space_loss = frobenius_norm(sc.distance * sc.assign)
            if cfg.compactness:
                if compactness_gate is not None:
                    g = compactness_gate.astype(self.dtype)
                    x = g * fc.recon.astype(self.dtype) + (1 - g) * x
                else:
                    x = fc.recon.astype(self.dtype)
            feature = fc.feature
            feature_label = fc.labels
            cluster_assign: Optional[jax.Array] = fc.assign
            space_assign: Optional[jax.Array] = sc.assign
        else:
            cluster_loss = jnp.zeros((), jnp.float32)
            space_loss = jnp.zeros((), jnp.float32)
            feature = x.reshape(-1, C).astype(jnp.float32)
            feature_label = jnp.zeros((B * Dp * Hp * Wp,), jnp.int32)
            cluster_assign = None
            space_assign = None

        x = layer_norm(dtype=self.dtype, name="norm")(x)

        recon = SwinDecoder3D(
            in_chans=latent_dim,
            depths=cfg.decoder_depths,
            num_heads=cfg.decoder_heads,
            window_size=cfg.window_size,
            mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias,
            drop_rate=cfg.drop_rate,
            attn_drop_rate=cfg.attn_drop_rate,
            drop_path_rate=cfg.drop_path_rate,
            predict=cfg.predict,
            out_channels=cfg.in_channels,
            remat=cfg.remat,
            fused_attention=cfg.fused_attention,
            attn_kernel=cfg.attn_kernel,
            subpixel_deconv=cfg.subpixel_deconv,
            dtype=self.dtype,
            name="decoder",
        )(x, deterministic)

        return VADOutput(
            recon=recon,
            cluster_loss=cluster_loss,
            space_loss=space_loss,
            feature=feature,
            feature_label=feature_label,
            cluster_assign=cluster_assign,
            space_assign=space_assign,
        )

    def _alt_backbone(self, clip: jax.Array, deterministic: bool) -> VADOutput:
        """Alternative model families behind the same output contract."""
        from vadcl_tpu.models.conv_ae import ConvAE, ConvAEPredict
        from vadcl_tpu.models.unet3d import UNet3D

        cfg = self.config
        B = clip.shape[0]
        zero = jnp.zeros((), jnp.float32)
        if cfg.backbone == "unet3d":
            recon = UNet3D(
                num_channels=cfg.in_channels, dtype=self.dtype, name="unet3d"
            )(clip.astype(self.dtype))
            feat = recon.reshape(B, -1)[:, :1].astype(jnp.float32)
            return VADOutput(
                recon=recon,
                cluster_loss=zero,
                space_loss=zero,
                feature=feat,
                feature_label=jnp.zeros((B,), jnp.int32),
                cluster_assign=None,
                space_assign=None,
            )
        if cfg.backbone in ("convae", "convae_predict"):
            T = clip.shape[1]
            if cfg.backbone == "convae":
                net = ConvAE(
                    n_channel=cfg.in_channels,
                    t_length=T,
                    memory_size=cfg.memory_size,
                    key_dim=cfg.memory_dim,
                    dtype=self.dtype,
                    name="convae",
                )
            else:
                net = ConvAEPredict(
                    n_channel=cfg.in_channels,
                    t_length=T + 1,
                    memory_size=cfg.memory_size,
                    key_dim=cfg.memory_dim,
                    dtype=self.dtype,
                    name="convae",
                )
            out = net(clip.astype(self.dtype), train=not deterministic)
            d = out.feature.shape[-1]
            # separateness/compactness occupy the aux loss slots
            # (MNAD training adds them weighted, like the cluster losses)
            return VADOutput(
                recon=out.recon,
                cluster_loss=out.memory.separateness,
                space_loss=out.memory.compactness,
                feature=out.feature.reshape(-1, d).astype(jnp.float32),
                feature_label=jnp.zeros(
                    (out.feature.reshape(-1, d).shape[0],), jnp.int32
                ),
                cluster_assign=None,
                space_assign=None,
            )
        raise ValueError(f"unknown backbone {cfg.backbone!r}")
