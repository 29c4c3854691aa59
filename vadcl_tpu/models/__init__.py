from vadcl_tpu.models.layers import (
    DropPath,
    FrozenBatchNorm,
    InceptionModule,
    Mlp,
    Unit3D,
)
from vadcl_tpu.models.swin import PatchEmbed3D, SwinBlock3D, SwinStage, WindowAttention3D
from vadcl_tpu.models.encoder import SwinEncoder3D
from vadcl_tpu.models.decoder import LegacySwinDecoder, PatchDebed3D, SwinDecoder3D, UpSampling
from vadcl_tpu.models.cluster_heads import FeatureClusterHead, SpaceClusterHead
from vadcl_tpu.models.backbone import VADModel, VADOutput
from vadcl_tpu.models.unet3d import UNet3D
from vadcl_tpu.models.memory import MemoryModule
from vadcl_tpu.models.conv_ae import ConvAE, ConvAEPredict

__all__ = [
    "DropPath",
    "FrozenBatchNorm",
    "InceptionModule",
    "Mlp",
    "Unit3D",
    "PatchEmbed3D",
    "SwinBlock3D",
    "SwinStage",
    "WindowAttention3D",
    "SwinEncoder3D",
    "LegacySwinDecoder",
    "PatchDebed3D",
    "SwinDecoder3D",
    "UpSampling",
    "FeatureClusterHead",
    "SpaceClusterHead",
    "VADModel",
    "VADOutput",
    "UNet3D",
    "MemoryModule",
    "ConvAE",
    "ConvAEPredict",
]
