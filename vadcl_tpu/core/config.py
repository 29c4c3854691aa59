"""Typed configuration tree.

The reference scatters its configuration over per-entry-point argparse parsers
with copy-paste drift and comment-toggled dataset paths
(``main_predict.py:58-132``, ``tool/contrast_evaluae.py:93-105``) plus magic
constants in code (cluster sizes/alphas at ``model/backbone.py:40-42``, staged
iteration thresholds at ``main_predict.py:244-257``).  Here all of that becomes
one immutable dataclass tree with per-dataset presets.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class ClusterConfig:
    """Dual clustering heads (reference ``model/backbone.py:40-42``).

    feature head:  K=1024 centers over 192-d tokens, alpha=16
    spatial head:  per-channel, K=128 centers over 28*28 spatial maps, alpha=32
    """

    feature_clusters: int = 1024
    feature_alpha: float = 16.0
    space_clusters: int = 128
    space_alpha: float = 32.0
    space_size: int = 28  # spatial side of the latent grid the space head sees


@dataclass(frozen=True)
class ModelConfig:
    """Hybrid Video-Swin-3D + I3D-Inception autoencoder.

    Mirrors the capability surface of ``model/swin_transformer.py:466-508`` and
    ``model/swin_decoder_predict.py:479-508``: 2-stage encoder depths [3, 6]
    heads [6, 12], mirrored decoder depths [6, 3] heads [12, 6], window
    (8, 7, 7), patch (2, 4, 4), embed dim 96, conv (not PatchMerging)
    downsampling, attention x conv fusion ``attn + attn*conv + x``.
    """

    backbone: str = "swin"  # swin | unet3d | convae | convae_predict
    in_channels: int = 3
    embed_dim: int = 96
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    encoder_depths: Tuple[int, ...] = (3, 6)
    encoder_heads: Tuple[int, ...] = (6, 12)
    decoder_depths: Tuple[int, ...] = (6, 3)
    decoder_heads: Tuple[int, ...] = (12, 6)
    window_size: Tuple[int, int, int] = (8, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    predict: bool = False  # next-frame prediction vs reconstruction decoder
    use_cluster: bool = True
    compactness: bool = True  # decode from cluster reconstruction (assign @ centers)
    cluster: ClusterConfig = field(default_factory=ClusterConfig)
    remat: bool = False  # jax.checkpoint per Swin block (reference use_checkpoint)
    fused_attention: bool = False  # Pallas fused window attention (inference)
    fused_cluster: bool = False  # Pallas fused cluster assignment
    # which fused attention kernel: "base" (per-head dots, trainable via its
    # custom VJP), "packed" (head-packed block-diagonal dots — fewer, fatter
    # MXU ops at ~2.8x padded FLOPs; wins on a full-rate chip, INFERENCE-ONLY:
    # it has no VJP), or "fold" (trainable; window partition/reverse folded
    # into the kernel's BlockSpecs — kills two HBM activation round-trips per
    # Swin block, measured 1.17-1.19x over "base" at flagship geometry; its
    # BACKWARD is folded too, whole train step 167 -> 155 ms at batch 32), or
    # "fold_block" (fold + in-kernel MLP tail: the entire Swin block is ONE
    # kernel each way; opt-in — measured slower end-to-end than fold's
    # two-kernel split on v5e, kept for A/B and future chips).
    # bench.py auto-picks per same-run chip calibration.
    attn_kernel: str = "base"
    # decoder transposed convs as dense-conv + pixel shuffle where exact
    # (ops/convs.conv_transpose3d_subpixel): same math, 4x fewer conv FLOPs
    # than the lhs-dilated lowering IF the TPU conv emitter multiplies the
    # zero taps — measurement-gated, hence opt-in.
    subpixel_deconv: bool = False
    # memory-augmented alternates (reference model/Memory.py:63, conv_mae/*)
    memory_size: int = 10
    memory_dim: int = 512

    def __post_init__(self):
        # construction-time guard: the fused Pallas attention kernel has no
        # attention-dropout path (live reference rate is 0); without this a
        # fused run with attn_drop_rate > 0 would silently skip dropout.
        if self.fused_attention and self.attn_drop_rate > 0.0:
            raise ValueError(
                "fused_attention=True has no attention-dropout path; set "
                "attn_drop_rate=0 or fused_attention=False "
                f"(got attn_drop_rate={self.attn_drop_rate})"
            )
        if self.attn_kernel not in ATTN_KERNELS:
            raise ValueError(
                f"unknown attn_kernel {self.attn_kernel!r}; valid kernels: "
                f"{sorted(ATTN_KERNELS)}"
            )


# The fused window-attention kernel families (ops/pallas_attn*.py) and which
# of them carry a custom VJP.  A config naming anything else is a typo that
# would otherwise silently fall back or die deep inside a Pallas trace.
ATTN_KERNELS = frozenset(
    {"base", "packed", "fold", "fold_block", "fold_packed", "fold_mix"}
)
TRAINABLE_ATTN_KERNELS = frozenset({"base", "fold", "fold_block"})


@dataclass(frozen=True)
class DataConfig:
    """Clip dataset semantics (reference ``dataset/utils_dataset.py:55-148``)."""

    name: str = "shanghaitech"
    data_path: str = ""
    test_data_path: str = ""
    label_path: str = ""
    frame_num: int = 4
    image_size: Tuple[int, int] = (224, 224)
    num_workers: int = 8
    prefetch: int = 2


@dataclass(frozen=True)
class OptimConfig:
    """Adam + cosine schedule (reference ``main_predict.py:180-185``).

    torch.optim.Adam(lr, weight_decay=0.02) adds ``wd * param`` to the gradient
    *before* the moment updates (L2, not decoupled AdamW); the timm
    CosineLRScheduler steps once per epoch.
    """

    optimizer: str = "adam"  # adam | adamw | sgd (reference --optimizer)
    lr: float = 6e-6
    min_lr: float = 1e-6
    weight_decay: float = 0.02
    epochs: int = 120
    warmup_epochs: int = 0
    clip_grad: float = 0.0  # 0 disables (reference never applies its --clip_grad)
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


@dataclass(frozen=True)
class ScheduleConfig:
    """Staged-training mode flips (reference ``main_predict.py:244-257``).

    In the maintained v2 trainer everything flips on at data_iter == 0:
    cluster_on + cluster_center_on + encoder_compatness + freeze_bn.  The v1
    trainer enabled the cluster head at iteration 500 (``main.py:181-183``);
    both are expressible here.
    """

    cluster_start_iter: int = 0  # iteration at which cluster losses turn on
    cluster_train_start_iter: int = 0  # iteration at which cluster centers train
    # iteration at which compactness engages: before it, cluster inputs are
    # stop-gradiented and the decoder consumes encoder features; from it, the
    # decoder consumes assign@centers with gradients flowing (the reference's
    # encoder_compatness() flip). Requires ModelConfig.compactness=True.
    compactness_start_iter: int = 0
    # NOTE: BatchNorm is always frozen-stats — the live reference freezes every
    # BN at iteration 0 (misc/utils.py:205, main_predict.py:257); there is no
    # trainable-BN mode to configure.
    # loss weights; the reference adds the terms unweighted
    # (main_predict.py:284) but notes a working range of 1e4-2e4
    # in 实验小笔记.txt:2 — expose them as knobs.
    recon_weight: float = 1.0
    cluster_weight: float = 1.0
    space_weight: float = 1.0


@dataclass(frozen=True)
class EvalConfig:
    """Scoring protocols (reference §3.3 of SURVEY.md).

    protocol: "stride1" (main_predict.py:401-404 / tool/predict_evaluae.py),
    "nonoverlap" (tool/evaluate.py:166-169 and tool/contrast_evaluae.py
    batched windows), applied per whole test video; scores are per-frame
    PSNR -> per-video min-max anomaly score -> per-scene-averaged AUROC.
    """

    protocol: str = "stride1"
    batch_windows: int = 8  # windows batched per device step


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh. Pure data parallelism is parity (SURVEY §2.3); the axes
    are laid out so tensor/sequence axes can be added later without reshaping
    the program."""

    data_axis: str = "data"
    num_devices: int = 0  # 0 = all available


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    schedule: ScheduleConfig = field(default_factory=ScheduleConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    seed: int = 0
    batch_size_per_device: int = 4
    output_dir: str = "log_dir"
    save_every_epochs: int = 1
    save_every_iters: int = 0  # reference also saved every 10 iters (main_predict.py:339)
    # periodic input+recon JPEG dump, the reference's routine "is it learning"
    # visual check (every 10 iters, main_predict.py:265-267 -> misc/utils.py:21-48);
    # 0 disables.  Dumps land in <output_dir>/video_show{,_origin}/.
    dump_every_iters: int = 0
    bf16: bool = True  # bf16 compute / fp32 params+reductions

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


_PRESETS: Dict[str, Dict[str, Any]] = {
    # Dataset presets replace the comment-toggled path blocks of the reference
    # (main_predict.py:93-113). Paths are filled in by the user/env.
    "shanghaitech": dict(
        data=DataConfig(name="shanghaitech", frame_num=4),
    ),
    "avenue": dict(
        data=DataConfig(name="avenue", frame_num=4),
    ),
    "ped2": dict(
        data=DataConfig(name="ped2", frame_num=4),
    ),
    # tiny synthetic config used by tests and the minimum end-to-end slice
    "tiny": dict(
        model=ModelConfig(
            embed_dim=32,
            encoder_depths=(1, 1),
            encoder_heads=(2, 4),
            decoder_depths=(1, 1),
            decoder_heads=(4, 2),
            window_size=(8, 7, 7),
            cluster=ClusterConfig(
                feature_clusters=16, space_clusters=8, space_size=7
            ),
        ),
        data=DataConfig(name="tiny", frame_num=4, image_size=(56, 56)),
        batch_size_per_device=2,
    ),
}


def preset(name: str, **overrides: Any) -> Config:
    """Build a Config from a named per-dataset preset."""
    if name not in _PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(_PRESETS)}")
    cfg = Config(**_PRESETS[name])
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg
