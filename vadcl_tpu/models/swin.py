"""Video Swin 3D blocks (flax.linen), NDHWC.

Capability parity with the reference Swin machinery
(``model/swin_transformer.py:87-418`` and its duplicate in
``model/swin_decoder_predict.py:13-375``), rebuilt with the window math from
``vadcl_tpu.ops.window``: shift masks and relative-position indices are static
host constants, padding/rolling/partitioning are free reshapes under XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vadcl_tpu.models.layers import (
    DropPath,
    Mlp,
    layer_norm,
    torch_weight_init,
)
from vadcl_tpu.ops.convs import patchify_matmul
from vadcl_tpu.ops.pallas_attn_bwd import fused_window_attention_trainable
from vadcl_tpu.ops.pallas_mlp import fused_ln_mlp
from vadcl_tpu.ops.window import (
    compute_attn_mask,
    get_window_size,
    relative_position_index,
    window_attention,
    window_partition,
    window_reverse,
)

Tri = Tuple[int, int, int]


def _resolve_attn_kernel(attn_kernel: str, num_heads: int) -> str:
    """Resolve the per-geometry composite kernel name.

    ``fold_mix`` (inference-only) dispatches by stage geometry: the
    head-packed fold kernel's lane-packed dots win only where the packed
    score tile (N, nH*N) stays MXU-dense — measured on v5e to win at the
    flagship stage-1 geometry (nH=12, C=192) and lose at stage-0 (nH=6,
    C=96), see docs/PERFORMANCE.md "fold_packed A/B".  Every other name
    resolves to itself.
    """
    if attn_kernel == "fold_mix":
        return "fold_packed" if num_heads >= 12 else "fold"
    return attn_kernel


class WindowAttention3D(nn.Module):
    """W-MSA with relative position bias (``model/swin_transformer.py:87-171``).

    ``window_size`` here is the *configured* window (e.g. (8, 7, 7)); the bias
    table is sized for it and the (N, N) index is sliced when the runtime
    window is smaller — exactly the reference's ``[:N, :N]`` behavior.
    """

    dim: int
    window_size: Tri
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    fused: bool = False  # fused Pallas kernel (inference path; no VJP yet)
    n_windows: int = 1  # windows per image, needed by the fused kernel
    # "base" (trainable) | "packed" (inference-only) | "fold_packed"
    # (inference-only: fold layout + head-packed in-lane dots) | "fold"
    # (trainable;
    # partition/reverse folded into the kernel's BlockSpecs — SwinBlock3D
    # passes the un-partitioned 5D tensor via ``runtime_window``) |
    # "fold_block" (fold + the whole-block MLP tail via ``mlp=``; opt-in,
    # measured slower end-to-end on v5e — see SwinBlock3D)
    attn_kernel: str = "base"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_windows, mask: Optional[np.ndarray] = None,
                 deterministic: bool = True,
                 runtime_window: Optional[Tri] = None,
                 ln: Optional[Tuple[jax.Array, jax.Array]] = None,
                 mlp: Optional[Tuple[jax.Array, ...]] = None):
        wd, wh, ww = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), self.num_heads),
            jnp.float32,
        )
        qkv_w = self.param(
            "qkv_kernel", torch_weight_init, (self.dim, 3 * self.dim), jnp.float32
        )
        qkv_b = (
            self.param("qkv_bias", nn.initializers.zeros, (3 * self.dim,), jnp.float32)
            if self.qkv_bias
            else None
        )
        proj_w = self.param(
            "proj_kernel", torch_weight_init, (self.dim, self.dim), jnp.float32
        )
        proj_b = self.param(
            "proj_bias", nn.initializers.zeros, (self.dim,), jnp.float32
        )
        rel_index = relative_position_index(self.window_size)
        if self.fused:
            assert self.attn_drop == 0.0 or deterministic, (
                "fused attention kernel has no attention-dropout path; "
                "train with fused=False when attn_drop_rate > 0"
            )
            if runtime_window is not None:
                N = runtime_window[0] * runtime_window[1] * runtime_window[2]
            else:
                N = x_windows.shape[1]
            head_dim = self.dim // self.num_heads
            scale = self.qk_scale or head_dim**-0.5
            bias = table[np.asarray(rel_index[:N, :N]).reshape(-1)]
            bias = bias.reshape(N, N, -1).transpose(2, 0, 1)  # (nH, N, N)
            if runtime_window is not None:
                # folded path: x_windows is the un-partitioned (B, Dp, Hp, Wp,
                # C) tensor; partition/reverse happen inside the kernel's
                # block fetches (ops/pallas_attn_fold.py).  With ``ln`` the
                # block's norm1 and residual add fold in too.  Dispatch goes
                # through shard_windows_call: with an active model axis the
                # Hp window rows split over it (tensor parallelism for the
                # Pallas path, parallel/tp.py); otherwise it is the plain
                # single-device call.  On CPU the kernels run in interpret
                # mode (ops/window.py:pallas_interpret).
                from vadcl_tpu.ops.pallas_attn_fold import (
                    folded_block_attention_trainable,
                    folded_full_block_trainable,
                    folded_window_attention_trainable,
                    fused_window_attention_folded_packed,
                )
                from vadcl_tpu.ops.window import pallas_interpret
                from vadcl_tpu.parallel.tp import shard_windows_call

                interp = pallas_interpret()
                nh, rw = self.num_heads, runtime_window
                if _resolve_attn_kernel(
                    self.attn_kernel, self.num_heads
                ) == "fold_packed":
                    # fold layout + head-packed dots (inference-only, no
                    # VJP): heads stay in the lane dim, killing the per-head
                    # relayout copies; LN + residual fold in when ``ln``
                    ln_s = ln[0] if ln is not None else None
                    ln_b = ln[1] if ln is not None else None

                    def fold_call(xl, ml, _ls=ln_s, _lb=ln_b):
                        return fused_window_attention_folded_packed(
                            xl, qkv_w, qkv_b, proj_w, proj_b, bias, ml,
                            nh, rw, scale, interp,
                            ln_scale=_ls, ln_bias=_lb,
                            residual=_ls is not None,
                        )
                elif ln is not None and mlp is not None:
                    # whole Swin block in one kernel each way: LN1 + attn +
                    # residual + LN2 + MLP + residual (the backward chains
                    # MLP-vjp -> attn-vjp -> LN1-vjp entirely in VMEM)
                    def fold_call(xl, ml):
                        return folded_full_block_trainable(
                            xl, ln[0], ln[1], qkv_w, qkv_b, proj_w, proj_b,
                            bias, ml, mlp[0], mlp[1], mlp[2], mlp[3], mlp[4],
                            mlp[5], nh, rw, scale, interp,
                        )
                elif ln is not None:
                    def fold_call(xl, ml):
                        return folded_block_attention_trainable(
                            xl, ln[0], ln[1], qkv_w, qkv_b, proj_w, proj_b,
                            bias, ml, nh, rw, scale, interp,
                        )
                else:
                    def fold_call(xl, ml):
                        return folded_window_attention_trainable(
                            xl, qkv_w, qkv_b, proj_w, proj_b, bias, ml,
                            nh, rw, scale, interp,
                        )
                out = shard_windows_call(
                    fold_call, x_windows.astype(self.dtype), mask, rw
                )
            elif self.attn_kernel == "packed":
                # head-packed variant (ops/pallas_attn.py): inference-only
                # (no VJP); bench.py selects it when the chip's delivered
                # matmul rate makes its padded-FLOP trade win
                from vadcl_tpu.ops.pallas_attn import (
                    fused_window_attention_packed,
                )

                out = fused_window_attention_packed(
                    x_windows.astype(self.dtype),
                    qkv_w,
                    qkv_b,
                    proj_w,
                    proj_b,
                    bias,
                    jnp.asarray(mask) if mask is not None else None,
                    self.num_heads,
                    self.n_windows,
                    scale,
                )
            else:
                out = fused_window_attention_trainable(
                    x_windows.astype(self.dtype),
                    qkv_w,
                    qkv_b,
                    proj_w,
                    proj_b,
                    bias,
                    jnp.asarray(mask) if mask is not None else None,
                    self.num_heads,
                    self.n_windows,
                    scale,
                )
        else:
            out = window_attention(
                x_windows.astype(self.dtype),
                qkv_w,
                qkv_b,
                proj_w,
                proj_b,
                table,
                rel_index,
                self.num_heads,
                mask=mask,
                scale=self.qk_scale,
            )
        # attn_drop is inside the fused op's softmax path in the reference;
        # live rate is 0 — proj dropout kept for capability parity.
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class _LayerNormParams(nn.Module):
    """Param-only holder matching nn.LayerNorm's tree (scale, bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return scale, bias


class _DenseParams(nn.Module):
    """Param-only holder matching nn.Dense's tree (kernel, bias)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", torch_weight_init, (self.in_features, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class _MlpParams(nn.Module):
    """Param tree identical to Mlp's (mlp/fc1, mlp/fc2) without the compute,
    so fused and unfused blocks load the same checkpoints."""

    in_features: int
    hidden: int

    @nn.compact
    def __call__(self):
        return (
            _DenseParams(self.in_features, self.hidden, name="fc1")(),
            _DenseParams(self.hidden, self.in_features, name="fc2")(),
        )


class SwinBlock3D(nn.Module):
    """One Swin block: (shifted) window attention + MLP with residuals
    (``model/swin_transformer.py:174-277``)."""

    dim: int
    num_heads: int
    window_size: Tri = (2, 7, 7)
    shift_size: Tri = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    fused: bool = False
    attn_kernel: str = "base"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, D, H, W, C = x.shape
        window_size, shift_size = get_window_size(
            (D, H, W), self.window_size, self.shift_size
        )

        pad_d = (-D) % window_size[0]
        pad_h = (-H) % window_size[1]
        pad_w = (-W) % window_size[2]
        # block front half (LN + attn + residual) fused into ONE Pallas pass
        # when: fold kernel selected+applicable, no window padding (zero-pad
        # happens after LN in the reference, so LN cannot be folded across
        # it), and dropout/drop-path are identity
        _ak = _resolve_attn_kernel(self.attn_kernel, self.num_heads)
        fold_front = (
            self.fused
            and _ak in ("fold", "fold_block", "fold_packed")
            and not (pad_d or pad_h or pad_w)
            and (deterministic or (self.drop == 0.0 and self.drop_path == 0.0))
        )
        if fold_front:
            from vadcl_tpu.ops.pallas_attn_fold import (
                folded_attention_applicable,
                folded_packed_applicable,
            )

            _gate = (
                folded_packed_applicable
                if _ak == "fold_packed"
                else folded_attention_applicable
            )
            fold_front = _gate((D, H, W), window_size, self.num_heads)

        shortcut = x
        if fold_front:
            y = x  # LN lives inside the kernel
        else:
            y = layer_norm(dtype=self.dtype, name="norm1")(x)
            # pad to window multiples (trailing edges, like F.pad in :222-226)
            if pad_d or pad_h or pad_w:
                y = jnp.pad(
                    y, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0))
                )
        _, Dp, Hp, Wp, _ = y.shape

        if any(s > 0 for s in shift_size):
            y = jnp.roll(
                y, shift=(-shift_size[0], -shift_size[1], -shift_size[2]),
                axis=(1, 2, 3),
            )
            attn_mask = compute_attn_mask(Dp, Hp, Wp, window_size, shift_size)
        else:
            attn_mask = None

        n_windows = (
            (Dp // window_size[0])
            * (Hp // window_size[1])
            * (Wp // window_size[2])
        )
        use_fold = False
        if self.fused and _ak in ("fold", "fold_block", "fold_packed"):
            from vadcl_tpu.ops.pallas_attn_fold import (
                folded_attention_applicable,
                folded_packed_applicable,
            )

            _gate = (
                folded_packed_applicable
                if _ak == "fold_packed"
                else folded_attention_applicable
            )
            use_fold = _gate((Dp, Hp, Wp), window_size, self.num_heads)
        attn = WindowAttention3D(
            dim=C,
            window_size=self.window_size,  # configured size; index sliced to N
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            fused=self.fused,
            n_windows=n_windows,
            attn_kernel=self.attn_kernel,
            dtype=self.dtype,
            name="attn",
        )
        full_block = False
        if use_fold and fold_front:
            # whole block front half in one kernel pass: LN + partition +
            # attention + reverse + residual (ops/pallas_attn_fold.py).
            # LN and the residual add commute with the shift roll
            # (elementwise), so shifted blocks stay correct.
            ln_scale, ln_bias = _LayerNormParams(C, name="norm1")()
            # "fold_block" (opt-in): the MLP tail folds in too and the ENTIRE
            # block is one kernel each way.  Measured SLOWER end-to-end than
            # the default two-kernel split (fold front + fused_ln_mlp tail):
            # 205.7 -> 192.7 clips/s train, 687 -> 659 infer at flagship
            # geometry — the 512-token-tiled MLP kernel pipelines DMA/compute
            # across the whole tensor better than a per-row in-kernel tail.
            # Kept for A/B (tools/micro_bench.py) and future chips.
            tail_ok = deterministic or (
                self.drop == 0.0 and self.drop_path == 0.0
            )
            if tail_ok and _ak == "fold_block":
                from vadcl_tpu.ops.pallas_attn_fold import (
                    folded_full_block_applicable,
                )

                full_block = folded_full_block_applicable(
                    (Dp, Hp, Wp), window_size, self.num_heads,
                    C, int(C * self.mlp_ratio),
                )
            if full_block:
                # ... and when VMEM allows, the MLP tail folds in too: the
                # ENTIRE block is one kernel pass each way (per-token tail
                # commutes with the shift roll like LN/residual do)
                ln2_scale, ln2_bias = _LayerNormParams(C, name="norm2")()
                (w1, b1), (w2, b2) = _MlpParams(
                    C, int(C * self.mlp_ratio), name="mlp"
                )()
                y = attn(
                    y, mask=attn_mask, deterministic=deterministic,
                    runtime_window=window_size, ln=(ln_scale, ln_bias),
                    mlp=(ln2_scale, ln2_bias, w1, b1, w2, b2),
                )
            else:
                y = attn(
                    y, mask=attn_mask, deterministic=deterministic,
                    runtime_window=window_size, ln=(ln_scale, ln_bias),
                )
        elif use_fold:
            # partition/reverse live in the kernel's BlockSpecs — the
            # windows never exist as an HBM tensor (ops/pallas_attn_fold.py)
            y = attn(
                y, mask=attn_mask, deterministic=deterministic,
                runtime_window=window_size,
            )
        else:
            wins = window_partition(y, window_size)
            wins = attn(wins, mask=attn_mask, deterministic=deterministic)
            y = window_reverse(wins, window_size, B, Dp, Hp, Wp)

        if any(s > 0 for s in shift_size):
            y = jnp.roll(y, shift=shift_size, axis=(1, 2, 3))
        if pad_d or pad_h or pad_w:
            y = y[:, :D, :H, :W, :]

        if use_fold and fold_front:
            x = y  # residual already added in-kernel
            if full_block:
                return x  # the MLP tail ran in-kernel too
        else:
            x = shortcut + DropPath(self.drop_path, name="drop_path1")(
                y, deterministic=deterministic
            )
        # LN -> MLP -> residual tail.  The fused Pallas kernel keeps the
        # 4x-wide hidden activation and the LN stats in VMEM (the XLA chain is
        # HBM-bound on the hidden tensor); valid whenever the tail is
        # deterministic (dropout/drop-path are identity).  Param trees are
        # identical between paths, so checkpoints interchange freely.
        fuse_tail = self.fused and (
            deterministic or (self.drop == 0.0 and self.drop_path == 0.0)
        )
        if fuse_tail:
            ln_scale, ln_bias = _LayerNormParams(C, name="norm2")()
            (w1, b1), (w2, b2) = _MlpParams(
                C, int(C * self.mlp_ratio), name="mlp"
            )()
            from vadcl_tpu.ops.window import pallas_interpret
            from vadcl_tpu.parallel.tp import shard_tokens_call

            interp = pallas_interpret()

            def mlp_call(xl):
                return fused_ln_mlp(
                    xl, ln_scale, ln_bias, w1, b1, w2, b2, interp
                )

            # token-pointwise: with an active model axis the H rows split
            # over it — the same rows shard_windows_call split, so no
            # reshard happens between the block's two kernels
            x = shard_tokens_call(mlp_call, x.astype(self.dtype), 2)
        else:
            z = layer_norm(dtype=self.dtype, name="norm2")(x)
            z = Mlp(
                hidden_features=int(C * self.mlp_ratio),
                drop=self.drop,
                dtype=self.dtype,
                name="mlp",
            )(z, deterministic=deterministic)
            x = x + DropPath(self.drop_path, name="drop_path2")(
                z, deterministic=deterministic
            )
        return x


class SwinStage(nn.Module):
    """A stack of Swin blocks with alternating shift (BasicLayer parity,
    ``model/swin_transformer.py:336-418``; downsampling is external, as the
    reference disables PatchMerging at ``:546``)."""

    dim: int
    depth: int
    num_heads: int
    window_size: Tri = (8, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    remat: bool = False
    fused: bool = False
    attn_kernel: str = "base"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shift = tuple(w // 2 for w in self.window_size)
        dp = list(self.drop_path)
        if len(dp) == 1:
            dp = dp * self.depth
        block_cls = SwinBlock3D
        if self.remat:
            block_cls = nn.remat(SwinBlock3D, static_argnums=(2,))
        for i in range(self.depth):
            x = block_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=dp[i],
                fused=self.fused,
                attn_kernel=self.attn_kernel,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, deterministic)
        return x


class PatchEmbed3D(nn.Module):
    """Video-to-patch embedding: pad to patch multiples then
    Conv3d(k=s=patch_size) (``model/swin_transformer.py:421-462``)."""

    patch_size: Tri = (2, 4, 4)
    embed_dim: int = 96
    use_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        pd, ph, pw = self.patch_size
        pad = ((0, 0), (0, (-D) % pd), (0, (-H) % ph), (0, (-W) % pw), (0, 0))
        if any(p[1] for p in pad):
            x = jnp.pad(x, pad)
        w = self.param(
            "kernel",
            torch_weight_init,
            (pd, ph, pw, C, self.embed_dim),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32)
        # kernel == stride: one large MXU matmul instead of XLA's C_in=3 conv
        # path, which runs ~10x slower at this tiny input-channel count
        x = patchify_matmul(x.astype(self.dtype), w, b)
        if self.use_norm:
            x = layer_norm(dtype=self.dtype, name="norm")(x)
        return x
