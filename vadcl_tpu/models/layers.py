"""Shared building-block modules (flax.linen), NDHWC throughout.

Covers the reference's generic layers: Mlp (``model/swin_transformer.py:17-35``),
timm DropPath, the permanently-eval BatchNorm (``model/I3D.py:74-76`` +
``misc/utils.py:205``), Unit3D / InceptionModule / same-padded max-pool
(``model/I3D.py:8-136``).

Weight init follows torch's defaults (kaiming-uniform fan-in for conv/linear
weights) because the reference never calls its trunc-normal ``init_weights``
path on the live model; biases init to zero (documented deviation — torch uses
uniform fan-in bias init, irrelevant to capability parity).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vadcl_tpu.ops.convs import (
    conv3d,
    conv_transpose3d,
    conv_transpose3d_subpixel,
    max_pool3d_same,
    patchify_matmul,
    subpixel_applicable,
    unpatchify_matmul,
)

# torch kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_weight_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch nn.GELU/F.gelu default, not the tanh approx."""
    return jax.nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    """fc1 -> GELU -> drop -> fc2 -> drop (``model/swin_transformer.py:17-35``)."""

    hidden_features: int
    out_features: Optional[int] = None
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(
            self.hidden_features,
            kernel_init=torch_weight_init,
            dtype=self.dtype,
            name="fc1",
        )(x)
        # model-axis parallelism: the 4x hidden width shards over the mesh's
        # model axis when one is active (parallel/tp.py) — no-op otherwise
        from vadcl_tpu.parallel.tp import shard_dim

        x = shard_dim(x, -1)
        x = gelu(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(
            out_features,
            kernel_init=torch_weight_init,
            dtype=self.dtype,
            name="fc2",
        )(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics).  The live
    reference runs rate 0 (``model/swin_transformer.py:504``); provided for
    capability parity."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always normalizes with stored running statistics.

    The reference constructs its BN in eval mode (``model/I3D.py:74-76``) and
    re-freezes every BN at iteration 0 (``main_predict.py:257`` via
    ``misc/utils.py:205``), so it permanently normalizes with the *init*
    running stats (mean 0, var 1) — an affine ``gamma * x / sqrt(1 + eps) +
    beta`` whose gamma/beta still train.  Stats live in the ``batch_stats``
    collection so translated torch checkpoints can load real running stats.
    """

    eps: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        inv = jax.lax.rsqrt(var.value + self.eps) * scale
        y = (x.astype(jnp.float32) - mean.value) * inv + bias
        return y.astype(self.dtype)


class Conv3d(nn.Module):
    """torch.nn.Conv3d-parity conv over NDHWC; kernel stored DHWIO."""

    features: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            torch_weight_init,
            (*self.kernel_size, cin, self.features),
            jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        # NOTE: a reshape+matmul path for k==s convs was measured SLOWER than
        # XLA's conv lowering on TPU (transposes with tiny lane dims dominate);
        # see ops/convs.patchify_matmul for the primitive and tests.
        return conv3d(
            x.astype(self.dtype), w, b, stride=self.stride, padding=self.padding
        )


class ConvTranspose3d(nn.Module):
    """torch.nn.ConvTranspose3d-parity transposed conv; kernel stored
    (kd, kh, kw, Cin, Cout) unflipped (see ops/convs.py)."""

    features: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    use_bias: bool = True
    # exact pixel-shuffle decomposition (ops/convs.conv_transpose3d_subpixel)
    # when applicable; identical params/results, different op schedule
    subpixel: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            torch_weight_init,
            (*self.kernel_size, cin, self.features),
            jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        fn = (
            conv_transpose3d_subpixel
            if self.subpixel
            and subpixel_applicable(self.kernel_size, self.stride, self.padding)
            else conv_transpose3d
        )
        return fn(
            x.astype(self.dtype), w, b, stride=self.stride, padding=self.padding
        )


class Unit3D(nn.Module):
    """Conv3d (+frozen BN) (+GELU) — ``model/I3D.py:53-94``.

    Faithfully keeps the reference's quirks: the explicit ``padding`` argument
    zero-pads even 1x1x1 convs (``model/I3D.py:109,114`` pass padding=1), and
    the BN is the frozen-stats variant above with eps=0.001.
    """

    features: int
    kernel_size: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: int = 0
    use_batch_norm: bool = True
    use_bias: bool = False
    activation: Optional[Callable] = gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = (self.padding,) * 3 if isinstance(self.padding, int) else self.padding
        x = Conv3d(
            self.features,
            self.kernel_size,
            self.stride,
            p,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv3d",
        )(x)
        if self.use_batch_norm:
            x = FrozenBatchNorm(eps=1e-3, dtype=self.dtype, name="bn")(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class InceptionModule(nn.Module):
    """4-branch I3D Inception block (``model/I3D.py:102-135``).

    out_channels = [b0, b1a, b1b, b2a, b2b, b3b]; output channels =
    b0 + b1b + b2b + b3b.  Branches b1/b2 reproduce the reference's
    pad-1-then-valid-3x3x3 shape dance; b3 is zero-padded same max-pool.
    """

    out_channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        oc = self.out_channels
        b0 = Unit3D(oc[0], (1, 1, 1), padding=0, dtype=self.dtype, name="b0")(x)
        b1 = Unit3D(oc[1], (1, 1, 1), padding=1, dtype=self.dtype, name="b1a")(x)
        b1 = Unit3D(oc[2], (3, 3, 3), padding=0, dtype=self.dtype, name="b1b")(b1)
        b2 = Unit3D(oc[3], (1, 1, 1), padding=1, dtype=self.dtype, name="b2a")(x)
        b2 = Unit3D(oc[4], (3, 3, 3), padding=0, dtype=self.dtype, name="b2b")(b2)
        b3 = max_pool3d_same(x, kernel=3, stride=1)
        b3 = Unit3D(oc[5], (1, 1, 1), padding=0, dtype=self.dtype, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def layer_norm(dtype: jnp.dtype = jnp.float32, name: Optional[str] = None):
    """torch.nn.LayerNorm parity: eps 1e-5, elementwise affine, fp32 params."""
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32, name=name)
