"""3D convolution primitives with exact torch-semantics parity, NDHWC layout.

The reference's conv workload is nn.Conv3d / nn.ConvTranspose3d / MaxPool3d
(e.g. ``model/swin_transformer.py:438,575-585``, ``model/swin_decoder_predict.py:
381-443,591-595``, ``model/I3D.py:8-42,66-68``).  On TPU these lower to XLA
convolution HLOs that tile directly onto the MXU; we keep activations NDHWC
(channels-last, the native TPU layout) and kernels DHWIO.

Weight translation from torch:
  Conv3d weight  (Cout, Cin, kd, kh, kw)   -> transpose(2, 3, 4, 1, 0)
  ConvT3d weight (Cin, Cout, kd, kh, kw)   -> transpose(2, 3, 4, 0, 1)
(ConvTranspose kernels are stored un-flipped; the spatial flip happens at
apply time so the stored layout matches torch's semantics 1:1.)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
)

IntOr3 = Union[int, Sequence[int]]


def _triple(v: IntOr3) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    assert len(t) == 3, v
    return t  # type: ignore[return-value]


def conv3d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
) -> jax.Array:
    """torch.nn.Conv3d semantics. x: (B, D, H, W, C); w: (kd, kh, kw, Cin, Cout).

    No ``preferred_element_type`` override: TPU convs accumulate bf16 inputs in
    fp32 on the MXU regardless, and a forced fp32 output breaks the conv VJP
    under mixed precision (cotangent/operand dtype mismatch)."""
    s = _triple(stride)
    p = _triple(padding)
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=s,
        padding=[(pi, pi) for pi in p],
        dimension_numbers=_DN,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_transpose3d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
) -> jax.Array:
    """torch.nn.ConvTranspose3d semantics (output_padding=0).

    out_size = (in - 1) * stride - 2 * padding + kernel.  Implemented as the
    mathematically identical fractionally-strided convolution: dilate the
    input by ``stride`` (lhs_dilation), pad each dim by (k-1-p), convolve with
    the spatially-flipped kernel.  w: (kd, kh, kw, Cin, Cout) stored unflipped
    (matching torch's (Cin, Cout, k...) up to layout).
    """
    s = _triple(stride)
    p = _triple(padding)
    k = w.shape[:3]
    pads = [(k[i] - 1 - p[i], k[i] - 1 - p[i]) for i in range(3)]
    w_flipped = jnp.flip(w, axis=(0, 1, 2))
    out = lax.conv_general_dilated(
        x,
        w_flipped.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=pads,
        lhs_dilation=s,
        dimension_numbers=_DN,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def subpixel_applicable(
    kernel: Sequence[int], stride: Sequence[int], padding: Sequence[int]
) -> bool:
    """True when ``conv_transpose3d_subpixel`` computes the identical result:
    unit temporal stride, spatial kernel == spatial stride, zero spatial
    padding — every output pixel then receives exactly ONE spatial tap."""
    k, s, p = _triple(kernel), _triple(stride), _triple(padding)
    return s[0] == 1 and k[1] == s[1] and k[2] == s[2] and p[1] == p[2] == 0


def conv_transpose3d_subpixel(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
) -> jax.Array:
    """ConvTranspose3d as dense conv + pixel shuffle (exact, fewer FLOPs).

    The generic lowering (``conv_transpose3d``) dilates the input with zeros
    and convolves the full k_h x k_w spatial window — at the flagship's
    (3,2,2)/(1,2,2) decoder deconvs (``model/swin_decoder_predict.py:
    381-427,431-443`` equivalents) 3 of every 4 spatial taps are zeros the
    MXU still multiplies.  When ``subpixel_applicable`` holds, output pixel
    (s_h*h + r_h, s_w*w + r_w) receives exactly one spatial tap, so the op
    equals a stride-1 conv with kernel (kd, 1, 1) and s_h*s_w*Cout fused
    output channels followed by a space interleave: 4x fewer conv FLOPs and
    a fatter, MXU-friendlier contraction.  Bit-exact same math (the VJP is
    plain XLA autodiff of conv+reshape, so training matches too).
    """
    s = _triple(stride)
    p = _triple(padding)
    kd, kh, kw, cin, cout = w.shape
    assert subpixel_applicable((kd, kh, kw), s, p), (w.shape, s, p)
    # temporal convT at s_d=1 == correlation with the kd-flipped kernel and
    # symmetric padding (kd - 1 - p_d); spatial taps index by output parity
    w2 = jnp.flip(w, axis=0).transpose(0, 3, 1, 2, 4)  # (kd, ci, kh, kw, co)
    w2 = w2.reshape(kd, 1, 1, cin, kh * kw * cout)
    out = lax.conv_general_dilated(
        x,
        w2.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=[(kd - 1 - p[0],) * 2, (0, 0), (0, 0)],
        dimension_numbers=_DN,
    )
    B, D, H, W, _ = out.shape
    out = out.reshape(B, D, H, W, kh, kw, cout)
    out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        B, D, H * kh, W * kw, cout
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def patchify_matmul(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
) -> jax.Array:
    """Conv3d with kernel == stride (non-overlapping), as reshape + matmul.

    Mathematically identical to ``conv3d(x, w, b, stride=kernel)`` but maps to
    one large MXU matmul instead of a tiny-input-channel convolution (XLA's
    conv path runs at ~1% peak when C_in=3; this runs at matmul speed).
    x: (B, D, H, W, C) with D,H,W divisible by the kernel; w: (kd,kh,kw,Cin,Cout).
    """
    kd, kh, kw, cin, cout = w.shape
    B, D, H, W, C = x.shape
    assert C == cin and D % kd == 0 and H % kh == 0 and W % kw == 0
    x = x.reshape(B, D // kd, kd, H // kh, kh, W // kw, kw, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # B, D', H', W', kd, kh, kw, C
    x = x.reshape(B, D // kd, H // kh, W // kw, kd * kh * kw * C)
    wm = w.reshape(kd * kh * kw * cin, cout).astype(x.dtype)
    out = jnp.einsum(
        "bdhwk,ko->bdhwo", x, wm, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def unpatchify_matmul(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
) -> jax.Array:
    """ConvTranspose3d with kernel == stride, as matmul + pixel-shuffle.

    Identical to ``conv_transpose3d(x, w, b, stride=kernel)`` (non-overlapping
    taps -> every output element receives exactly one contribution).
    w: (kd, kh, kw, Cin, Cout) in the same storage layout as conv_transpose3d.
    """
    kd, kh, kw, cin, cout = w.shape
    B, D, H, W, C = x.shape
    assert C == cin
    wm = w.transpose(3, 0, 1, 2, 4).reshape(cin, kd * kh * kw * cout)
    out = jnp.einsum(
        "bdhwc,ck->bdhwk", x, wm.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    out = out.reshape(B, D, H, W, kd, kh, kw, cout)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    out = out.reshape(B, D * kd, H * kh, W * kw, cout)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def same_pad_amounts(size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """TF-style 'same' padding split, exactly as MaxPool3dSamePadding computes
    it (``model/I3D.py:10-39``): total = k - s if evenly divisible else
    k - (size % s), clamped at 0, front = total // 2."""
    if size % stride == 0:
        total = max(kernel - stride, 0)
    else:
        total = max(kernel - (size % stride), 0)
    front = total // 2
    return front, total - front


def max_pool3d_same(
    x: jax.Array, kernel: IntOr3 = 3, stride: IntOr3 = 1
) -> jax.Array:
    """MaxPool3dSamePadding parity (``model/I3D.py:8-42``).

    NOTE the reference pads with **zeros** (F.pad default) before max-pooling,
    not -inf — with GELU activations this changes boundary values, so we
    reproduce the zero-padding faithfully.
    """
    k = _triple(kernel)
    s = _triple(stride)
    _, D, H, W, _ = x.shape
    pads = [
        same_pad_amounts(D, k[0], s[0]),
        same_pad_amounts(H, k[1], s[1]),
        same_pad_amounts(W, k[2], s[2]),
    ]
    x = jnp.pad(
        x,
        ((0, 0), pads[0], pads[1], pads[2], (0, 0)),
        mode="constant",
        constant_values=0.0,
    )
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, *k, 1),
        window_strides=(1, *s, 1),
        padding="VALID",
    ).astype(x.dtype)
