"""Per-chip attention-kernel selection (measure once, cache, reuse).

The fused window-attention kernels trade differently with the chip's
delivered matmul rate: ``packed`` spends ~2.8x padded FLOPs for ~6x
fewer/fatter MXU ops (wins on a fast chip, inference-only), ``fold``
eliminates the partition/reverse HBM round-trips (wins broadly, trainable).
On shared infrastructure the delivered rate swings session to session
(observed 43-117 TFLOP/s through the axon tunnel), so the right pick is a
*measurement*, not a constant.

``pick_attn_kernel()`` measures each kernel's FULL block path at the
flagship stage-0 geometry on the current device and returns the fastest
(requiring a >5% win before leaving the trainable default).
``tuned_attn_kernel()`` wraps it with a JSON cache keyed by device kind so
the ~20 s measurement runs once per chip type, not once per process.

Used by ``bench.py`` (fresh measurement every run — benchmarks must not
trust caches) and available to drivers via ``tools/autotune.py``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np

_DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "vadcl_tpu", "autotune.json"
)


def measure_attn_kernels(iters: int = 8) -> Dict[str, float]:
    """Seconds per fused-attention block pass, per kernel, at the flagship
    stage-0 geometry (B=32, 2x56x56x96, window (2,7,7)) — each measured as
    its FULL path: partition + kernel + reverse for the windowed kernels,
    the un-partitioned 5D tensor for the folded one."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vadcl_tpu.ops.pallas_attn import (
        fused_window_attention,
        fused_window_attention_packed,
    )
    from vadcl_tpu.ops.pallas_attn_fold import fused_window_attention_folded
    from vadcl_tpu.ops.window import window_partition, window_reverse

    rng = np.random.RandomState(5)
    B, D, H, W, C, nH = 32, 2, 56, 56, 96, 6
    window = (2, 7, 7)
    n_windows = (D // 2) * (H // 7) * (W // 7)
    x = jnp.asarray(rng.rand(B, D, H, W, C), jnp.bfloat16)
    qkv_w = jnp.asarray(rng.randn(C, 3 * C) * 0.02, jnp.float32)
    qkv_b = jnp.zeros((3 * C,), jnp.float32)
    proj_w = jnp.asarray(rng.randn(C, C) * 0.02, jnp.float32)
    proj_b = jnp.zeros((C,), jnp.float32)
    N = window[0] * window[1] * window[2]
    bias = jnp.asarray(rng.randn(nH, N, N) * 0.02, jnp.float32)
    sc = (C // nH) ** -0.5

    def timed(fn):
        jitted = jax.jit(
            lambda a0: lax.fori_loop(
                0,
                iters,
                lambda i, c: (
                    c[0],
                    jnp.sum(
                        fn(c[0] + c[1] * jnp.asarray(1e-18, c[0].dtype))
                    ).astype(c[0].dtype),
                ),
                (a0, jnp.zeros((), a0.dtype)),
            )[1]
        )
        out = jitted(x)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = jitted(x)
            float(np.asarray(out.astype(jnp.float32)))
            best = min(best, (time.time() - t0) / iters)
        return best

    def windowed(kernel):
        def run(a):
            aw = window_partition(a, window)
            o = kernel(
                aw, qkv_w, qkv_b, proj_w, proj_b, bias, None, nH,
                n_windows, sc,
            )
            return window_reverse(o, window, B, D, H, W)

        return run

    from vadcl_tpu.ops.pallas_attn_fold import (
        fused_window_attention_folded_packed,
    )

    return {
        "base": timed(windowed(fused_window_attention)),
        "packed": timed(windowed(fused_window_attention_packed)),
        "fold": timed(
            lambda a: fused_window_attention_folded(
                a, qkv_w, qkv_b, proj_w, proj_b, bias, None, nH, window, sc
            )
        ),
        "fold_packed": timed(
            lambda a: fused_window_attention_folded_packed(
                a, qkv_w, qkv_b, proj_w, proj_b, bias, None, nH, window, sc
            )
        ),
    }


def pick_attn_kernel(trainable_only: bool = False) -> str:
    """Measure on THIS device and return the fastest kernel name, requiring
    a clear (>5%) win before switching off the trainable default.  CPU has
    no fused path — returns "base".  ``trainable_only`` excludes ``packed``
    and ``fold_packed`` (they have no VJP)."""
    import jax

    if jax.default_backend() == "cpu":
        return "base"
    times = measure_attn_kernels()
    if trainable_only:
        times = {
            k: v for k, v in times.items()
            if k not in ("packed", "fold_packed")
        }
    best = min(times, key=times.get)
    return best if times[best] < 0.95 * times["base"] else "base"


def tuned_attn_kernel(
    trainable_only: bool = False,
    cache_path: Optional[str] = None,
    refresh: bool = False,
) -> str:
    """Cached ``pick_attn_kernel``: one measurement per device kind.

    The cache (JSON at ``~/.cache/vadcl_tpu/autotune.json``) stores both the
    trainable and unrestricted picks plus the raw timings for audit.  On any
    failure (no device, measurement error) falls back to "base"."""
    import jax

    if jax.default_backend() == "cpu":
        return "base"
    path = cache_path or _DEFAULT_CACHE
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return "base"
    key = f"{kind}|trainable={bool(trainable_only)}"
    cache = {}
    if not refresh and os.path.exists(path):
        try:
            with open(path) as f:
                cache = json.load(f)
        except Exception:
            cache = {}
        if key in cache and isinstance(cache[key], dict):
            return cache[key].get("pick", "base")
    try:
        times = measure_attn_kernels()
        pool = (
            {
                k: v for k, v in times.items()
                if k not in ("packed", "fold_packed")
            }
            if trainable_only
            else times
        )
        best = min(pool, key=pool.get)
        pick = best if pool[best] < 0.95 * pool["base"] else "base"
    except Exception:
        return "base"
    cache[key] = {"pick": pick, "times_s": times}
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass
    return pick
