"""Micro-benchmark of Swin-block internals at the flagship stage geometries.

Breaks one SwinBlock3D into its constituent ops (layer norms, MLP, window
partition/reverse, rolls, the attention kernel itself) so optimization work
targets the true cost, not the assumed one.  Same elision-proof carry-chain
methodology as tools/benchmark.py.

Usage: python tools/micro_bench.py [--batch 32] [--iters 8] [--stage 0|1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def bench_fn(name, fn, *args, iters=8, gflops=None):
    """Time fn(*args) with a data-dependent carry so nothing folds away."""
    jitted = jax.jit(
        lambda a0, rest: lax.fori_loop(
            0,
            iters,
            lambda i, carry: (
                carry[0],
                jnp.sum(
                    jax.tree_util.tree_leaves(
                        fn(carry[0] + carry[1] * jnp.asarray(1e-18, carry[0].dtype), *rest)
                    )[0]
                ).astype(carry[0].dtype),
            ),
            (a0, jnp.zeros((), a0.dtype)),
        )[1]
    )
    out = jitted(args[0], args[1:])
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        out = jitted(args[0], args[1:])
        float(np.asarray(out.astype(jnp.float32)))
        best = min(best, (time.time() - t0) / iters * 1000)
    extra = ""
    if gflops:
        extra = f"  {gflops / best:8.1f} GFLOP/s ({gflops / best / 197e3 * 100:4.2f}% v5e peak)"
    print(f"{name:36s} {best:8.3f} ms{extra}")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stage", type=int, default=0)
    args = ap.parse_args()

    from vadcl_tpu.models.layers import Mlp, layer_norm
    from vadcl_tpu.models.swin import SwinBlock3D
    from vadcl_tpu.ops.pallas_attn import (
        fused_window_attention,
        fused_window_attention_packed,
    )
    from vadcl_tpu.ops.window import (
        get_window_size,
        window_attention,
        window_partition,
        window_reverse,
        relative_position_index,
    )

    B, K = args.batch, args.iters
    dt = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    rng = np.random.RandomState(0)
    if args.stage == 0:
        D, H, W, C, nH = 2, 56, 56, 96, 6
    else:
        D, H, W, C, nH = 2, 28, 28, 192, 12
    x = jnp.asarray(rng.rand(B, D, H, W, C), dt)
    win, _ = get_window_size((D, H, W), (8, 7, 7), (4, 3, 3))
    N = win[0] * win[1] * win[2]
    n_windows = (D // win[0]) * (H // win[1]) * (W // win[2])
    wins_x = jnp.asarray(rng.rand(B * n_windows, N, C), dt)
    qkv_w = jnp.asarray(rng.randn(C, 3 * C) * 0.02, jnp.float32)
    qkv_b = jnp.zeros((3 * C,), jnp.float32)
    proj_w = jnp.asarray(rng.randn(C, C) * 0.02, jnp.float32)
    proj_b = jnp.zeros((C,), jnp.float32)
    bias = jnp.asarray(rng.randn(nH, N, N) * 0.02, jnp.float32)
    table = jnp.asarray(rng.randn(15 * 13 * 13, nH) * 0.02, jnp.float32)
    rel_idx = relative_position_index((8, 7, 7))

    tokens = B * D * H * W
    print(f"stage{args.stage}: x{tuple(x.shape)} windows {n_windows}x N={N}")

    ln = layer_norm(dtype=dt)
    lnv = jax.jit(ln.init)(jax.random.key(0), x)
    bench_fn("layer_norm", lambda a: ln.apply(lnv, a), x, iters=K)

    mlp = Mlp(hidden_features=4 * C, dtype=dt)
    mlpv = jax.jit(mlp.init)(jax.random.key(0), x)
    mlp_gflops = 2 * 2 * tokens * C * 4 * C / 1e6
    bench_fn(
        "mlp (2 matmuls + gelu)", lambda a: mlp.apply(mlpv, a), x,
        iters=K, gflops=mlp_gflops,
    )

    bench_fn(
        "partition+reverse",
        lambda a: window_reverse(
            window_partition(a, win), win, B, D, H, W
        ),
        x, iters=K,
    )
    bench_fn(
        "roll+unroll",
        lambda a: jnp.roll(
            jnp.roll(a, (-1, -3, -3), (1, 2, 3)), (1, 3, 3), (1, 2, 3)
        ),
        x, iters=K,
    )

    attn_gflops = (
        (2 * B * n_windows * nH * N * N * (C // nH) * 2  # scores + attn@v
         + 2 * B * n_windows * N * C * 3 * C  # qkv
         + 2 * B * n_windows * N * C * C) / 1e6  # proj
    )
    bench_fn(
        "fused attention kernel",
        lambda a: fused_window_attention(
            a, qkv_w, qkv_b, proj_w, proj_b, bias, None, nH, n_windows,
            (C // nH) ** -0.5,
        ),
        wins_x, iters=K, gflops=attn_gflops,
    )
    bench_fn(
        "packed attention kernel",
        lambda a: fused_window_attention_packed(
            a, qkv_w, qkv_b, proj_w, proj_b, bias, None, nH, n_windows,
            (C // nH) ** -0.5,
        ),
        wins_x, iters=K, gflops=attn_gflops,
    )
    bench_fn(
        "xla window_attention",
        lambda a: window_attention(
            a, qkv_w, qkv_b, proj_w, proj_b, table, rel_idx, nH
        ),
        wins_x, iters=K, gflops=attn_gflops,
    )

    # folded family: reads the UN-partitioned tensor (BlockSpec partition)
    from vadcl_tpu.ops.pallas_attn_fold import (
        folded_full_block_trainable,
        fused_window_attention_folded,
    )

    bench_fn(
        "folded attention kernel",
        lambda a: fused_window_attention_folded(
            a, qkv_w, qkv_b, proj_w, proj_b, bias, None, nH, win,
            (C // nH) ** -0.5,
        ),
        x, iters=K, gflops=attn_gflops,
    )
    ln_s = jnp.ones((C,), jnp.float32)
    ln_b = jnp.zeros((C,), jnp.float32)
    w1 = jnp.asarray(rng.randn(C, 4 * C) * 0.02, jnp.float32)
    b1 = jnp.zeros((4 * C,), jnp.float32)
    w2 = jnp.asarray(rng.randn(4 * C, C) * 0.02, jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)
    blk_gflops = attn_gflops + mlp_gflops
    bench_fn(
        "whole-block kernel (fwd)",
        lambda a: folded_full_block_trainable(
            a, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, bias, None,
            ln_s, ln_b, w1, b1, w2, b2, nH, win, (C // nH) ** -0.5,
        ),
        x, iters=K, gflops=blk_gflops,
    )
    bench_fn(
        "whole-block kernel (fwd+bwd)",
        lambda a: jax.grad(
            lambda xx: jnp.sum(
                folded_full_block_trainable(
                    xx, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, bias,
                    None, ln_s, ln_b, w1, b1, w2, b2, nH, win,
                    (C // nH) ** -0.5,
                ).astype(jnp.float32)
            )
        )(a),
        x, iters=K, gflops=3 * blk_gflops,
    )

    for fused in (True, False):
        blk = SwinBlock3D(
            dim=C, num_heads=nH, window_size=(8, 7, 7), fused=fused, dtype=dt
        )
        blkv = jax.jit(blk.init)(jax.random.key(0), x)
        bench_fn(
            f"full block (fused={fused})",
            lambda a, _b=blk, _v=blkv: _b.apply(_v, a),
            x, iters=K,
        )
        blk_s = SwinBlock3D(
            dim=C, num_heads=nH, window_size=(8, 7, 7),
            shift_size=(4, 3, 3), fused=fused, dtype=dt,
        )
        blkv_s = jax.jit(blk_s.init)(jax.random.key(0), x)
        bench_fn(
            f"full shifted block (fused={fused})",
            lambda a, _b=blk_s, _v=blkv_s: _b.apply(_v, a),
            x, iters=K,
        )


if __name__ == "__main__":
    main()
