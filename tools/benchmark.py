"""Component-level benchmark harness (elision-proof, remote-tunnel-safe).

`bench.py` is the driver-facing one-line headline; this tool breaks the
flagship down per component so optimization work targets real costs.

Timing methodology (see .claude/skills/verify/SKILL.md and memory notes):
on-device ``lax.fori_loop`` with a true data dependence between iterations
(x + acc * 1e-18 — a non-zero coefficient so XLA cannot sever the chain) and a
host readback at the end.  Remote-execution tunnels memoize identical
requests; ``x + 0*carry`` folds away and produces numbers above hardware peak.

Usage:  python tools/benchmark.py [--batch 32] [--fused] [--iters 8]
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


def bench_module(name, module, x, iters, method=None, grad=False):
    """Time forward (default) or forward+backward (``grad=True``, closing
    over params so the VJP covers both input and weight cotangents —
    the same work the train step pays per component)."""
    v = jax.jit(module.init)(jax.random.key(0), x)

    if grad:

        def loss(v_, x0):
            out = module.apply(v_, x0)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf.astype(jnp.float32))

        vg = jax.value_and_grad(loss)

        @jax.jit
        def rep(v, x):
            def body(i, carry):
                x0, acc = carry
                val, g = vg(v, x0 + acc * jnp.asarray(1e-18, x0.dtype))
                gleaf = jax.tree_util.tree_leaves(g)[0]
                return (
                    x0,
                    (val + jnp.sum(gleaf.astype(jnp.float32))).astype(x0.dtype),
                )

            return lax.fori_loop(0, iters, body, (x, jnp.zeros((), x.dtype)))[1]

    else:

        @jax.jit
        def rep(v, x):
            def body(i, carry):
                x0, acc = carry
                out = module.apply(v, x0 + acc * jnp.asarray(1e-18, x0.dtype))
                leaf = jax.tree_util.tree_leaves(out)[0]
                return (x0, jnp.sum(leaf).astype(x0.dtype))

            return lax.fori_loop(0, iters, body, (x, jnp.zeros((), x.dtype)))[1]

    out = rep(v, x)
    jax.block_until_ready(out)  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        out = rep(v, x)
        float(np.asarray(out.astype(jnp.float32)))
        best = min(best, (time.time() - t0) / iters * 1000)
    print(f"{name:32s} {best:8.2f} ms/batch{x.shape[0]}")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--attn-kernel", default="base",
        choices=("base", "packed", "fold", "fold_block", "fold_packed",
                 "fold_mix"),
    )
    ap.add_argument("--grad", action="store_true",
                    help="time forward+backward per component")
    args = ap.parse_args()

    from vadcl_tpu.models.cluster_heads import FeatureClusterHead, SpaceClusterHead
    from vadcl_tpu.models.decoder import PatchDebed3D, SwinDecoder3D
    from vadcl_tpu.models.encoder import SwinEncoder3D, inception_channels
    from vadcl_tpu.models.layers import InceptionModule
    from vadcl_tpu.models.swin import PatchEmbed3D, SwinStage

    B, K = args.batch, args.iters
    dt = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    rng = np.random.RandomState(0)
    clip = jnp.asarray(rng.rand(B, 4, 224, 224, 3), dt)
    x0 = jnp.asarray(rng.rand(B, 2, 56, 56, 96), dt)
    x1 = jnp.asarray(rng.rand(B, 2, 28, 28, 192), dt)
    d0 = jnp.asarray(rng.rand(B, 1, 28, 28, 192), dt)
    d1 = jnp.asarray(rng.rand(B, 1, 56, 56, 96), dt)
    f = args.fused
    ak = args.attn_kernel

    bench_module("patch_embed", PatchEmbed3D(dtype=dt), clip, K, grad=args.grad)
    bench_module(
        "enc stage0 (3 blocks)",
        SwinStage(dim=96, depth=3, num_heads=6, fused=f, attn_kernel=ak, dtype=dt), x0, K, grad=args.grad,
    )
    bench_module(
        "enc inception0",
        InceptionModule(out_channels=inception_channels(96), dtype=dt), x0, K, grad=args.grad,
    )
    bench_module(
        "enc stage1 (6 blocks)",
        SwinStage(dim=192, depth=6, num_heads=12, fused=f, attn_kernel=ak, dtype=dt), x1, K, grad=args.grad,
    )
    bench_module(
        "enc inception1",
        InceptionModule(out_channels=inception_channels(192), dtype=dt), x1, K, grad=args.grad,
    )
    bench_module("feature_cluster (xla)", FeatureClusterHead(), x1, K, grad=args.grad)
    bench_module("space_cluster (xla)", SpaceClusterHead(), x1, K, grad=args.grad)
    bench_module(
        "dec stage0 (6 blocks)",
        SwinStage(dim=192, depth=6, num_heads=12, fused=f, attn_kernel=ak, dtype=dt), d0, K, grad=args.grad,
    )
    bench_module(
        "dec stage1 (3 blocks)",
        SwinStage(dim=96, depth=3, num_heads=6, fused=f, attn_kernel=ak, dtype=dt), d1, K, grad=args.grad,
    )
    bench_module("patchdebed", PatchDebed3D(dtype=dt), d1, K, grad=args.grad)


if __name__ == "__main__":
    main()
