"""Benchmark: flagship end-to-end inference throughput, clips/sec/chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

Workload: the flagship Swin+I3D clustering VAD model in next-frame-prediction
mode (cluster heads ON, compactness ON — the eval-time configuration of
``tool/contrast_evaluae.py:163-165``), scoring 4-frame 224x224 windows exactly
as the sliding-window evaluator feeds them, bf16 compute, best batch size of a
small sweep.

Baseline for ``vs_baseline``: the PyTorch reference publishes NO throughput
numbers (BASELINE.md) and its flagship model cannot even import in this image
(requires mmcv/timm).  The only runnable piece of the reference is its UNet3D
backbone (``/root/reference/model/unet3D.py``, torch CPU).  We therefore
measure the torch-CPU reference UNet3D on the same input shape as a
conservative proxy baseline and report the ratio; the proxy value is cached in
``.bench_baseline.json`` after the first run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")
FRAMES, H, W = 4, 224, 224


def measure_torch_baseline() -> float:
    """Torch-CPU reference UNet3D clips/sec on (1, 3, FRAMES, H, W)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_unet3d_clips_per_sec"]
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_unet3d", "/root/reference/model/unet3D.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    net = mod.UNet3D(residual="conv").eval()
    x = torch.rand(1, 3, FRAMES, H, W)
    with torch.no_grad():
        net(x)  # warm
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            net(x)
        dt = (time.time() - t0) / iters
    clips = 1.0 / dt
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_unet3d_clips_per_sec": clips}, f)
    return clips


def measure_ours() -> float:
    import jax
    import jax.numpy as jnp

    from vadcl_tpu.core.config import ModelConfig
    from vadcl_tpu.models.backbone import VADModel

    cfg = ModelConfig(predict=True, fused_attention=True, fused_cluster=True)
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = VADModel(config=cfg, dtype=dtype)
    rng = np.random.RandomState(0)

    best = 0.0
    for batch in (64, 128):
        clips = jnp.asarray(rng.rand(batch, FRAMES, H, W, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.key(0), clips[:1])

        @jax.jit
        def score(variables, clips, carry):
            # `carry` (previous iteration's result) is folded into the input
            # with a non-zero coefficient so XLA CANNOT sever the data
            # dependency (x + 0*c folds to x and lets remote-execution
            # tunnels memoize identical requests — measured 8x above
            # hardware peak before this fix).  1e-18 is numerically inert.
            clips = clips + carry * jnp.float32(1e-18)
            out = model.apply(variables, clips)
            err = (
                out.recon.astype(jnp.float32)
                - clips[:, -1:].astype(jnp.float32)
            ) ** 2
            return jnp.mean(err, axis=(1, 2, 3, 4))

        out = score(variables, clips, jnp.zeros((), jnp.float32))
        jax.block_until_ready(out)  # compile + warm
        iters = 20
        t0 = time.time()
        for i in range(iters):
            out = score(variables, clips, jnp.sum(out))
        np.asarray(out)  # host readback forces real completion
        dt = (time.time() - t0) / iters
        best = max(best, batch / dt)
    return best


def main():
    ours = measure_ours()
    try:
        baseline = measure_torch_baseline()
    except Exception:
        baseline = float("nan")
    vs = ours / baseline if baseline == baseline and baseline > 0 else -1.0
    print(
        json.dumps(
            {
                "metric": "shanghaitech_flagship_inference_throughput",
                "value": round(ours, 2),
                "unit": "clips/sec/chip",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
