"""Benchmark: flagship inference + training throughput with MFU accounting.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": N,
   "model_gflops_per_clip": F, "mfu_pct": M,
   "train_clips_per_sec": Nt, "train_step_gflops_per_clip": Ft,
   "train_mfu_pct": Mt, "peak_tflops": P, "baseline_basis": "..."}

Workload: the flagship Swin+I3D clustering VAD model in next-frame-prediction
mode (cluster heads ON, compactness ON — the eval-time configuration of
``tool/contrast_evaluae.py:163-165``), scoring 4-frame 224x224 windows exactly
as the sliding-window evaluator feeds them, bf16 compute, Pallas fused
window-attention + cluster kernels (the default TPU path of tools/train.py),
at batch 128 — the winner of the round-3 on-chip sweep {32..256}, kept as a
single point because every extra point costs a 40-80 s remote compile
against the driver's time budget.  The training number times the REAL jitted train
step (forward + backward + torch-Adam + staged gates) built by
``vadcl_tpu.train.step.make_train_step`` — the same function tools/train.py
runs.

Methodology: steady-state loops run ON DEVICE (``lax.fori_loop`` with a
carried data dependence between iterations) so one tunnel dispatch covers the
whole measurement and per-call round-trips are not billed to the model;
best-of-3 repeats; measurement is gated on a same-run chip calibration
(shared-chip contention — see ``main``).

FLOPs come from XLA's HLO cost analysis of the lowered programs
(vadcl_tpu/utils/flops.py), cached in ``.bench_flops.json``; MFU divides
achieved FLOP/s by the chip's published bf16 peak.

``vs_baseline``: the PyTorch reference publishes NO throughput numbers and
names no hardware (SURVEY §6; 运行指令.txt shows a 4-GPU DDP launch).  The
baseline is therefore an *estimate favoring the reference*: its as-written
fp32 eager model on one V100 (15.7 TFLOP/s fp32 peak) at 25% utilization —
generous for eager-mode research PyTorch — i.e. 3.93 TFLOP/s effective over
the same XLA-counted forward FLOPs.  The basis string rides in the JSON so
the ratio is auditable; ``mfu_pct`` is the assumption-free figure.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

FLOPS_CACHE = os.path.join(REPO, ".bench_flops.json")
FRAMES, H, W = 4, 224, 224

# Estimated reference throughput basis (see module docstring).
_REF_EFFECTIVE_TFLOPS = 15.7 * 0.25
_BASELINE_BASIS = (
    "estimated reference: fp32 eager PyTorch on one V100 at 25% util "
    f"({_REF_EFFECTIVE_TFLOPS:.2f} TFLOP/s) over the same XLA-counted fwd FLOPs"
)


def _fused() -> bool:
    import jax

    return jax.default_backend() != "cpu"


# VADCL_BENCH_SMOKE=1: tiny batches/iters so the full bench harness can be
# exercised end-to-end on CPU in CI — validates the measurement plumbing,
# NOT a performance number.
_SMOKE = os.environ.get("VADCL_BENCH_SMOKE", "") == "1"

_T0 = time.time()


def _stage(name: str) -> None:
    """Timestamped stage marker on stderr so a truncated/timed-out run still
    shows where the wall-clock went (the shared axon chip's compile+run times
    swing with neighbors' load)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {name}", file=sys.stderr, flush=True)


def compute_flops_cpu() -> dict:
    """--flops mode: pin the CPU backend (the axon plugin's cost_analysis
    returns None), lower the scorer and the real train step WITHOUT compiling
    or running them, and print their XLA-counted FLOPs as one JSON line."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vadcl_tpu.models.backbone import VADModel
    from vadcl_tpu.train.step import TrainState, make_train_step
    from vadcl_tpu.train.optim import build_optimizer, cosine_epoch_lr, param_gate_thresholds
    from vadcl_tpu.utils.flops import lowered_flops

    cfg = _flagship_config()
    # FLOPs are counted on the bf16 TPU program structure; dtype only changes
    # op count marginally, and bf16 lowers fine on CPU.
    model = VADModel(config=cfg.model, dtype=jnp.bfloat16)
    batch_i, batch_t = 64, 32
    clip_i = jnp.zeros((batch_i, FRAMES, H, W, 3), jnp.float32)
    clip_t = jnp.zeros((batch_t, FRAMES, H, W, 3), jnp.float32)

    def score(variables, clips):
        out = model.apply(variables, clips)
        err = (
            out.recon.astype(jnp.float32) - clips[:, -1:].astype(jnp.float32)
        ) ** 2
        return jnp.mean(err, axis=(1, 2, 3, 4))

    shapes = jax.eval_shape(model.init, jax.random.key(0), clip_t[:1])
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )
    infer_flops = lowered_flops(score, variables, clip_i) / batch_i

    variables = dict(variables)
    params = variables.pop("params")
    lr = cosine_epoch_lr(
        cfg.optim.lr, cfg.optim.min_lr, cfg.optim.epochs, 100,
        cfg.optim.warmup_epochs,
    )
    gates = param_gate_thresholds(
        params, cluster_start_iter=cfg.schedule.cluster_train_start_iter
    )
    tx = build_optimizer(
        cfg.optim.optimizer, lr, weight_decay=cfg.optim.weight_decay,
        b1=cfg.optim.b1, b2=cfg.optim.b2, eps=cfg.optim.eps,
        gate_thresholds=gates,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, extras=variables,
        opt_state=tx.init(params),
    )
    step = make_train_step(model, cfg, tx, steps_per_epoch=100)
    train_flops = lowered_flops(step, state, clip_t) / batch_t
    return {
        "infer_flops_per_clip": infer_flops,
        "train_flops_per_clip": train_flops,
    }


def get_flops() -> dict:
    """Cached CPU-subprocess FLOPs (the main process owns the axon backend).

    The cache entry is keyed by a digest of the full flagship Config repr plus
    the bench geometry, so any model/config change invalidates it instead of
    silently reusing stale FLOPs; one subprocess run fills both fields."""
    import hashlib
    import subprocess

    key_src = f"{_flagship_config()!r}|{FRAMES}x{H}x{W}|bi64|bt32|v2"
    digest = hashlib.sha1(key_src.encode()).hexdigest()[:16]
    cache = {}
    if os.path.exists(FLOPS_CACHE):
        try:
            with open(FLOPS_CACHE) as f:
                cache = json.load(f)
        except Exception:
            cache = {}
    entry = cache.get(digest)
    if not isinstance(entry, dict) or not {
        "infer_flops_per_clip", "train_flops_per_clip"
    } <= set(entry):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flops"],
            capture_output=True, text=True, timeout=1200,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        if out.returncode != 0 or not out.stdout.strip():
            raise RuntimeError(
                f"--flops subprocess failed (rc={out.returncode}): "
                f"{out.stderr.strip()[-800:]}"
            )
        entry = json.loads(out.stdout.strip().splitlines()[-1])
        cache[digest] = entry  # merge: other configs' entries survive
        cache[f"_key_{digest}"] = key_src
        try:
            with open(FLOPS_CACHE, "w") as f:
                json.dump(cache, f, indent=1)
        except OSError:
            pass
    return {
        "infer_flops_per_clip": float(entry["infer_flops_per_clip"]),
        "train_flops_per_clip": float(entry["train_flops_per_clip"]),
    }


def _flagship_config(attn_kernel: str = "base"):
    from vadcl_tpu.core.config import preset

    fused = _fused()
    import dataclasses

    cfg = preset("shanghaitech")
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, predict=True, fused_attention=fused, fused_cluster=fused,
            attn_kernel=attn_kernel if fused else "base",
        )
    )
    return cfg


def pick_attn_kernel() -> str:
    """Per-session kernel pick: fresh measurement every bench run (benchmarks
    must not trust caches).  Logic lives in ``vadcl_tpu.utils.autotune`` —
    drivers use its cached ``tuned_attn_kernel`` via ``tools/autotune.py``."""
    from vadcl_tpu.utils.autotune import pick_attn_kernel as _pick

    return _pick()


def measure_inference(attn_kernel: str = "base"):
    """Returns measured clips/sec on the default backend."""
    import jax
    import jax.numpy as jnp

    from vadcl_tpu.models.backbone import VADModel

    cfg = _flagship_config(attn_kernel)
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = VADModel(config=cfg.model, dtype=dtype)
    rng = np.random.RandomState(0)

    from jax import lax

    best = 0.0
    # batch sweep: {32..256} was measured on-chip (round 3) — throughput
    # peaks at 128 (96: 594, 128: 633, 160: 545, 192: 553, 256: 594 clips/s);
    # the bench keeps only the winner: each extra point costs a ~40-80 s
    # remote compile and the round-4 driver run must fit its time budget.
    for batch in (2,) if _SMOKE else (128,):
        clips = jnp.asarray(rng.rand(batch, FRAMES, H, W, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.key(0), clips[:1])
        iters = 2 if _SMOKE else 20

        # steady-state loop ON DEVICE (lax.fori_loop): one dispatch per
        # measurement, so the remote tunnel's per-call round-trip is not
        # billed to the model.  The carried scalar perturbs the next
        # iteration's input with a non-zero coefficient so XLA cannot sever
        # the inter-iteration data dependence (x + 0*c folds to x and lets
        # remote-execution tunnels memoize identical requests — measured 8x
        # above hardware peak before this guard).  1e-18 is numerically inert.
        @jax.jit
        def score_loop(variables, clips):
            def body(i, c):
                clip_i = clips + c * jnp.float32(1e-18)
                out = model.apply(variables, clip_i)
                err = (
                    out.recon.astype(jnp.float32)
                    - clip_i[:, -1:].astype(jnp.float32)
                ) ** 2
                return jnp.sum(jnp.mean(err, axis=(1, 2, 3, 4)))

            return lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

        out = score_loop(variables, clips)
        jax.block_until_ready(out)  # compile + warm
        rate = 0.0
        for _ in range(3):  # best-of-3 (shared-chip contention jitter)
            t0 = time.time()
            out = score_loop(variables, clips)
            float(np.asarray(out))  # host readback forces real completion
            dt = (time.time() - t0) / iters
            rate = max(rate, batch / dt)
        best = max(best, rate)
    return best


def _ensure_fixture(kind: str, n_videos: int, frames_per_video: int) -> str:
    """Synthetic JPEG frame-folder fixture on disk (built once, reused across
    bench runs): the e2e numbers must pay REAL jpeg decode through the same
    ``ClipDataset`` + native decoder the production tools use."""
    import hashlib

    from vadcl_tpu.data.synthetic import make_synthetic_dataset

    key = f"{kind}-{n_videos}x{frames_per_video}x{H}-v1"
    root = os.path.join(
        "/tmp", "vadcl_bench_data",
        hashlib.sha1(key.encode()).hexdigest()[:12],
    )
    done = os.path.join(root, ".done")
    if not os.path.exists(done):
        make_synthetic_dataset(
            root,
            num_train_videos=n_videos if kind == "train" else 0,
            num_test_videos=n_videos if kind == "test" else 0,
            frames_per_video=frames_per_video,
            size=H,
            num_scenes=2,
            seed=17,
        )
        with open(done, "w") as f:
            f.write(key)
    return root


def measure_eval_protocol(attn_kernel: str = "base"):
    """Windows/sec through the REAL eval hot path, END TO END: JPEG frames on
    disk -> ``ClipDataset`` (native threaded decode) -> ``evaluate_videos``
    with the device-resident stride-1 scorer — exactly what
    ``tools/evaluate.py`` runs (``tool/predict_evaluae.py:180-226`` semantics:
    per video decode -> transfer -> score -> PSNR/AUC), including the
    pipelined input path (video i+1's decode and upload overlap video i's
    compute).  Sweeps the window batch and pipeline lookahead; returns
    (best_windows_per_sec, best_batch, attribution-dict).

    The attribution dict separately times the three pipeline legs so a
    disappointing end-to-end number is diagnosable (VERDICT r3 item 4):
    ``decode_fps`` (host JPEG->uint8 array), ``transfer_videos_per_sec``
    (host->device staging of a whole video), ``compute_windows_per_sec``
    (scoring with the video already device-resident)."""
    import jax
    import jax.numpy as jnp

    from vadcl_tpu.data.dataset import ClipDataset
    from vadcl_tpu.eval.predict import (
        eval_input_frames,
        evaluate_videos,
        make_video_scorer,
        score_video,
        sliding_windows,
    )
    from vadcl_tpu.models.backbone import VADModel

    cfg = _flagship_config(attn_kernel)
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = VADModel(config=cfg.model, dtype=dtype)
    n_frames = 8 if _SMOKE else 256
    n_videos = 2 if _SMOKE else 4
    t_video = n_frames + FRAMES
    n_windows = len(sliding_windows(t_video, FRAMES, "stride1"))

    root = _ensure_fixture("test", n_videos, t_video)
    ds = ClipDataset(
        os.path.join(root, "test"),
        frame_num=FRAMES,
        size=(H, W),
        label_root=os.path.join(root, "test_labels"),
        istest=True,
    )

    clips0 = jnp.zeros((1, FRAMES, H, W, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), clips0)

    def apply_fn(clips):
        return model.apply(variables, clips).recon

    # -- attribution leg 1: host decode only (native threaded path) --
    t0 = time.time()
    first = ds.get_test_video(0)
    decode_fps = first[0].shape[0] / (time.time() - t0)

    attribution = {"decode_fps": decode_fps}
    best, best_batch, best_la = 0.0, 0, 0
    for bw in (4,) if _SMOKE else (64, 128):
        scorer = make_video_scorer(
            apply_fn,
            frame_num=FRAMES,
            predict=True,
            batch_windows=bw,
            input_frames=eval_input_frames("swin", True, FRAMES),
        )
        # compile + warm on the first video
        score_video(scorer, first[0], first[1], FRAMES, True, "stride1")

        # -- attribution legs 2+3 (measured once, at the first batch size) --
        if "transfer_videos_per_sec" not in attribution and not _SMOKE:
            t0 = time.time()
            staged = scorer.stage(first[0])
            jax.block_until_ready(staged.video)
            attribution["transfer_videos_per_sec"] = 1.0 / (
                time.time() - t0
            )
            t0 = time.time()
            score_video(scorer, staged, first[1], FRAMES, True, "stride1")
            attribution["compute_windows_per_sec"] = n_windows / (
                time.time() - t0
            )

        for lookahead in (2,) if _SMOKE else (2, 4):
            rate = 0.0
            for _ in range(2):
                t0 = time.time()
                evaluate_videos(
                    scorer, ds.iter_test_videos(), FRAMES, True,
                    "stride1", lookahead=lookahead,
                )
                dt = time.time() - t0
                rate = max(rate, n_videos * n_windows / dt)
            if rate > best:
                best, best_batch, best_la = rate, bw, lookahead
    attribution["lookahead"] = best_la
    # Pipeline floor: with decode / transfer / score fully overlapped
    # (pipeline_videos runs each leg on its own thread), the steady-state
    # per-video cost is the SLOWEST leg — so the attainable ceiling is the
    # min of the three leg rates, expressed in windows/sec.  eval_vs_floor
    # in the headline JSON reads end-to-end delivery against it.
    if not _SMOKE and "transfer_videos_per_sec" in attribution:
        videos_per_sec_floor = min(
            attribution["transfer_videos_per_sec"],
            attribution["decode_fps"] / t_video,
            attribution["compute_windows_per_sec"] / n_windows,
        )
        attribution["floor_windows_per_sec"] = (
            videos_per_sec_floor * n_windows
        )
    return best, best_batch, attribution


def measure_train_e2e(attn_kernel: str = "fold"):
    """clips/sec of the FULL training hot loop: JPEG frames on disk ->
    ``ClipDataset`` + ``HostDataLoader`` (threaded native decode, prefetch)
    -> uint8 host->device transfer -> the real jitted train step.  This is
    the number ``tools/train.py`` actually delivers (the reference's whole
    hot loop ``main_predict.py:233-347`` including its DataLoader), where
    ``measure_train`` iterates device-resident batches (VERDICT r3 item 5).

    Returns (e2e_clips_per_sec, loader_only_clips_per_sec): the second leg
    attributes a gap to host decode vs device step."""
    import jax
    import jax.numpy as jnp

    from vadcl_tpu.data.dataset import ClipDataset
    from vadcl_tpu.data.loader import HostDataLoader
    from vadcl_tpu.models.backbone import VADModel
    from vadcl_tpu.train.step import create_train_state, make_train_step

    n_videos, fpv = (1, 16) if _SMOKE else (4, 300)
    batch = 2 if _SMOKE else 64
    root = _ensure_fixture("train", n_videos, fpv)
    ds = ClipDataset(os.path.join(root, "train"), frame_num=FRAMES, size=(H, W))
    loader = HostDataLoader(ds, batch_size=batch, seed=0, num_workers=8)

    # -- loader-only: steady-state host decode rate (first batch = spin-up) --
    it = loader.epoch(0)
    next(it)
    n_batches, t0 = 0, time.time()
    for _ in it:
        n_batches += 1
    loader_rate = n_batches * batch / (time.time() - t0)

    cfg = _flagship_config(attn_kernel)
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = VADModel(config=cfg.model, dtype=dtype)
    rng = np.random.RandomState(1)
    clips0 = jnp.asarray(
        rng.rand(batch, FRAMES, H, W, 3) * 255, jnp.uint8
    )
    state, tx = create_train_state(
        model, cfg, jax.random.key(0), clips0[:1], steps_per_epoch=100
    )
    step = make_train_step(model, cfg, tx, steps_per_epoch=100)
    state, _ = step(state, clips0)  # compile (uint8 input signature)
    jax.block_until_ready(state.params)

    # -- e2e: loader prefetch thread feeds the async-dispatched jitted step.
    # Dispatch is async (jax enqueues; the device chains steps), so host
    # decode of batch i+1 overlaps the device executing batch i; the final
    # block_until_ready pays the real end-to-end wall clock.
    rate = 0.0
    for epoch in (1,) if _SMOKE else (1, 2):
        it = loader.epoch(epoch)
        first = next(it)  # let the producer spin up before timing
        state, _ = step(state, jnp.asarray(first))
        n_clips, t0 = 0, time.time()
        for batch_np in it:
            state, _ = step(state, jnp.asarray(batch_np))
            n_clips += batch_np.shape[0]
        jax.block_until_ready(state.params)
        rate = max(rate, n_clips / (time.time() - t0))
    return rate, loader_rate


def measure_train(attn_kernel: str = "base"):
    """Measured clips/sec of the real jitted train step.  Accepts "base" or
    "fold" (both trainable); the packed kernel has no VJP so callers pass
    "base" when the session pick was "packed"."""
    import jax
    import jax.numpy as jnp

    from vadcl_tpu.models.backbone import VADModel
    from vadcl_tpu.train.step import create_train_state, make_train_step

    cfg = _flagship_config(attn_kernel)
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = VADModel(config=cfg.model, dtype=dtype)
    rng = np.random.RandomState(1)

    best = 0.0
    # train batch sweep {32..128} measured on-chip (round 3, fold kernel):
    # 32: 205.9, 48: 211.2, 64: 212.9, 96: 211.4, 128: 217.2 clips/s —
    # near-flat (per-op efficiency bound, not batch bound); keep the winner
    # only (every extra point is a costly remote train-step compile).
    for batch in (2,) if _SMOKE else (128,):
        clips = jnp.asarray(rng.rand(batch, FRAMES, H, W, 3), jnp.float32)
        state, tx = create_train_state(
            model, cfg, jax.random.key(0), clips[:1], steps_per_epoch=100
        )
        step = make_train_step(model, cfg, tx, steps_per_epoch=100)

        iters = 2 if _SMOKE else 10

        # N steps per dispatch via lax.fori_loop: the tunnel round-trip is
        # paid once per measurement, not per step.  The carried TrainState
        # evolves every iteration (params/opt-state feed the next step), so
        # the loop has a genuine data dependence XLA cannot elide.
        from jax import lax

        @jax.jit
        def train_loop(state, clips):
            return lax.fori_loop(
                0, iters, lambda i, st: step(st, clips)[0], state
            )

        try:
            state = train_loop(state, clips)
            jax.block_until_ready(state.params)  # compile + warm
        except Exception as e:  # e.g. HBM OOM at the larger batch
            print(f"train batch {batch} failed: {e!r}"[:200], file=sys.stderr)
            continue
        rate = 0.0
        for _ in range(3):
            t0 = time.time()
            state = train_loop(state, clips)
            jax.block_until_ready(state.params)
            dt = (time.time() - t0) / iters
            rate = max(rate, batch / dt)
        best = max(best, rate)
    return best


def measure_chip_calibration():
    """Effective device speed AT BENCH TIME: one large bf16 matmul (TFLOP/s)
    and one streaming add (GB/s), elision-proof via a carried dependency.

    The axon tunnel chip is shared infrastructure; its delivered rate was
    measured to swing 53-117 TFLOP/s across sessions.  Reporting the same-run
    calibration lets `mfu_pct` (vs the 197 nameplate) be read against what
    the chip would actually give ANY program at that moment."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    b = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    big = jnp.asarray(rng.randn(64, 1024, 1024), jnp.bfloat16)

    def timed(fn, a0, iters=16):
        jitted = jax.jit(
            lambda a0: lax.fori_loop(
                0, iters,
                lambda i, c: (
                    c[0],
                    jnp.sum(
                        fn(c[0] + c[1] * jnp.asarray(1e-18, c[0].dtype))
                    ).astype(c[0].dtype),
                ),
                (a0, jnp.zeros((), a0.dtype)),
            )[1]
        )
        out = jitted(a0)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = jitted(a0)
            float(np.asarray(out.astype(jnp.float32)))
            best = min(best, (time.time() - t0) / iters)
        return best

    t_mm = timed(
        lambda x: jnp.dot(
            x, b, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16),
        a,
    )
    t_cp = timed(lambda x: x + 1, big)

    # host->device link: one device_put of a known-size uint8 buffer (the
    # wire format of every production input path).  This is the floor under
    # both e2e numbers — through the axon tunnel the link delivers ~30-35
    # MB/s, orders of magnitude under a real host's PCIe/DMA, so the floors
    # ride in the JSON to separate "framework leaves throughput on the
    # table" from "the link is saturated" (VERDICT r4 item 4).  Content is
    # mutated per repeat so a memoizing tunnel cannot skip the transfer.
    link = rng.randint(0, 255, 16 * 1024 * 1024, np.uint8)
    jax.block_until_ready(jax.device_put(link))  # warm the path
    t_link = float("inf")
    for i in range(3):
        link[i] = (int(link[i]) + 1) % 256
        t0 = time.time()
        jax.block_until_ready(jax.device_put(link))
        t_link = min(t_link, time.time() - t0)
    return {
        "chip_matmul_tflops": 2 * 4096**3 / t_mm / 1e12,
        "chip_copy_gbps": 2 * big.size * 2 / t_cp / 1e9,
        "link_mbps": link.size / t_link / 1e6,
    }


def main():
    from vadcl_tpu.utils.flops import device_peak_tflops, mfu_pct

    # Calibrate FIRST and gate on contention: the axon tunnel chip is shared
    # infrastructure whose delivered matmul rate swings 43-117 TFLOP/s with
    # neighbors' workloads.  When the same-run calibration shows the chip
    # below 55 TFLOP/s, wait and re-calibrate (up to 3 min) so the bench
    # measures this framework, not a neighbor's job.  The final calibration
    # and the wait count ride in the JSON for auditability.
    contention_waits = 0
    calib = {}
    if not _SMOKE:
        _stage("chip calibration")
        try:
            calib = measure_chip_calibration()
            while (
                _fused()  # contention gate only applies to the shared chip
                and calib.get("chip_matmul_tflops", 1e9) < 55
                and contention_waits < 3
            ):
                contention_waits += 1
                time.sleep(60)
                calib = measure_chip_calibration()
        except Exception as e:
            print(f"chip calibration failed: {e!r}", file=sys.stderr)
            calib = {}

    _stage("attn-kernel pick")
    try:
        picked = pick_attn_kernel()
    except Exception as e:
        print(f"attn-kernel pick failed: {e!r}", file=sys.stderr)
        picked = "base"
    # The per-session autotune micro-benchmark and the end-to-end number can
    # disagree under contention jitter, so measure the FULL model with both
    # the session pick and the trainable production default ("fold") and
    # report the best — the bench runs once per round, robustness wins.
    attn_kernel, infer_rate = picked, 0.0
    for k in dict.fromkeys([picked, "fold" if not _SMOKE else picked]):
        _stage(f"inference ({k})")
        rate = measure_inference(k)
        if rate > infer_rate:
            attn_kernel, infer_rate = k, rate
    # train: "fold" wins consistently (docs/PERFORMANCE.md); "base" is only
    # a fallback on failure — trying both would double the costly remote
    # train-step compiles for a measured-negative comparison.
    train_rate, train_kernel = float("nan"), "base"
    for k in ("fold", "base"):
        _stage(f"train ({k})")
        try:
            rate = measure_train(k)
        except Exception as e:  # never lose the headline to a train issue
            print(f"train bench ({k}) failed: {e!r}", file=sys.stderr)
            continue
        if rate > 0:
            train_rate, train_kernel = rate, k
            break
    _stage("flops accounting")
    try:
        flops = get_flops()
        infer_flops = flops["infer_flops_per_clip"]
        train_flops = flops["train_flops_per_clip"]
    except Exception as e:
        print(f"flops accounting failed: {e!r}", file=sys.stderr)
        infer_flops = train_flops = float("nan")

    peak = device_peak_tflops()
    infer_mfu = mfu_pct(infer_rate * infer_flops, peak)
    train_mfu = (
        mfu_pct(train_rate * train_flops, peak)
        if train_rate == train_rate
        else None
    )
    ref_clips = _REF_EFFECTIVE_TFLOPS * 1e12 / infer_flops
    # Same estimated basis on the TRAIN side (VERDICT r3 item 7): the
    # reference's fp32 eager train step on the same assumed 3.93 TFLOP/s
    # effective, over the same XLA-counted fwd+bwd+Adam FLOPs per clip.
    ref_train_clips = _REF_EFFECTIVE_TFLOPS * 1e12 / train_flops
    _stage("eval protocol")
    try:
        eval_rate, eval_bw, eval_attr = measure_eval_protocol(attn_kernel)
    except Exception as e:
        print(f"eval-protocol bench failed: {e!r}", file=sys.stderr)
        eval_rate, eval_bw, eval_attr = float("nan"), 0, {}
    _stage("train e2e")
    try:
        train_e2e_rate, loader_rate = measure_train_e2e(train_kernel)
    except Exception as e:
        print(f"train-e2e bench failed: {e!r}", file=sys.stderr)
        train_e2e_rate, loader_rate = float("nan"), float("nan")

    def r(x, nd=2):
        return round(x, nd) if isinstance(x, float) and x == x else None

    # Transfer floors (VERDICT r4 item 4): what the measured host->device
    # link admits for each e2e path, so the JSON itself says whether the
    # framework or the link binds.  Train ships uint8 clips of
    # FRAMES*H*W*3 bytes; its e2e ceiling is min(host decode rate, link
    # rate, device step rate).
    clip_bytes = FRAMES * H * W * 3
    link_mbps = calib.get("link_mbps")
    train_floor = None
    if link_mbps and loader_rate == loader_rate and train_rate == train_rate:
        link_clips = link_mbps * 1e6 / clip_bytes
        train_floor = min(loader_rate, link_clips, train_rate)
    eval_floor = eval_attr.get("floor_windows_per_sec")

    _stage("done")
    print(
        json.dumps(
            {
                "metric": "shanghaitech_flagship_inference_throughput",
                "value": r(infer_rate),
                "unit": "clips/sec/chip",
                "vs_baseline": r(infer_rate / ref_clips),
                "model_gflops_per_clip": r(infer_flops / 1e9),
                "mfu_pct": r(infer_mfu) if infer_mfu else None,
                "train_clips_per_sec": r(train_rate),
                "train_vs_baseline": r(train_rate / ref_train_clips),
                "train_step_gflops_per_clip": r(train_flops / 1e9),
                "train_mfu_pct": r(train_mfu) if train_mfu else None,
                # the tools/train.py hot loop END TO END: JPEG on disk ->
                # ClipDataset + HostDataLoader (native decode) -> jitted step
                "train_e2e_clips_per_sec": r(train_e2e_rate),
                "train_loader_clips_per_sec": r(loader_rate),
                # measured ceiling of the e2e path: min(loader, link, step)
                "train_e2e_floor_clips_per_sec": r(train_floor),
                "train_e2e_vs_floor": (
                    r(train_e2e_rate / train_floor)
                    if train_floor and train_e2e_rate == train_e2e_rate
                    else None
                ),
                # the tools/evaluate.py hot path END TO END: JPEG on disk ->
                # native decode -> pipelined upload -> device-resident
                # stride-1 video scorer -> PSNR/AUC
                "eval_windows_per_sec": r(eval_rate),
                "eval_batch_windows": eval_bw or None,
                "eval_vs_floor": (
                    r(eval_rate / eval_floor)
                    if eval_floor and eval_rate == eval_rate
                    else None
                ),
                "eval_attribution": {
                    k: r(v) if isinstance(v, float) else v
                    for k, v in eval_attr.items()
                },
                # best-of-{session pick, fold} measured end-to-end
                "attn_kernel": attn_kernel,
                "train_attn_kernel": train_kernel,
                "peak_tflops": peak,
                "chip_matmul_tflops": r(calib.get("chip_matmul_tflops")),
                "chip_copy_gbps": r(calib.get("chip_copy_gbps")),
                "link_mbps": r(calib.get("link_mbps")),
                "contention_waits": contention_waits,
                "baseline_basis": _BASELINE_BASIS,
            }
        )
    )


if __name__ == "__main__":
    if "--flops" in sys.argv:
        print(json.dumps(compute_flops_cpu()))
    else:
        main()
