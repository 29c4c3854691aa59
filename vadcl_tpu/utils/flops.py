"""FLOPs accounting + MFU for the flagship model.

The reference publishes no throughput numbers (SURVEY §6), so honest perf
claims need a denominator.  Rather than a hand-written analytic counter (easy
to get subtly wrong across conv/attention variants), FLOPs come from **XLA's
own HLO cost analysis** of the lowered program (``jax.jit(...).lower(...)
.cost_analysis()`` — no compile, no execution, ~1 s).  This counts exactly the
ops the benchmark runs, including the window-attention matmuls, Inception
convs, cdist-as-matmul cluster math, and the decoder tail.

MFU = achieved FLOP/s / peak FLOP/s of the chip.  Peaks are the published
dense-matmul numbers per TPU generation (bf16 unless noted).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

# Published peak dense bf16 TFLOP/s per chip.
_TPU_PEAK_TFLOPS = {
    "v5 lite": 197.0,  # TPU v5e (jax device_kind "TPU v5 lite")
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6 lite": 918.0,  # Trillium
    "v6e": 918.0,
    "v3": 123.0,
    "v2": 45.0,
}


def device_peak_tflops(device=None) -> Optional[float]:
    """Peak bf16 TFLOP/s for the current (or given) accelerator, or None when
    unknown (e.g. CPU)."""
    import jax

    if device is None:
        devices = jax.devices()
        if not devices:
            return None
        device = devices[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _TPU_PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return None


def lowered_flops(fn: Callable, *args: Any, **kwargs: Any) -> float:
    """Total FLOPs of one invocation of ``fn(*args)`` per XLA cost analysis.

    ``fn`` is traced and lowered for the default backend but never compiled or
    run; args can be ShapeDtypeStructs or concrete arrays.
    """
    import jax

    lowered = jax.jit(fn, **kwargs).lower(*args)
    analysis = lowered.cost_analysis()
    if analysis is None:  # pragma: no cover - older jaxlib
        return float("nan")
    return float(analysis.get("flops", float("nan")))




def mfu_pct(
    achieved_flops_per_sec: float, peak_tflops: Optional[float]
) -> Optional[float]:
    if not peak_tflops:
        return None
    return 100.0 * achieved_flops_per_sec / (peak_tflops * 1e12)
