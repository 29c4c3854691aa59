"""Autotune module: CPU fallback + cache behavior (no device measurement)."""

import json
import os


def test_pick_and_tuned_cpu_fallback(tmp_path):
    from vadcl_tpu.utils.autotune import pick_attn_kernel, tuned_attn_kernel

    assert pick_attn_kernel() == "base"  # cpu backend: no fused path
    assert tuned_attn_kernel(cache_path=str(tmp_path / "c.json")) == "base"


def test_tuned_cache_is_honored(tmp_path, monkeypatch):
    """A cached pick short-circuits measurement (simulated non-cpu backend)."""
    import vadcl_tpu.utils.autotune as at

    path = tmp_path / "autotune.json"
    import jax

    kind = "FakeTPU"

    class _Dev:
        device_kind = kind

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "devices", lambda: [_Dev()])
    path.write_text(
        json.dumps({f"{kind}|trainable=False": {"pick": "fold"}})
    )
    assert at.tuned_attn_kernel(cache_path=str(path)) == "fold"

    # measurement failure (fake backend can't run kernels) falls back to base
    # and does not poison the cache for other keys
    assert (
        at.tuned_attn_kernel(cache_path=str(path), trainable_only=True)
        == "base"
    )
