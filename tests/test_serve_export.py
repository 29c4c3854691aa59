"""Serving export (vadcl_tpu/serve): StableHLO artifact round-trip.

The artifact must score windows IDENTICALLY to the live model after a
save -> load cycle, carry honest metadata, and work through the CLI
(tools/export.py --check).
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vadcl_tpu.serve import (
    artifact_window_runner,
    export_window_scorer,
    load_artifact,
    save_artifact,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_model_apply():
    """A small real VADModel forward bound to init weights."""
    import dataclasses

    from vadcl_tpu.core.config import preset
    from vadcl_tpu.models.backbone import VADModel

    cfg = preset("shanghaitech")
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            predict=True,
            cluster=dataclasses.replace(
                cfg.model.cluster, space_size=7, feature_clusters=16,
                space_clusters=8,
            ),
        ),
        data=dataclasses.replace(cfg.data, image_size=(56, 56)),
    )
    model = VADModel(config=cfg.model, dtype=jnp.float32)
    sample = jnp.zeros((1, 4, 56, 56, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), sample)

    def apply_fn(clips):
        return model.apply(variables, clips).recon

    return apply_fn


@pytest.fixture(scope="module")
def apply_fn():
    return tiny_model_apply()


def test_artifact_round_trip(tmp_path, apply_fn):
    blob, meta = export_window_scorer(
        apply_fn,
        batch_windows=3,
        frame_num=4,
        image_size=(56, 56),
        predict=True,
        input_frames=4,
        platforms=("cpu",),
    )
    path = str(tmp_path / "artifact")
    save_artifact(path, blob, meta)
    assert os.path.exists(os.path.join(path, "scorer.stablehlo"))
    with open(os.path.join(path, "meta.json")) as f:
        m = json.load(f)
    assert m["batch_windows"] == 3 and m["platforms"] == ["cpu"]

    art = load_artifact(path)
    rng = np.random.RandomState(0)
    windows = rng.randint(0, 256, (3, 4, 56, 56, 3), dtype=np.uint8)
    got = np.asarray(art.score(windows))

    from vadcl_tpu.eval.predict import window_score_fn

    want = np.asarray(
        window_score_fn(apply_fn, predict=True, input_frames=4)(
            jnp.asarray(windows)
        )
    )
    assert got.shape == (3,)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_artifact_runner_pads_tail(tmp_path, apply_fn):
    blob, meta = export_window_scorer(
        apply_fn,
        batch_windows=4,
        frame_num=4,
        image_size=(56, 56),
        predict=True,
        input_frames=4,
        platforms=("cpu",),
    )
    path = str(tmp_path / "artifact")
    save_artifact(path, blob, meta)
    art = load_artifact(path)
    run = artifact_window_runner(art)
    rng = np.random.RandomState(1)
    windows = rng.randint(0, 256, (6, 4, 56, 56, 3), dtype=np.uint8)
    out = run(windows)  # 6 = 4 + padded tail of 2
    assert out.shape == (6,)
    # tail scores must match scoring the tail exactly (padding is discarded)
    tail = np.asarray(
        art.score(
            np.concatenate([windows[4:], windows[5:6], windows[5:6]], axis=0)
        )
    )[:2]
    np.testing.assert_allclose(out[4:], tail, rtol=1e-6)


def test_recon_mode_shape(tmp_path, apply_fn):
    """Recon-mode artifacts emit per-frame scores (B, frame_num)."""
    import dataclasses

    from vadcl_tpu.core.config import preset
    from vadcl_tpu.models.backbone import VADModel

    cfg = preset("shanghaitech")
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            predict=False,
            cluster=dataclasses.replace(
                cfg.model.cluster, space_size=7, feature_clusters=16,
                space_clusters=8,
            ),
        ),
        data=dataclasses.replace(cfg.data, image_size=(56, 56)),
    )
    model = VADModel(config=cfg.model, dtype=jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 4, 56, 56, 3), jnp.float32)
    )
    blob, meta = export_window_scorer(
        lambda clips: model.apply(variables, clips).recon,
        batch_windows=2,
        frame_num=4,
        image_size=(56, 56),
        predict=False,
        platforms=("cpu",),
    )
    path = str(tmp_path / "recon")
    save_artifact(path, blob, meta)
    art = load_artifact(path)
    out = np.asarray(
        art.score(np.zeros((2, 4, 56, 56, 3), np.uint8))
    )
    assert out.shape == (2, 4)
    assert meta["out_shape"] == [[2, 4]]


@pytest.mark.slow
def test_export_cli_check(tmp_path):
    """tools/export.py end-to-end: export from init weights, reload, verify."""
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
    }
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "export.py"),
            "--out", str(tmp_path / "art"),
            "--predict",
            "--batch-windows", "2",
            "--image-size", "56",
            "--platforms", "cpu",
            "--check",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "reload check" in out.stdout


def test_dynamic_batch_artifact(tmp_path, apply_fn):
    """batch_windows=None exports a symbolic batch dim: one artifact, any
    batch size, numerics equal to the live model."""
    blob, meta = export_window_scorer(
        apply_fn,
        batch_windows=None,
        frame_num=4,
        image_size=(56, 56),
        predict=True,
        input_frames=4,
        platforms=("cpu",),
    )
    assert meta["batch_windows"] is None
    assert meta["out_shape"] == [["b"]]
    path = str(tmp_path / "dyn")
    save_artifact(path, blob, meta)
    art = load_artifact(path)
    assert art.batch_windows is None
    run = artifact_window_runner(art)

    from vadcl_tpu.eval.predict import window_score_fn

    live = window_score_fn(apply_fn, predict=True, input_frames=4)
    rng = np.random.RandomState(2)
    for n in (1, 5):
        windows = rng.randint(0, 256, (n, 4, 56, 56, 3), dtype=np.uint8)
        got = run(windows)
        want = np.asarray(live(jnp.asarray(windows)))
        assert got.shape == (n,)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_serve_cli_end_to_end(tmp_path, apply_fn):
    """tools/serve.py: artifact + frame folders in, per-scene AUC + scores.npz
    out — the full deployment path with no model code in the serving step."""
    from vadcl_tpu.data import make_synthetic_dataset

    blob, meta = export_window_scorer(
        apply_fn,
        batch_windows=4,
        frame_num=4,
        image_size=(56, 56),
        predict=True,
        input_frames=4,
        input_dtype="uint8",
        platforms=("cpu",),
    )
    art_path = str(tmp_path / "scorer")
    save_artifact(art_path, blob, meta)

    _, test_dir, label_dir = make_synthetic_dataset(
        str(tmp_path / "data"), size=56, frames_per_video=16
    )
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}
    out_npz = str(tmp_path / "scores.npz")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "serve.py"),
            "--artifact", art_path,
            "--data-path", test_dir,
            "--label-path", label_dir,
            "--protocol", "stride1",
            "--out", out_npz,
        ],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mean scene AUC" in out.stdout
    curves = np.load(out_npz)
    assert len(curves.files) > 0
    for k in curves.files:
        scores, labels = curves[k]
        assert np.isfinite(scores).all()
        assert scores.min() >= 0.0 and scores.max() <= 1.0 + 1e-6
