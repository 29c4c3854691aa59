"""End-to-end AUC check on the synthetic frame-folder fixture (SURVEY §4's
missing integration test): train the tiny flagship briefly, evaluate with the
sliding-window protocol, and require better-than-chance anomaly detection."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vadcl_tpu.core.config import (
    ClusterConfig,
    Config,
    DataConfig,
    ModelConfig,
    OptimConfig,
)
from vadcl_tpu.data import ClipDataset, HostDataLoader, make_synthetic_dataset
from vadcl_tpu.eval.predict import evaluate_videos, make_window_scorer
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.train.loop import train


@pytest.mark.slow
def test_train_then_auc_above_chance(tmp_path):
    train_dir, test_dir, label_dir = make_synthetic_dataset(
        str(tmp_path), num_train_videos=3, num_test_videos=3,
        frames_per_video=28, size=56,
    )
    cfg = Config(
        model=ModelConfig(
            embed_dim=32,
            encoder_depths=(1, 1),
            encoder_heads=(2, 4),
            decoder_depths=(1, 1),
            decoder_heads=(4, 2),
            cluster=ClusterConfig(
                feature_clusters=16, space_clusters=8, space_size=7
            ),
        ),
        data=DataConfig(frame_num=4, image_size=(56, 56)),
        optim=OptimConfig(lr=3e-4, min_lr=1e-5, epochs=6),
        batch_size_per_device=8,
        output_dir=str(tmp_path / "run"),
        save_every_epochs=0,  # keep the test IO-light
    )
    ds = ClipDataset(train_dir, frame_num=4, size=(56, 56))
    loader = HostDataLoader(ds, batch_size=8, seed=0, num_workers=2)
    state = train(cfg, loader, max_steps=50)
    assert int(state.step) == 50

    model = VADModel(config=cfg.model)
    variables = {"params": state.params, **state.extras}

    def apply_fn(clips):
        return model.apply(variables, clips).recon

    scorer = make_window_scorer(apply_fn, 4, predict=False, batch_windows=8)
    test_ds = ClipDataset(
        test_dir, frame_num=4, size=(56, 56), label_root=label_dir, istest=True
    )
    auc, per_scene, per_video = evaluate_videos(
        scorer, test_ds.iter_test_videos(), frame_num=4, predict=False,
        protocol="nonoverlap",
    )
    assert np.isfinite(auc)
    assert len(per_video) == 3
    # reconstruction error must separate the injected anomalies from normal
    # motion distinctly better than chance after only 50 steps
    assert auc > 0.6, (auc, per_scene)
