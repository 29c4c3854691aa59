"""Driver-level multi-chip eval: tools/train.build_eval_fn with a mesh must
produce the same per-scene AUCs as the single-device path (the TPU-native
analogue of the reference DDP-wrapping every eval tool,
``tool/contrast_evaluae.py:148-153``)."""

import dataclasses

import jax
import numpy as np

from tools.train import build_eval_fn
from vadcl_tpu.core.config import ClusterConfig, Config, DataConfig, ModelConfig
from vadcl_tpu.core.mesh import make_mesh
from vadcl_tpu.data import make_synthetic_dataset
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.train.step import TrainState


def _tiny_cfg(tmp_path):
    return Config(
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
        output_dir=str(tmp_path / "run"),
    )


def test_build_eval_fn_mesh_matches_single_device(tmp_path):
    _, test_dir, label_dir = make_synthetic_dataset(
        str(tmp_path), num_train_videos=1, num_test_videos=2,
        frames_per_video=16, size=56,
    )
    cfg = _tiny_cfg(tmp_path)
    model = VADModel(config=cfg.model)
    sample = np.zeros((1, 4, 56, 56, 3), np.float32)
    variables = dict(jax.jit(model.init)(jax.random.key(0), sample))
    params = variables.pop("params")
    state = TrainState(
        step=np.int32(0), params=params, extras=variables, opt_state=None
    )

    auc_single = build_eval_fn(cfg, test_dir, label_dir)(state)
    auc_mesh = build_eval_fn(cfg, test_dir, label_dir, mesh=make_mesh(8))(state)
    assert np.isfinite(auc_single)
    np.testing.assert_allclose(auc_mesh, auc_single, rtol=1e-5)


def test_scorer_rounds_batch_to_mesh_size():
    """batch_windows not divisible by the mesh size must still work (the
    scorer rounds the global batch up)."""
    import jax.numpy as jnp

    from vadcl_tpu.eval.predict import make_window_scorer

    def apply_fn(clips):
        return jnp.mean(clips, axis=1, keepdims=True)

    rng = np.random.RandomState(0)
    windows = rng.rand(11, 4, 16, 16, 3).astype(np.float32)
    s1 = make_window_scorer(apply_fn, 4, predict=True, batch_windows=6)
    s2 = make_window_scorer(
        apply_fn, 4, predict=True, batch_windows=6, mesh=make_mesh(8)
    )
    np.testing.assert_allclose(s1(windows), s2(windows), rtol=1e-6)
