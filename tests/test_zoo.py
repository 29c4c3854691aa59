"""Alternative-backbone training: unet3d and memory-augmented convae families
run through the same train step, with the memory bank updating as state."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vadcl_tpu.core.config import Config, DataConfig, ModelConfig, OptimConfig
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.train.step import create_train_state, make_train_step


def _cfg(backbone, frame_num=4):
    return Config(
        model=ModelConfig(backbone=backbone, memory_size=6, memory_dim=512),
        data=DataConfig(frame_num=frame_num, image_size=(32, 32)),
        optim=OptimConfig(lr=1e-4, epochs=4),
        batch_size_per_device=2,
    )


def _clip(frame_num):
    return jnp.asarray(
        np.random.RandomState(0).rand(2, frame_num, 32, 32, 3), jnp.float32
    )


def test_unet3d_backbone_trains():
    cfg = _cfg("unet3d")
    model = VADModel(config=cfg.model)
    clip = _clip(4)
    state, tx = create_train_state(model, cfg, jax.random.key(0), clip, 10)
    step = make_train_step(model, cfg, tx, 10)
    losses = []
    for _ in range(6):
        state, m = step(state, clip)
        losses.append(float(m.loss))
    assert losses[-1] < losses[0]
    assert float(m.cluster_loss) == 0.0  # no aux losses for unet3d


def test_convae_backbone_trains_and_updates_memory():
    cfg = _cfg("convae")
    model = VADModel(config=cfg.model)
    clip = _clip(4)
    state, tx = create_train_state(model, cfg, jax.random.key(0), clip, 10)
    keys0 = np.asarray(state.extras["memory"]["convae"]["memory"]["keys"])
    step = make_train_step(model, cfg, tx, 10)
    for _ in range(3):
        state, m = step(state, clip)
    keys1 = np.asarray(state.extras["memory"]["convae"]["memory"]["keys"])
    assert keys0.shape == keys1.shape == (6, 512)
    assert not np.allclose(keys0, keys1)  # MNAD bank updated each step
    np.testing.assert_allclose(np.linalg.norm(keys1, axis=1), 1.0, rtol=1e-5)
    assert np.isfinite(float(m.loss))
    assert float(m.cluster_loss) != 0.0  # separateness loss slot active


def test_convae_predict_split_semantics():
    """convae_predict uses the MNAD-proper split: 5-frame clip -> 4 input
    frames + true future target, single-frame recon."""
    cfg = _cfg("convae_predict", frame_num=5)
    model = VADModel(config=cfg.model)
    clip = _clip(5)
    state, tx = create_train_state(model, cfg, jax.random.key(0), clip, 10)
    step = make_train_step(model, cfg, tx, 10)
    state, m = step(state, clip)
    assert np.isfinite(float(m.loss))


def test_convae_plain_apply_for_eval():
    """Eval paths use plain model.apply (no mutable): must not crash and must
    not mutate the memory bank (review finding regression test)."""
    cfg = _cfg("convae")
    model = VADModel(config=cfg.model)
    clip = _clip(4)
    variables = jax.jit(model.init)(jax.random.key(0), clip)
    out = jax.jit(model.apply)(variables, clip)  # deterministic=True -> eval path
    assert out.recon.shape == (2, 4, 32, 32, 3)
