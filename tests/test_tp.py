"""Model-axis (tensor) parallelism tests on the 8-virtual-device CPU mesh.

The reference has no tensor parallelism (DDP only,
``utils/distritributed_model.py:23-100``); this is a TPU-native extension:
a 2-D ``(data, model)`` mesh where attention heads and the MLP hidden width
shard over the model axis via GSPMD constraints (vadcl_tpu/parallel/tp.py).
Correctness bar: the dp×tp step computes the SAME loss/updates as the
plain-DP step on the same global batch.
"""

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
from vadcl_tpu.core.mesh import make_mesh, make_mesh_2d
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.parallel.tp import model_parallel, shard_dim
from vadcl_tpu.train.step import create_train_state, make_train_step

TINY_MODEL = ModelConfig(
    embed_dim=32,
    encoder_depths=(1, 1),
    encoder_heads=(2, 4),
    decoder_depths=(1, 1),
    decoder_heads=(4, 2),
    predict=True,
    cluster=ClusterConfig(feature_clusters=16, space_clusters=8, space_size=7),
)
TINY = Config(
    model=TINY_MODEL,
    data=DataConfig(frame_num=4, image_size=(56, 56)),
    optim=OptimConfig(lr=1e-3, min_lr=1e-5, epochs=10, weight_decay=0.02),
    batch_size_per_device=2,
)


def test_mesh_2d_shape():
    mesh = make_mesh_2d(2, 4)
    assert mesh.shape == {"data": 2, "model": 4}
    assert mesh.axis_names == ("data", "model")


def test_shard_dim_noop_outside_context():
    x = jnp.ones((4, 8))
    y = shard_dim(x, 1)
    assert y is x  # literal passthrough without an active model axis


def test_shard_dim_skips_indivisible():
    mesh = make_mesh_2d(2, 4)
    with model_parallel(mesh, "model"):
        x = jnp.ones((4, 6))  # 6 % 4 != 0 -> stays unconstrained
        assert shard_dim(x, 1) is x
        x2 = jnp.ones((4, 8))
        assert shard_dim(x2, 1) is not x2


def test_tp_forward_matches_unsharded():
    """model.apply under an active (2, 4) model axis == plain apply."""
    model = VADModel(config=TINY_MODEL)
    clip = jnp.asarray(
        np.random.RandomState(0).rand(2, 4, 56, 56, 3), jnp.float32
    )
    variables = jax.jit(model.init)(jax.random.key(0), clip)
    ref = jax.jit(model.apply)(variables, clip)

    mesh = make_mesh_2d(2, 4)

    @jax.jit
    def tp_apply(variables, clip):
        with model_parallel(mesh, "model"):
            return model.apply(variables, clip)

    out = tp_apply(variables, clip)
    np.testing.assert_allclose(
        np.asarray(ref.recon, np.float32),
        np.asarray(out.recon, np.float32),
        rtol=1e-5,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        float(ref.cluster_loss.mean()),
        float(out.cluster_loss.mean()),
        rtol=1e-5,
    )


@pytest.mark.parametrize("dp,tp", [(2, 4), (4, 2)])
def test_tp_train_step_matches_dp(dp, tp):
    """One dp×tp train step == the plain 8-way DP step (same global batch)."""
    cfg = TINY
    model = VADModel(config=cfg.model)
    clip = jnp.asarray(
        np.random.RandomState(1).rand(8, 4, 56, 56, 3), jnp.float32
    )
    state, tx = create_train_state(
        model, cfg, jax.random.key(0), clip, steps_per_epoch=10
    )
    step_dp = make_train_step(
        model, cfg, tx, steps_per_epoch=10, mesh=make_mesh(8)
    )
    s1, m1 = step_dp(state, clip)

    state2, _ = create_train_state(
        model, cfg, jax.random.key(0), clip, steps_per_epoch=10
    )
    mesh2 = make_mesh_2d(dp, tp)
    step_tp = make_train_step(
        model, cfg, tx, steps_per_epoch=10, mesh=mesh2, model_axis="model"
    )
    s2, m2 = step_tp(state2, clip)

    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        # same ±2·lr envelope as the DP-equivalence test: Adam's first-step
        # update is ±lr·sign(g) and collective reduction order can flip the
        # sign at |g|≈0
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2.5 * cfg.optim.lr
        )


def test_tp_rejects_single_device_fused_kernels():
    """'base'/'packed' fused kernels have no shard_map dispatch — rejected;
    the folded kernels compose (see test_tp_fold_*)."""
    cfg = dataclasses.replace(
        TINY,
        model=dataclasses.replace(
            TINY_MODEL, fused_attention=True, attn_kernel="base"
        ),
    )
    model = VADModel(config=cfg.model)
    clip = jnp.asarray(
        np.random.RandomState(2).rand(2, 4, 56, 56, 3), jnp.float32
    )
    state, tx = create_train_state(
        model, cfg, jax.random.key(0), clip, steps_per_epoch=10
    )
    with pytest.raises(ValueError, match="single-device"):
        make_train_step(
            model, cfg, tx, steps_per_epoch=10,
            mesh=make_mesh_2d(2, 4), model_axis="model",
        )
    with pytest.raises(ValueError, match="mesh with that axis"):
        make_train_step(
            model, cfg, tx, steps_per_epoch=10,
            mesh=make_mesh(8), model_axis="model",
        )


def test_tp_fold_forward_matches_unsharded():
    """The folded Pallas path under a model axis (shard_map window-row
    dispatch, tp.py:shard_windows_call) == the plain single-device fold
    apply.  CPU runs the kernels in interpret mode
    (ops/window.py:pallas_interpret), so this exercises the REAL production
    kernels' shard_map dispatch, not an XLA stand-in."""
    fold_model = dataclasses.replace(
        TINY_MODEL, fused_attention=True, attn_kernel="fold"
    )
    model = VADModel(config=fold_model)
    clip = jnp.asarray(
        np.random.RandomState(3).rand(2, 4, 56, 56, 3), jnp.float32
    )
    variables = jax.jit(model.init)(jax.random.key(0), clip)
    ref = jax.jit(model.apply)(variables, clip)

    mesh = make_mesh_2d(2, 2)

    @jax.jit
    def tp_apply(variables, clip):
        with model_parallel(mesh, "model"):
            return model.apply(variables, clip)

    out = tp_apply(variables, clip)
    np.testing.assert_allclose(
        np.asarray(ref.recon, np.float32),
        np.asarray(out.recon, np.float32),
        rtol=1e-5,
        atol=1e-5,
    )


@pytest.mark.slow
def test_tp_fold_train_step_matches_dp():
    """One dp2×tp2 train step on the FOLD kernels == the plain 4-way DP fold
    step (same global batch): losses equal, updated params within the Adam
    first-step envelope.  Proves the shard_map dispatch backpropagates
    correctly through the folded custom-VJP kernels (replicated-weight
    cotangents psum'ed by shard_map's transpose)."""
    cfg = dataclasses.replace(
        TINY,
        model=dataclasses.replace(
            TINY_MODEL, fused_attention=True, attn_kernel="fold"
        ),
    )
    model = VADModel(config=cfg.model)
    clip = jnp.asarray(
        np.random.RandomState(4).rand(4, 4, 56, 56, 3), jnp.float32
    )
    state, tx = create_train_state(
        model, cfg, jax.random.key(0), clip, steps_per_epoch=10
    )
    step_dp = make_train_step(
        model, cfg, tx, steps_per_epoch=10, mesh=make_mesh(4)
    )
    s1, m1 = step_dp(state, clip)

    state2, _ = create_train_state(
        model, cfg, jax.random.key(0), clip, steps_per_epoch=10
    )
    step_tp = make_train_step(
        model, cfg, tx, steps_per_epoch=10,
        mesh=make_mesh_2d(2, 2), model_axis="model",
    )
    s2, m2 = step_tp(state2, clip)

    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2.5 * cfg.optim.lr
        )
