"""Backward + N-step training-trajectory parity vs the ACTUAL torch reference.

Round-2 proved *forward* parity against the real ``/root/reference`` PyTorch
(`tests/test_reference_parity.py`).  These tests close the remaining gap: the
*training* semantics — the loss gradient of
``‖MSE‖₂ + mean(cluster) + space`` (``main_predict.py:273-284``), stop-gradient
placement (``model/backbone.py:86-93``), frozen-BN backward
(``model/I3D.py:76``), the iteration-0 mode flips (``main_predict.py:244-257``)
and the v1 pre-cluster phase (``main.py:181-183``) — verified by:

  (a) whole-model gradient parity: one forward+backward on identical
      translated weights, every parameter leaf's gradient compared
      torch-vs-jax (same ``translate_torch_state`` layout map applied to the
      gradients, which transform like their parameters);
  (b) staged-freeze parity: in the pre-cluster phase torch gives cluster
      params ``grad=None`` — our gradients for those leaves must be exactly 0
      and the gated torch-Adam must leave them untouched;
  (c) N-step trajectory parity: fresh ``torch.optim.Adam(lr, wd=0.02)``
      (``main_predict.py:180``) vs our gated torch-Adam
      (``vadcl_tpu/train/optim.py``) driven by ``make_train_step``, same clip
      sequence, asserting per-step loss equality and final-parameter equality
      in both predict and recon decoder modes.

All comparisons run fp32 on CPU (conftest pins the backend; TPU matmuls use
reduced-precision passes that would mask real mismatches).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vadcl_tpu.core.config import (
    Config,
    DataConfig,
    ModelConfig,
    OptimConfig,
    ScheduleConfig,
)
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.train.checkpoint import flatten_state, tolerant_merge
from vadcl_tpu.train.step import TrainState, make_loss_fn, make_train_step
from vadcl_tpu.train.optim import (
    build_optimizer,
    cosine_epoch_lr,
    param_gate_thresholds,
)
from vadcl_tpu.train.torch_import import translate_torch_state

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from reference_harness import RefArgs, import_reference  # noqa: E402

pytestmark = pytest.mark.slow

FRAME_NUM, RES = 4, 224
# Large enough that 6 Adam steps move parameters measurably (the reference
# default 6e-6 would keep every diff below fp32 noise); small enough to stay
# in the same basin.  The reference sets lr once at data_iter==0
# (main_predict.py:246-248) and its timm cosine scheduler steps per *epoch*,
# so lr is a constant within the compared window on both sides.
LR = 1e-4
NEVER = 10**9


@pytest.fixture(scope="module")
def reference():
    return import_reference()


def _copy_state(ref):
    """state_dict as OWNED numpy copies.  ``tensor.numpy()`` shares memory
    with the live torch parameter — without ``.copy()`` a later
    ``optimizer.step()`` silently mutates what the jax side loaded."""
    return {k: v.detach().cpu().numpy().copy() for k, v in ref.state_dict().items()}


def _build_train_pair(reference, predict: bool, flips: bool):
    """Torch ``Mymodel`` in its TRAIN configuration + our model with the
    translated weights.

    ``flips=True`` applies the reference's iteration-0 staged flips
    (``main_predict.py:244-257``): ``cluster_on`` + ``cluster_center_on`` +
    ``encoder_compatness`` + ``freeze_bn``.  ``flips=False`` is the v1
    pre-cluster phase (``main.py:181-183`` before iteration 500):
    ``iscluster=False``, cluster params frozen from construction
    (``model/backbone.py:46-49``), loss = pixel term only.
    """
    ref_backbone, ref_utils = reference
    import torch

    torch.manual_seed(0)
    ref = ref_backbone.Mymodel(RefArgs(), iscluster=False, ispredict=predict)
    if flips:
        ref.cluster_on()
        ref.cluster_center_on()
        ref.encoder_compatness()
    # live reference BN is frozen either way (constructed eval, model/I3D.py:76;
    # re-frozen at iter 0 via misc/utils.py:205)
    ref.apply(ref_utils.freeze_bn)

    state = _copy_state(ref)
    params, stats, unmatched = translate_torch_state(state, predict=predict)
    assert unmatched == [], unmatched[:10]

    sched = (
        ScheduleConfig()
        if flips
        else ScheduleConfig(
            cluster_start_iter=NEVER,
            cluster_train_start_iter=NEVER,
            compactness_start_iter=NEVER,
        )
    )
    cfg = Config(
        model=ModelConfig(predict=predict),
        data=DataConfig(frame_num=FRAME_NUM),
        optim=OptimConfig(lr=LR, min_lr=1e-6, epochs=120),
        schedule=sched,
    )
    ours = VADModel(config=cfg.model)
    clip0 = jnp.zeros((1, FRAME_NUM, RES, RES, 3), jnp.float32)
    template = jax.jit(ours.init)(jax.random.key(0), clip0)
    flat = {f"params/{k}": v for k, v in params.items()}
    flat.update({f"batch_stats/{k}": v for k, v in stats.items()})
    merged, hits, misses = tolerant_merge(template, flat)
    assert misses == [], misses[:10]
    return ref, ours, cfg, merged


def _torch_train_loss(ref, clip_np: np.ndarray, predict: bool):
    """One training-mode forward + the exact v2 loss
    (``main_predict.py:234-241, 273-284``): predict feeds frames [0:4] and
    targets the clip's last frame; recon reconstructs the whole clip;
    loss = ``torch.norm(MSELoss(none)(recon, target)) + mean(cluster) + space``
    (pixel-only when the cluster branch is off, ``:285-287``)."""
    import torch

    mse = torch.nn.MSELoss(reduction="none")
    xt = torch.from_numpy(np.transpose(clip_np, (0, 4, 1, 2, 3)).copy())
    x_in = xt[:, :, 0:4] if predict else xt
    tgt = xt[:, :, -1:] if predict else xt
    recon, closs, sloss, _, _, _f, _l = ref(x_in)
    loss = torch.norm(mse(recon, tgt))
    if closs is not None:
        loss = loss + torch.mean(closs) + sloss
    return loss


def _torch_grads(ref, predict: bool):
    """{translated_path: grad or None} after a backward."""
    grads, none_keys = {}, []
    for name, p in ref.named_parameters():
        if p.grad is None:
            none_keys.append(name)
            grads[name] = np.zeros_like(p.detach().numpy())
        else:
            grads[name] = p.grad.detach().numpy().copy()
    gparams, _gstats, _ = translate_torch_state(grads, predict=predict)
    none_params, _s, _ = translate_torch_state(
        {k: grads[k] for k in none_keys}, predict=predict
    )
    return gparams, set(none_params)


@pytest.mark.parametrize(
    "predict,flips",
    [(True, True), (False, True), (False, False)],
    ids=["predict", "recon", "recon_precluster"],
)
def test_whole_model_gradient_parity(reference, predict, flips):
    ref, ours, cfg, merged = _build_train_pair(reference, predict, flips)

    rng = np.random.RandomState(42)
    clip = rng.rand(1, FRAME_NUM, RES, RES, 3).astype(np.float32)

    loss_t = _torch_train_loss(ref, clip, predict)
    loss_t.backward()
    gparams, none_set = _torch_grads(ref, predict)

    loss_fn = make_loss_fn(ours, cfg)
    extras = {k: v for k, v in merged.items() if k != "params"}
    (loss_j, _aux), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(merged["params"], extras, jnp.asarray(clip), jnp.zeros((), jnp.int32))

    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    gflat = flatten_state({"params": grads})
    checked = 0
    for k, ref_g in gparams.items():
        ours_g = np.asarray(gflat[f"params/{k}"], np.float32)
        if k in none_set:
            # torch grad=None (frozen cluster params in the pre-cluster
            # phase / identity buffers): our gradient must be exactly zero —
            # this is the stop-gradient / gating semantics under test
            assert float(np.max(np.abs(ours_g))) == 0.0, k
            continue
        scale = float(np.max(np.abs(ref_g)))
        tol = 1e-8 + 2e-3 * scale
        diff = float(np.max(np.abs(ours_g - ref_g)))
        assert diff <= tol, f"{k}: grad max-abs-diff {diff} > {tol} (scale {scale})"
        checked += 1
    assert checked > 300 if flips else checked > 250  # every trainable leaf


@pytest.mark.parametrize("predict", [True, False], ids=["predict", "recon"])
def test_train_trajectory_parity(reference, predict):
    """6 full train steps, fresh Adam both sides, identical clip sequence:
    per-step loss and final parameters must agree."""
    import torch

    ref, ours, cfg, merged = _build_train_pair(reference, predict, flips=True)
    steps = 6
    rng = np.random.RandomState(7)
    clips = [
        rng.rand(1, FRAME_NUM, RES, RES, 3).astype(np.float32)
        for _ in range(steps)
    ]

    # ---- torch: the reference hot loop (main_predict.py:258-338) ----
    opt = torch.optim.Adam(ref.parameters(), lr=LR, weight_decay=0.02)
    torch_losses = []
    for c in clips:
        opt.zero_grad()
        loss = _torch_train_loss(ref, c, predict)
        loss.backward()
        torch_losses.append(float(loss))
        opt.step()

    # ---- ours: the real jitted train step over the same clips ----
    params = merged["params"]
    extras = {k: v for k, v in merged.items() if k != "params"}
    lr = cosine_epoch_lr(cfg.optim.lr, cfg.optim.min_lr, cfg.optim.epochs, 100)
    gates = param_gate_thresholds(
        params, cluster_start_iter=cfg.schedule.cluster_train_start_iter
    )
    tx = build_optimizer(
        cfg.optim.optimizer, lr, weight_decay=cfg.optim.weight_decay,
        b1=cfg.optim.b1, b2=cfg.optim.b2, eps=cfg.optim.eps,
        gate_thresholds=gates,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, extras=extras,
        opt_state=tx.init(params),
    )
    step_fn = make_train_step(ours, cfg, tx, steps_per_epoch=100)
    our_losses = []
    for c in clips:
        state, metrics = step_fn(state, jnp.asarray(c))
        our_losses.append(float(metrics.loss))

    np.testing.assert_allclose(
        our_losses, torch_losses, rtol=1e-4,
        err_msg=f"per-step losses diverged\n ours={our_losses}\ntorch={torch_losses}",
    )

    # Final parameters.  Adam's per-element update is ~ -lr * sign(g) (the
    # bias-corrected m/sqrt(v) is +-1 for any nonzero g), so an element whose
    # true gradient sits within fp32 rounding of zero can legitimately step
    # in OPPOSITE directions on the two sides — a per-element max bound
    # tighter than ~2*lr*steps is wrong by construction.  The trajectory
    # proof is the per-step loss equality above (each step's loss depends on
    # every previous update of every leaf); here we assert (a) a mechanical
    # absolute bound and (b) coherence: almost no element may accumulate more
    # than one lr-step of divergence.
    tparams, _tstats, _ = translate_torch_state(_copy_state(ref), predict=predict)
    fp = flatten_state({"params": state.params})
    init_flat = flatten_state({"params": merged["params"]})
    for k, v in tparams.items():
        ours_p = np.asarray(fp[f"params/{k}"], np.float32)
        diff = np.abs(ours_p - v)
        assert float(diff.max()) <= 2.5 * LR * steps, (
            f"{k}: final-param diff {diff.max()} exceeds the mechanical "
            f"Adam bound {2.5 * LR * steps}"
        )
        flipped = float(np.mean(diff > LR))
        assert flipped < 0.02, (
            f"{k}: {flipped:.1%} of elements diverged by more than one "
            "lr-step — systematic trajectory divergence"
        )
        # and the leaf really trained (moved) on both sides
        init = np.asarray(init_flat[f"params/{k}"], np.float32)
        if float(np.max(np.abs(v - init))) > 0:
            assert float(np.max(np.abs(ours_p - init))) > 0, k
