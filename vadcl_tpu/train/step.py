"""The jitted training step: forward, staged losses, torch-Adam update, DP.

Loss parity with ``main_predict.py:273-284``:
  loss = ||(recon - target)^2||_F  +  mean(cluster_loss)  +  space_loss
(the pixel term is the Frobenius norm of the *elementwise squared error* —
``torch.norm(MSELoss(reduction='none')(...))`` — reproduced exactly), with the
predict-mode frame split of ``main_predict.py:234-241`` (input = the first
``PREDICT_INPUT_FRAMES`` (4) frames exactly as the reference hardcodes
``video[:, :, 0:4]``, target = the window's last frame; at the default
frame_num=4 the target overlaps the input — the reference's quirk).

Staged-training flips (``main_predict.py:244-257``) are step-gated weights
inside one compiled function: cluster losses activate at
``cluster_start_iter``; cluster parameters unfreeze at
``cluster_train_start_iter`` (torch-Adam gates).

Data parallelism: the batch is sharded over the 'data' mesh axis and params
are replicated; XLA inserts the gradient all-reduce over ICI (the TPU-native
replacement for DDP+gloo, SURVEY §2.3).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vadcl_tpu.core.config import Config
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.ops.cluster import frobenius_norm
from vadcl_tpu.train.optim import (
    build_optimizer,
    cosine_epoch_lr,
    param_gate_thresholds,
)


class TrainState(NamedTuple):
    step: jax.Array  # scalar int32
    params: Any
    extras: Any  # non-param variable collections: frozen-BN batch_stats
    #             (constant unless loaded) and, for memory backbones, the
    #             MNAD memory bank (updated every step, like m_items)
    opt_state: Any


class StepMetrics(NamedTuple):
    loss: jax.Array
    loss_pixel: jax.Array
    cluster_loss: jax.Array
    space_loss: jax.Array
    lr: jax.Array
    grad_finite: jax.Array  # non-finite-loss guard (main_predict.py:304-306)
    # reconstruction of this step's batch, carried only when the trainer's
    # periodic visual dump is enabled (Config.dump_every_iters > 0; the
    # reference dumps input+recon JPEGs every 10 iters, main_predict.py:265-267)
    recon: Optional[jax.Array] = None


PREDICT_INPUT_FRAMES = 4  # the reference's literal ``video[:, :, 0:4]``


def normalize_clip(clip: jax.Array) -> jax.Array:
    """uint8 batches normalize ON DEVICE (k -> k/255.0 fp32, bit-identical
    to the host-side /255 the float path carries); float batches pass
    through.  Static dtype branch — resolved at trace time."""
    if clip.dtype == jnp.uint8:
        return clip.astype(jnp.float32) / 255.0
    return clip


def split_predict_batch(
    clip: jax.Array, frame_num: int, predict: bool, overlap_quirk: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """main_predict.py:234-241, literally: predict mode feeds the first **4**
    frames (``video[:, :, 0:4]`` — hardcoded in the reference regardless of
    ``--frame_num``) and targets the clip's LAST frame (``video[:, :, -1:]``).
    At the default ``frame_num=4`` the target coincides with the last input
    frame (the much-discussed overlap quirk); at ``frame_num=5`` the reference
    — and therefore this function — trains a true next-frame prediction.
    Recon mode targets the full clip.

    ``overlap_quirk=False`` gives the MNAD-proper split instead (inputs = all
    but the last frame, target = the true future frame) used by the
    convae_predict backbone."""
    if predict:
        if overlap_quirk:
            return clip[:, :PREDICT_INPUT_FRAMES], clip[:, -1:]
        return clip[:, :-1], clip[:, -1:]
    return clip, clip


def make_loss_fn(model: VADModel, cfg: Config, return_recon: bool = False):
    sched = cfg.schedule
    predict = cfg.model.predict or cfg.model.backbone == "convae_predict"
    overlap_quirk = cfg.model.backbone == "swin"
    mutable_memory = cfg.model.backbone in ("convae", "convae_predict")
    stochastic = (
        cfg.model.drop_rate > 0
        or cfg.model.attn_drop_rate > 0
        or cfg.model.drop_path_rate > 0
    )
    dropout_root = jax.random.key(cfg.seed + 0x5EED)

    def loss_fn(params, extras, clip, step):
        clip = normalize_clip(clip)
        inputs, target = split_predict_batch(
            clip, cfg.data.frame_num, predict, overlap_quirk=overlap_quirk
        )
        variables = {"params": params, **extras}
        rngs = (
            {"dropout": jax.random.fold_in(dropout_root, step)}
            if stochastic
            else None
        )
        if mutable_memory:
            out, updates = model.apply(
                variables,
                inputs,
                deterministic=False,  # train mode drives the MNAD bank update
                mutable=["memory"],
                rngs=rngs,
            )
            new_extras = {**extras, **updates}
        else:
            compact_gate = None
            if cfg.model.backbone == "swin" and cfg.model.compactness:
                compact_gate = (
                    step >= sched.compactness_start_iter
                ).astype(jnp.float32)
            out = model.apply(
                variables,
                inputs,
                deterministic=not stochastic,
                compactness_gate=compact_gate,
                rngs=rngs,
            )
            new_extras = extras
        err = out.recon.astype(jnp.float32) - target.astype(jnp.float32)
        loss_pixel = frobenius_norm(err * err)
        cluster_gate = (step >= sched.cluster_start_iter).astype(jnp.float32)
        cluster_loss = out.cluster_loss * cluster_gate
        space_loss = out.space_loss * cluster_gate
        loss = (
            sched.recon_weight * loss_pixel
            + sched.cluster_weight * cluster_loss
            + sched.space_weight * space_loss
        )
        recon = out.recon if return_recon else None
        return loss, (loss_pixel, cluster_loss, space_loss, new_extras, recon)

    return loss_fn


def create_train_state(
    model: VADModel,
    cfg: Config,
    rng: jax.Array,
    sample_clip: jax.Array,
    steps_per_epoch: int,
) -> Tuple[TrainState, Any]:
    """Initialize params + torch-Adam state; returns (state, tx)."""
    sample_clip = normalize_clip(jnp.asarray(sample_clip))
    inputs, _ = split_predict_batch(
        sample_clip,
        cfg.data.frame_num,
        cfg.model.predict or cfg.model.backbone == "convae_predict",
        overlap_quirk=cfg.model.backbone == "swin",
    )
    # jit the init: eager init dispatches each op separately, which is
    # painfully slow through a remote-TPU tunnel
    variables = jax.jit(model.init)(rng, inputs)
    variables = dict(variables)
    params = variables.pop("params")
    extras = variables  # batch_stats, memory, ...
    lr = cosine_epoch_lr(
        cfg.optim.lr,
        cfg.optim.min_lr,
        cfg.optim.epochs,
        steps_per_epoch,
        cfg.optim.warmup_epochs,
    )
    gates = param_gate_thresholds(
        params, cluster_start_iter=cfg.schedule.cluster_train_start_iter
    )
    tx = build_optimizer(
        cfg.optim.optimizer,
        lr,
        weight_decay=cfg.optim.weight_decay,
        b1=cfg.optim.b1,
        b2=cfg.optim.b2,
        eps=cfg.optim.eps,
        gate_thresholds=gates,
    )
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        extras=extras,
        opt_state=opt_state,
    )
    return state, tx


def make_train_step(
    model: VADModel,
    cfg: Config,
    tx,
    steps_per_epoch: int,
    mesh: Optional[Mesh] = None,
    model_axis: Optional[str] = None,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, StepMetrics]]:
    """Build the jitted train step.  With a mesh, the clip batch is sharded
    over 'data' and everything else replicated; XLA emits the grad all-reduce.

    ``model_axis`` names a second mesh axis for tensor parallelism
    (parallel/tp.py) — the mesh is then 2-D ``(data, model_axis)`` and each
    data shard's forward/backward splits across the model axis.  Two
    mechanisms, selected by the attention path: the XLA path shards heads /
    MLP hidden width via GSPMD constraints; the folded Pallas path
    (``attn_kernel in ("fold", "fold_block")``) dispatches its kernels via
    ``shard_map`` with the window rows split over the axis
    (tp.py:shard_windows_call).  The remaining fused kernels ("base",
    "packed" window layouts) are single-device programs with no shard_map
    dispatch — rejected."""
    from vadcl_tpu.core.config import TRAINABLE_ATTN_KERNELS

    if (
        cfg.model.fused_attention
        and cfg.model.attn_kernel not in TRAINABLE_ATTN_KERNELS
    ):
        # inference-only kernels have no VJP; without this guard training
        # with e.g. attn_kernel="packed" dies deep inside JAX instead of at
        # the config boundary
        raise ValueError(
            f"attn_kernel={cfg.model.attn_kernel!r} is inference-only (no "
            f"custom VJP); trainable kernels: {sorted(TRAINABLE_ATTN_KERNELS)}"
        )
    if model_axis is not None:
        if mesh is None or model_axis not in mesh.axis_names:
            raise ValueError(
                f"model_axis={model_axis!r} requires a mesh with that axis "
                f"(got {mesh and mesh.axis_names})"
            )
        if cfg.model.fused_attention and cfg.model.attn_kernel not in (
            "fold",
            "fold_block",
        ):
            raise ValueError(
                "model-axis parallelism runs the XLA attention path or the "
                "folded Pallas kernels (attn_kernel='fold'/'fold_block', "
                "shard_map-dispatched); the 'base'/'packed' window-layout "
                "kernels are single-device — set fused_attention=False or "
                "attn_kernel='fold'"
            )
    from vadcl_tpu.parallel.tp import model_parallel

    loss_fn = make_loss_fn(
        model, cfg, return_recon=cfg.dump_every_iters > 0
    )
    lr_sched = cosine_epoch_lr(
        cfg.optim.lr,
        cfg.optim.min_lr,
        cfg.optim.epochs,
        steps_per_epoch,
        cfg.optim.warmup_epochs,
    )

    def step_fn(state: TrainState, clip: jax.Array):
        # the model-parallel context is entered INSIDE the jitted body so the
        # sharding constraints are baked into this trace (no-op when
        # model_axis is None)
        with model_parallel(mesh, model_axis):
            (loss, (lp, lc, ls, new_extras, recon)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, state.extras, clip, state.step
                )
            )
        finite = jnp.isfinite(loss)
        if cfg.optim.clip_grad > 0:
            gnorm = optax_global_norm(grads)
            scale = jnp.minimum(1.0, cfg.optim.clip_grad / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(
            grads, state.opt_state, state.params, step=state.step
        )
        # non-finite guard: hold the params if the loss exploded (the
        # reference aborts; we skip the update and surface the flag)
        new_params = jax.tree_util.tree_map(
            lambda p, u: jnp.where(finite, p + u, p), state.params, updates
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            extras=new_extras,
            opt_state=jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new_opt, state.opt_state
            ),
        )
        metrics = StepMetrics(
            loss=loss,
            loss_pixel=lp,
            cluster_loss=lc,
            space_loss=ls,
            lr=lr_sched(state.step),
            grad_finite=finite,
            recon=recon,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn)

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    # shardings by pytree prefix: whole state replicated, batch split on data
    return jax.jit(
        step_fn,
        in_shardings=(replicated, batch_sharded),
        out_shardings=(replicated, replicated),
    )


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
    )
