"""Optimizer with torch.optim.Adam parity + staged parameter gating.

The reference trains with ``torch.optim.Adam(lr, weight_decay=0.02)``
(``main_predict.py:180``) — classic L2 Adam (wd added to the gradient before
the moment updates, NOT decoupled AdamW) — under a per-epoch timm cosine LR
schedule (``:184-185``), and stages which parameters receive gradients by
flipping ``requires_grad`` at iteration thresholds (``model/backbone.py:46-77``,
``main_predict.py:249-257``).

In a jitted world requires_grad flips become *gates*: every leaf carries an
integer unfreeze step; while ``step < threshold`` the leaf behaves exactly like
a torch param with ``grad=None`` — no weight decay, no moment update, no
bias-correction count advance.  One compiled step serves the whole schedule.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def cosine_epoch_lr(
    base_lr: float,
    min_lr: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 0,
    warmup_lr_init: float = 1e-6,
) -> Callable[[jax.Array], jax.Array]:
    """timm CosineLRScheduler parity, stepped per *epoch*
    (``main_predict.py:184-185,348``): lr(e) = min + 0.5 (base - min)
    (1 + cos(pi e / epochs)); optional linear warmup over warmup_epochs."""

    def schedule(step: jax.Array) -> jax.Array:
        epoch = jnp.floor_divide(step, steps_per_epoch).astype(jnp.float32)
        cos_lr = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * epoch / epochs)
        )
        if warmup_epochs > 0:
            warm = warmup_lr_init + (base_lr - warmup_lr_init) * (
                epoch / warmup_epochs
            )
            return jnp.where(epoch < warmup_epochs, warm, cos_lr)
        return cos_lr

    return schedule


class TorchAdamState(NamedTuple):
    count: Any  # per-leaf int32 step counts (advance only while ungated)
    mu: Any
    nu: Any


def param_gate_thresholds(
    params: Any,
    cluster_start_iter: int = 0,
    match: str = "cluster",
) -> Any:
    """Per-leaf unfreeze-step pytree: params whose path contains ``match``
    unfreeze at ``cluster_start_iter`` (the reference freezes exactly the
    params whose *name* contains 'cluster', ``model/backbone.py:46-49``),
    everything else at 0."""

    def threshold(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        gated = any(match in str(n) for n in names)
        return jnp.asarray(cluster_start_iter if gated else 0, jnp.int32)

    return jax.tree_util.tree_map_with_path(threshold, params)


def torch_adam(
    learning_rate: Callable[[jax.Array], jax.Array] | float,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    gate_thresholds: Optional[Any] = None,
    decoupled_wd: bool = False,
) -> optax.GradientTransformation:
    """torch.optim.Adam semantics with optional per-leaf step gating.

    Update per leaf (while step >= threshold):
      g     <- g + wd * p             (L2; with ``decoupled_wd`` this becomes
                                       torch.optim.AdamW's  p -= lr * wd * p)
      m     <- b1 m + (1-b1) g        ; v <- b2 v + (1-b2) g^2
      t     <- t + 1                  (per-leaf, like torch per-param state)
      p     <- p - lr * (m / (1-b1^t)) / (sqrt(v / (1-b2^t)) + eps)
    Gated leaves keep m, v, t untouched and receive zero update — identical to
    torch skipping params whose grad is None.
    """

    def init(params):
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params
        )
        counts = jax.tree_util.tree_map(
            lambda p: jnp.zeros((), jnp.int32), params
        )
        return TorchAdamState(count=counts, mu=zeros, nu=zeros)

    def update(grads, state, params=None, *, step=None):
        assert params is not None, "torch_adam requires params"
        if step is None:
            # fall back to max leaf count (works when never gated)
            step = jax.tree_util.tree_reduce(
                jnp.maximum, state.count, jnp.zeros((), jnp.int32)
            )
        lr = (
            learning_rate(step)
            if callable(learning_rate)
            else jnp.asarray(learning_rate, jnp.float32)
        )
        thresholds = gate_thresholds
        if thresholds is None:
            thresholds = jax.tree_util.tree_map(
                lambda g: jnp.zeros((), jnp.int32), grads
            )

        def leaf_update(g, p, m, v, t, thr):
            gate = (step >= thr).astype(jnp.float32)
            g = g.astype(jnp.float32) * gate
            if not decoupled_wd:
                g = g + weight_decay * p.astype(jnp.float32) * gate
            new_m = jnp.where(gate > 0, b1 * m + (1 - b1) * g, m)
            new_v = jnp.where(gate > 0, b2 * v + (1 - b2) * g * g, v)
            new_t = t + (step >= thr).astype(jnp.int32)
            # while gated new_t is 0 and 1 - b^0 = 0: clamp to avoid 0/0 NaN
            # (the result is multiplied by gate=0 anyway)
            tf = jnp.maximum(new_t, 1).astype(jnp.float32)
            m_hat = new_m / (1.0 - b1**tf)
            v_hat = new_v / (1.0 - b2**tf)
            upd = -lr * m_hat / (jnp.sqrt(v_hat) + eps) * gate
            if decoupled_wd:
                upd = upd - lr * weight_decay * p.astype(jnp.float32) * gate
            return upd.astype(p.dtype), new_m, new_v, new_t

        flat = jax.tree_util.tree_map(
            leaf_update, grads, params, state.mu, state.nu, state.count, thresholds
        )
        updates = jax.tree_util.tree_map(
            lambda x: x[0], flat, is_leaf=lambda x: isinstance(x, tuple)
        )
        new_mu = jax.tree_util.tree_map(
            lambda x: x[1], flat, is_leaf=lambda x: isinstance(x, tuple)
        )
        new_nu = jax.tree_util.tree_map(
            lambda x: x[2], flat, is_leaf=lambda x: isinstance(x, tuple)
        )
        new_count = jax.tree_util.tree_map(
            lambda x: x[3], flat, is_leaf=lambda x: isinstance(x, tuple)
        )
        return updates, TorchAdamState(count=new_count, mu=new_mu, nu=new_nu)

    return optax.GradientTransformation(init, update)


class TorchSGDState(NamedTuple):
    momentum: Any


def torch_sgd(
    learning_rate: Callable[[jax.Array], jax.Array] | float,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    gate_thresholds: Optional[Any] = None,
) -> optax.GradientTransformation:
    """torch.optim.SGD semantics (the reference's --optimizer sgd choice,
    ``main_predict.py:88-90``) with the same per-leaf gating:
      g <- g + wd * p;  buf <- mu * buf + g;  p <- p - lr * buf
    """

    def init(params):
        return TorchSGDState(
            momentum=jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=jnp.float32), params
            )
        )

    def update(grads, state, params=None, *, step=None):
        assert params is not None and step is not None
        lr = (
            learning_rate(step)
            if callable(learning_rate)
            else jnp.asarray(learning_rate, jnp.float32)
        )
        thresholds = gate_thresholds
        if thresholds is None:
            thresholds = jax.tree_util.tree_map(
                lambda g: jnp.zeros((), jnp.int32), grads
            )

        def leaf(g, p, buf, thr):
            gate = (step >= thr).astype(jnp.float32)
            g = (g.astype(jnp.float32) + weight_decay * p.astype(jnp.float32)) * gate
            new_buf = jnp.where(gate > 0, momentum * buf + g, buf)
            upd = -lr * new_buf * gate
            return upd.astype(p.dtype), new_buf

        flat = jax.tree_util.tree_map(leaf, grads, params, state.momentum, thresholds)
        is_leaf = lambda x: isinstance(x, tuple)
        updates = jax.tree_util.tree_map(lambda x: x[0], flat, is_leaf=is_leaf)
        new_buf = jax.tree_util.tree_map(lambda x: x[1], flat, is_leaf=is_leaf)
        return updates, TorchSGDState(momentum=new_buf)

    return optax.GradientTransformation(init, update)


def build_optimizer(
    name: str,
    learning_rate,
    weight_decay: float,
    b1: float,
    b2: float,
    eps: float,
    gate_thresholds=None,
) -> optax.GradientTransformation:
    """Optimizer family switch (reference --optimizer choices + live Adam)."""
    if name == "adam":
        return torch_adam(
            learning_rate, weight_decay, b1, b2, eps, gate_thresholds
        )
    if name == "adamw":
        return torch_adam(
            learning_rate, weight_decay, b1, b2, eps, gate_thresholds,
            decoupled_wd=True,
        )
    if name == "sgd":
        return torch_sgd(
            learning_rate, momentum=b1, weight_decay=weight_decay,
            gate_thresholds=gate_thresholds,
        )
    if name == "lars":
        # capability parity with the DINO archive's LARS (有用的函数包.py:576);
        # no staged gating (the reference never combined the two)
        return optax.chain(
            optax.lars(
                learning_rate=lambda step: learning_rate(step)
                if callable(learning_rate)
                else learning_rate,
                weight_decay=weight_decay,
                momentum=b1,
            )
        )
    raise ValueError(f"unknown optimizer {name!r}")
