"""Epoch training loop: data, step, logging, checkpoints, eval hooks.

The jitted-step analogue of ``train_dino`` / ``train_one_epoch``
(``main_predict.py:135-349``): per-epoch cosine LR (stepped inside the jitted
fn), per-epoch + per-N-iteration checkpoints, file logging with the
reference's line format, non-finite-loss abort, optional periodic AUC eval
with best-checkpoint keeping (the reference's commented-out hook,
``main_predict.py:212-218``).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Optional

import jax
import numpy as np

from vadcl_tpu.core.config import Config
from vadcl_tpu.data.loader import HostDataLoader
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.train.checkpoint import CheckpointManager
from vadcl_tpu.train.step import TrainState, create_train_state, make_train_step


def get_logger(path: str, name: str = "vadcl") -> logging.Logger:
    """File logger, [time][file][line][level] format, truncating per run
    (``misc/utils.py:79-95``)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(path, "w")
    fh.setFormatter(
        logging.Formatter(
            "[%(asctime)s][%(filename)s][line:%(lineno)d][%(levelname)s] %(message)s"
        )
    )
    logger.addHandler(fh)
    return logger


def train(
    cfg: Config,
    loader: HostDataLoader,
    mesh=None,
    eval_fn: Optional[Callable[[TrainState], float]] = None,
    eval_every_epochs: int = 0,
    max_steps: Optional[int] = None,
) -> TrainState:
    os.makedirs(cfg.output_dir, exist_ok=True)
    logger = get_logger(os.path.join(cfg.output_dir, "exp.log"))
    ckpt = CheckpointManager(os.path.join(cfg.output_dir, "ckpt"))

    model = VADModel(config=cfg.model)
    steps_per_epoch = loader.steps_per_epoch()
    sample = next(iter(loader.epoch(0)))
    state, tx = create_train_state(
        model, cfg, jax.random.key(cfg.seed), sample, steps_per_epoch
    )
    step_fn = make_train_step(model, cfg, tx, steps_per_epoch, mesh=mesh)

    # auto-resume from the newest checkpoint if present
    latest = ckpt.latest_tag()
    start_epoch = 0
    if latest is not None:
        state = ckpt.restore(latest, state)
        start_epoch = int(ckpt.metadata(latest).get("epoch", 0)) + 1
        logger.info(f"resumed from checkpoint {latest} at epoch {start_epoch}")

    best_auc = -1.0
    t0 = time.time()
    for epoch in range(start_epoch, cfg.optim.epochs):
        for it, batch in enumerate(loader.epoch(epoch)):
            state, m = step_fn(state, jax.numpy.asarray(batch))
            loss = float(m.loss)
            if not np.isfinite(loss):
                logger.error(f"Loss is {loss}, stopping training")
                raise FloatingPointError(f"non-finite loss at step {int(state.step)}")
            logger.info(
                "Epoch:[{}/{}]\t batch:[{}/{}]\t loss={:.5f}\t lr={:.7f}".format(
                    epoch, cfg.optim.epochs, it, steps_per_epoch, loss, float(m.lr)
                )
            )
            if cfg.save_every_iters and int(state.step) % cfg.save_every_iters == 0:
                ckpt.save(str(int(state.step)), state, {"epoch": epoch})
            if max_steps is not None and int(state.step) >= max_steps:
                return state
        if cfg.save_every_epochs and (epoch + 1) % cfg.save_every_epochs == 0:
            ckpt.save(str(int(state.step)), state, {"epoch": epoch})
        if eval_fn is not None and eval_every_epochs and (
            (epoch + 1) % eval_every_epochs == 0
        ):
            auc = eval_fn(state)
            logger.info(f"epoch {epoch} AUC={auc:.4f}")
            if auc > best_auc:
                best_auc = auc
                ckpt.save("best", state, {"epoch": epoch, "auc": auc})
    logger.info(f"training done in {time.time() - t0:.1f}s")
    return state
