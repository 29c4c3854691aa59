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


def get_logger(
    path: str, name: str = "vadcl", to_file: bool = True
) -> logging.Logger:
    """File logger, [time][file][line][level] format, truncating per run
    (``misc/utils.py:79-95``).

    ``to_file=False`` returns a silenced logger (NullHandler, no propagation)
    — non-zero processes of a multi-host run log nowhere, the reference's
    master-only discipline (``utils/distritributed_model.py:23-35``,
    mmaction ``get_root_logger`` rank gating)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    if not to_file:
        logger.addHandler(logging.NullHandler())
        logger.propagate = False
        return logger
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
    profile_steps: int = 0,  # jax.profiler trace of steps [2, 2+profile_steps)
    debug_nans: bool = False,  # the analogue of set_detect_anomaly (SURVEY §5.2)
    model_axis: Optional[str] = None,  # 2-D mesh tensor parallelism (tp.py)
) -> TrainState:
    # Rank gating: in a multi-process run every process executes the same
    # loop (the jitted step is collective), but ONLY process 0 touches the
    # shared output_dir — exp.log, checkpoints, loss records, auc_record.csv
    # and JPEG dumps would otherwise race on same-path renames (the
    # reference's master-only discipline, ``utils/distritributed_model.py:
    # 23-35`` + ``save_on_master``, ``有用的函数包.py:470``).
    is_main = jax.process_index() == 0
    if is_main:
        os.makedirs(cfg.output_dir, exist_ok=True)
        from vadcl_tpu.utils.provenance import write_run_stamp

        write_run_stamp(cfg.output_dir, cfg)
    logger = get_logger(
        os.path.join(cfg.output_dir, "exp.log"), to_file=is_main
    )
    ckpt = CheckpointManager(os.path.join(cfg.output_dir, "ckpt"))
    if debug_nans:
        jax.config.update("jax_debug_nans", True)

    dtype = (
        jax.numpy.bfloat16
        if cfg.bf16 and jax.default_backend() != "cpu"
        else jax.numpy.float32
    )
    model = VADModel(config=cfg.model, dtype=dtype)
    steps_per_epoch = loader.steps_per_epoch()
    sample = next(iter(loader.epoch(0)))
    state, tx = create_train_state(
        model, cfg, jax.random.key(cfg.seed), sample, steps_per_epoch
    )
    step_fn = make_train_step(
        model, cfg, tx, steps_per_epoch, mesh=mesh, model_axis=model_axis
    )

    # auto-resume from the newest checkpoint if present.  Checkpoints record
    # (epoch, iter); resume continues INSIDE the epoch with the sampler
    # fast-forwarded, so a crash between per-iteration saves loses at most
    # save_every_iters batches and the step-driven LR schedule stays aligned
    # (the reference restarts whole epochs via --start, main_predict.py:129).
    latest = ckpt.latest_tag()
    start_epoch, start_iter = 0, 0
    if latest is not None:
        state = ckpt.restore(latest, state)
        meta = ckpt.metadata(latest)
        start_epoch = int(meta.get("epoch", 0))
        start_iter = int(meta.get("iter", steps_per_epoch - 1)) + 1
        if start_iter >= steps_per_epoch:
            start_epoch, start_iter = start_epoch + 1, 0
        logger.info(
            f"resumed from checkpoint {latest} at epoch {start_epoch} "
            f"iter {start_iter}"
        )

    # Multi-process: each host's loader yields its LOCAL batch shard; the
    # jitted step's in_sharding expects the GLOBAL array, so shards assemble
    # via multihost_utils (parallel/sharding.py) before dispatch.
    multihost = mesh is not None and jax.process_count() > 1
    if multihost:
        from vadcl_tpu.parallel.sharding import local_batch_to_global

        def to_device(batch):
            return local_batch_to_global(np.asarray(batch), mesh)
    else:
        def to_device(batch):
            return jax.numpy.asarray(batch)

    from vadcl_tpu.utils.profiling import StepTimer, trace_steps

    timer = StepTimer(
        clips_per_step=loader.batch_size * jax.process_count()
    )
    best_auc = -1.0
    state_box = {"prev_loss": None, "spike_dumped": False}
    # per-step loss records for the ablation plotter (the reference trainers
    # accumulate loss_log and save loss_record/*.npy — main.py:205-213,
    # main_predict.py:311; consumed by loss_contrast.py / visualize.py losses)
    loss_record_dir = os.path.join(cfg.output_dir, "loss_record")
    loss_log = {"loss": [], "loss_pixel": [], "cluster_loss": [], "space_loss": []}

    def flush_loss_records():
        if not is_main or not loss_log["loss"]:
            return
        os.makedirs(loss_record_dir, exist_ok=True)
        for name, vals in loss_log.items():
            np.save(os.path.join(loss_record_dir, f"{name}.npy"), np.asarray(vals))

    if latest is not None:
        # carry pre-crash records across resume (truncated to the resumed step)
        for name in loss_log:
            p = os.path.join(loss_record_dir, f"{name}.npy")
            if os.path.exists(p):
                loss_log[name] = list(np.load(p)[: int(state.step)])

    def process_metrics(m_host, epoch_h, it_h, batch_h, step_h):
        """Host-side guards + logging for one step's metrics."""
        loss = float(m_host.loss)
        if not np.isfinite(loss):
            logger.error(f"Loss is {loss}, stopping training")
            raise FloatingPointError(f"non-finite loss at step {step_h}")
        # loss-spike batch capture (main_predict.py:290-294: a >10 jump
        # dumps the offending batch once per run to bug_data_detect/)
        prev = state_box["prev_loss"]
        if is_main and prev is not None and abs(loss - prev) > 10.0 and not state_box[
            "spike_dumped"
        ]:
            from vadcl_tpu.viz.dumps import save_clip_frames

            save_clip_frames(
                batch_h, os.path.join(cfg.output_dir, "bug_data_detect")
            )
            state_box["spike_dumped"] = True
            logger.warning(f"loss jumped {prev:.3f} -> {loss:.3f}; batch dumped")
        state_box["prev_loss"] = loss
        # periodic input/recon visual dump (main_predict.py:265-267: every 10
        # iters the reference saves the target frames and the reconstruction
        # as JPEG sequences — its routine visual-inspection hook, SURVEY §4.2)
        if is_main and cfg.dump_every_iters and step_h % cfg.dump_every_iters == 0:
            from vadcl_tpu.train.step import split_predict_batch
            from vadcl_tpu.viz.dumps import save_clip_frames

            predict = (
                cfg.model.predict or cfg.model.backbone == "convae_predict"
            )
            batch_f = np.asarray(batch_h)
            if batch_f.dtype == np.uint8:
                batch_f = batch_f.astype(np.float32) / 255.0
            _, target = split_predict_batch(
                batch_f, cfg.data.frame_num, predict,
                overlap_quirk=cfg.model.backbone == "swin",
            )
            save_clip_frames(
                np.asarray(target),
                os.path.join(cfg.output_dir, "video_show_origin"),
            )
            save_clip_frames(
                np.asarray(m_host.recon, np.float32),
                os.path.join(cfg.output_dir, "video_show"),
            )
        loss_log["loss"].append(loss)
        loss_log["loss_pixel"].append(float(m_host.loss_pixel))
        loss_log["cluster_loss"].append(float(m_host.cluster_loss))
        loss_log["space_loss"].append(float(m_host.space_loss))
        logger.info(
            "Epoch:[{}/{}]\t batch:[{}/{}]\t loss={:.5f}\t lr={:.7f}\t "
            "clips/s={:.1f}".format(
                epoch_h, cfg.optim.epochs, it_h, steps_per_epoch, loss,
                float(m_host.lr), timer.clips_per_sec,
            )
        )

    profiler_ctx = None
    profile_stop_at = None
    lagged = None
    t0 = time.time()
    # Host-side mirror of state.step: int(state.step) would BLOCK on the
    # in-flight step every iteration (device buffers materialize when the
    # whole jitted step finishes), serializing host dispatch against device
    # compute and defeating the lagged-metrics pipeline below.  The counter
    # advances exactly once per step_fn call, so the mirror stays equal.
    host_step = int(state.step)
    for epoch in range(start_epoch, cfg.optim.epochs):
        first_iter = start_iter if epoch == start_epoch else 0
        for it, batch in enumerate(
            loader.epoch(epoch, start_iter=first_iter), start=first_iter
        ):
            if profile_steps and profiler_ctx is None and host_step >= 2:
                profiler_ctx = trace_steps(
                    os.path.join(cfg.output_dir, "profile")
                )
                profiler_ctx.__enter__()
                profile_stop_at = host_step + profile_steps
            state, m = step_fn(state, to_device(batch))
            host_step += 1
            if profiler_ctx is not None and host_step >= profile_stop_at:
                profiler_ctx.__exit__(None, None, None)
                profiler_ctx = None
                profile_steps = 0
            timer.tick()
            # Consume metrics with a ONE-STEP LAG: float(loss) blocks on the
            # device (a full roundtrip through remote-TPU tunnels), which
            # would serialize host dispatch against device compute.  Guards
            # react one step late — same abort semantics, overlapped execution.
            if lagged is not None:
                process_metrics(*lagged)
            lagged = (m, epoch, it, batch, host_step)
            if cfg.save_every_iters and host_step % cfg.save_every_iters == 0:
                # Drain the lagged metric BEFORE the resume point: the saved
                # checkpoint says step N, so loss_record must hold steps 1..N
                # or a genuine crash right after this save loses step N's
                # entry and shifts every later record by one.  We block on
                # the device here anyway for the checkpoint fetch.
                process_metrics(*lagged)
                lagged = None
                if is_main:
                    ckpt.save(
                        str(host_step), state, {"epoch": epoch, "iter": it}
                    )
                flush_loss_records()
            if max_steps is not None and host_step >= max_steps:
                if lagged is not None:
                    process_metrics(*lagged)
                flush_loss_records()
                return state
        if lagged is not None:  # complete the epoch's records before flushing
            process_metrics(*lagged)
            lagged = None
        flush_loss_records()
        if is_main and cfg.save_every_epochs and (
            (epoch + 1) % cfg.save_every_epochs == 0
        ):
            ckpt.save(
                str(host_step),
                state,
                {"epoch": epoch, "iter": steps_per_epoch - 1},
            )
        if eval_fn is not None and eval_every_epochs and (
            (epoch + 1) % eval_every_epochs == 0
        ):
            auc = eval_fn(state)
            logger.info(f"epoch {epoch} AUC={auc:.4f}")
            # auc_record capability (main_predict.py:198-199, 217-218; csv
            # instead of xlsx)
            if is_main:
                with open(
                    os.path.join(cfg.output_dir, "auc_record.csv"), "a"
                ) as f:
                    f.write(f"{epoch},{auc:.6f}\n")
            if auc > best_auc:
                best_auc = auc
                if is_main:
                    ckpt.save("best", state, {"epoch": epoch, "auc": auc})
    if lagged is not None:
        process_metrics(*lagged)  # drain the final lagged step
    flush_loss_records()
    logger.info(f"training done in {time.time() - t0:.1f}s")
    return state
