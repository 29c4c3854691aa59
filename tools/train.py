"""Training driver for real frame-folder datasets (ShanghaiTech/Avenue/Ped2).

The replacement for ``main_predict.py`` (and the stale ``main.py``):

  python tools/train.py --preset shanghaitech --data-path /data/frames \\
      [--test-data-path ... --label-path ...] [--predict] [--epochs N]
      [--resume] [--eval-every 4]

One typed Config drives everything; checkpoints land under
``<output-dir>/ckpt`` with auto-resume; optional periodic AUC eval keeps a
'best' checkpoint (the reference's commented-out hook, main_predict.py:212-218).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vadcl_tpu.core.config import preset
from vadcl_tpu.core.mesh import make_mesh, maybe_initialize_distributed
from vadcl_tpu.data import ClipDataset, HostDataLoader
from vadcl_tpu.eval.predict import (
    eval_input_frames,
    evaluate_videos,
    make_video_scorer,
)
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.train.loop import train


def build_eval_fn(cfg, test_dir, label_dir, mesh=None):
    test_ds = ClipDataset(
        test_dir,
        frame_num=cfg.data.frame_num,
        size=cfg.data.image_size,
        label_root=label_dir,
        istest=True,
    )
    dtype = (
        jnp.bfloat16 if cfg.bf16 and jax.default_backend() != "cpu" else jnp.float32
    )
    model = VADModel(config=cfg.model, dtype=dtype)
    predict = cfg.model.predict or cfg.model.backbone == "convae_predict"

    def eval_fn(state) -> float:
        variables = {"params": state.params, **state.extras}

        def apply_fn(clips):
            return model.apply(variables, clips).recon

        scorer = make_video_scorer(
            apply_fn,
            frame_num=cfg.data.frame_num,
            predict=predict,
            batch_windows=cfg.eval.batch_windows,
            mesh=mesh,
            input_frames=eval_input_frames(
                cfg.model.backbone, predict, cfg.data.frame_num
            ),
        )
        auc, per_scene, _ = evaluate_videos(
            scorer,
            test_ds.iter_test_videos(),
            frame_num=cfg.data.frame_num,
            predict=predict,
            protocol=cfg.eval.protocol,
        )
        print("per-scene AUC:", {k: round(v, 4) for k, v in per_scene.items()})
        print("mean scene AUC:", round(auc, 4))
        return auc

    return eval_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="shanghaitech")
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--test-data-path", default="")
    ap.add_argument("--label-path", default="")
    ap.add_argument("--output-dir", default="log_dir")
    ap.add_argument("--predict", action="store_true")
    ap.add_argument("--epochs", type=int, default=0)
    ap.add_argument("--batch-size", type=int, default=0, help="per device")
    ap.add_argument("--lr", type=float, default=0.0)
    ap.add_argument("--frame-num", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=0, help="epochs")
    ap.add_argument("--max-steps", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cluster-start-iter", type=int, default=0)
    ap.add_argument(
        "--dump-every-iters", type=int, default=0,
        help="dump target+recon JPEGs every N steps to "
        "<output-dir>/video_show{,_origin} (reference: every 10, "
        "main_predict.py:265-267); 0 disables",
    )
    ap.add_argument("--no-cluster", action="store_true")
    ap.add_argument("--backbone", default="swin",
                    choices=["swin", "unet3d", "convae", "convae_predict"])
    ap.add_argument(
        "--fused", default=None, action=argparse.BooleanOptionalAction,
        help="Pallas fused window-attention + cluster kernels. Default: on "
        "when running on TPU, off on CPU (where only interpret mode exists).",
    )
    ap.add_argument(
        "--attn-kernel", default="auto",
        choices=["auto", "base", "fold", "fold_block"],
        help="fused attention kernel variant (trainable ones only). auto = "
        "'fold' when fused (partition/reverse/LN folded into the kernel, "
        "measured 1.17-1.19x over 'base' at flagship geometry), else 'base'.",
    )
    ap.add_argument(
        "--model-parallel", type=int, default=1,
        help="shard attention heads + MLP hidden over a 2nd mesh axis of "
        "this size (tensor parallelism, parallel/tp.py). Devices split as "
        "(n_devices/N data) x (N model); runs the XLA attention path, so "
        "--fused is forced off. 1 = pure data parallelism (default).",
    )
    args = ap.parse_args()

    maybe_initialize_distributed()
    fused = args.fused
    if fused is None:
        fused = jax.default_backend() not in ("cpu",)
    if fused and args.backbone != "swin":
        fused = False  # the fused kernels live in the Swin attention/cluster path
    if args.model_parallel > 1:
        # tensor parallelism partitions the XLA attention path via GSPMD;
        # pallas_call is opaque to the partitioner (train/step.py guard)
        fused = False
    attn_kernel = args.attn_kernel
    if attn_kernel == "auto":
        attn_kernel = "fold" if fused else "base"
    cfg = preset(args.preset)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            data_path=args.data_path,
            test_data_path=args.test_data_path,
            label_path=args.label_path,
            frame_num=args.frame_num or cfg.data.frame_num,
        ),
        model=dataclasses.replace(
            cfg.model,
            predict=args.predict,
            backbone=args.backbone,
            use_cluster=not args.no_cluster,
            fused_attention=fused,
            fused_cluster=fused,
            attn_kernel=attn_kernel,
        ),
        schedule=dataclasses.replace(
            cfg.schedule,
            cluster_start_iter=args.cluster_start_iter,
            cluster_train_start_iter=args.cluster_start_iter,
        ),
        output_dir=args.output_dir,
        seed=args.seed,
        dump_every_iters=args.dump_every_iters,
    )
    if args.epochs:
        cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, epochs=args.epochs))
    if args.lr:
        cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, lr=args.lr))
    if args.batch_size:
        cfg = cfg.replace(batch_size_per_device=args.batch_size)

    model_axis = None
    if args.model_parallel > 1:
        from vadcl_tpu.core.mesh import make_mesh_2d

        n_all = cfg.mesh.num_devices or len(jax.devices())
        tp = args.model_parallel
        if n_all % tp:
            raise SystemExit(
                f"--model-parallel {tp} must divide the device count {n_all}"
            )
        mesh = make_mesh_2d(n_all // tp, tp)
        model_axis = "model"
        n_dev = n_all // tp  # the batch shards over the data axis only
    else:
        mesh = (
            make_mesh(cfg.mesh.num_devices) if len(jax.devices()) > 1 else None
        )
        n_dev = len(jax.devices()) if mesh else 1
    ds = ClipDataset(
        cfg.data.data_path, frame_num=cfg.data.frame_num, size=cfg.data.image_size
    )
    loader = HostDataLoader(
        ds,
        batch_size=cfg.batch_size_per_device * n_dev,
        seed=cfg.seed,
        num_workers=cfg.data.num_workers,
        prefetch=cfg.data.prefetch,
        host_id=jax.process_index(),
        num_hosts=jax.process_count(),
    )
    print(f"{len(ds)} train clips on {n_dev} devices")

    eval_fn = None
    if args.test_data_path and args.eval_every:
        eval_fn = build_eval_fn(
            cfg, args.test_data_path, args.label_path, mesh=mesh
        )

    train(
        cfg,
        loader,
        mesh=mesh,
        eval_fn=eval_fn,
        eval_every_epochs=args.eval_every,
        max_steps=args.max_steps or None,
        model_axis=model_axis,
    )


if __name__ == "__main__":
    main()
