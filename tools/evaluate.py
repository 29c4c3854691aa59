"""Evaluation driver: checkpoint -> per-scene frame-level AUROC.

Replacement for the reference's four eval scripts (``tool/evaluate.py``,
``tool/contrast_evaluae.py``, ``tool/predict_evaluae.py``, and the embedded
tester in ``main_predict.py``) with the protocol as a flag:

  python tools/evaluate.py --ckpt log_dir/ckpt/ckpt_100.npz \\
      --test-data-path /data/test/frames --label-path /data/test/labels \\
      [--predict] [--protocol stride1|nonoverlap|stride1_first_frame] \\
      [--torch-ckpt reference.pth]  # translated reference weights

Also dumps per-video anomaly-score curves to ``scores.npz`` for the
paradigm-comparison plots (tool/temp.csv capability).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vadcl_tpu.core.config import preset
from vadcl_tpu.core.mesh import make_mesh, maybe_initialize_distributed
from vadcl_tpu.data import ClipDataset
from vadcl_tpu.eval.predict import (
    eval_input_frames,
    evaluate_videos,
    make_video_scorer,
)
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.train.checkpoint import tolerant_merge
from vadcl_tpu.train.step import TrainState


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="shanghaitech")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--torch-ckpt", default="")
    ap.add_argument("--test-data-path", required=True)
    ap.add_argument("--label-path", required=True)
    ap.add_argument("--predict", action="store_true")
    ap.add_argument("--protocol", default="stride1",
                    choices=["stride1", "nonoverlap", "stride1_first_frame"])
    ap.add_argument("--batch-windows", type=int, default=8)
    ap.add_argument("--frame-num", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=0,
                    help="override square eval resolution (must match training)")
    ap.add_argument("--backbone", default="swin",
                    choices=["swin", "unet3d", "convae", "convae_predict"])
    ap.add_argument("--fused", action="store_true",
                    help="fused Pallas attention (TPU)")
    ap.add_argument(
        "--attn-kernel", default="auto",
        choices=["auto", "base", "packed", "fold", "fold_block"],
        help="fused attention kernel. auto = 'fold' when --fused (in-kernel "
        "partition/reverse/LN; fastest measured at flagship geometry).",
    )
    ap.add_argument("--out", default="scores.npz")
    args = ap.parse_args()

    import dataclasses

    # multi-chip eval (the TPU-native analogue of the reference DDP-wrapping
    # its eval tools, tool/contrast_evaluae.py:148-153):
    #  * single process, many local devices -> the window batch shards over a
    #    'data' mesh (the scorers commit whole videos to local devices, which
    #    cannot reshard onto a non-fully-addressable mesh — hence no global
    #    mesh across processes);
    #  * multi-process launch -> videos partition process_index::P, each
    #    process scores on its own devices, and per-frame scores gather
    #    across processes for one global per-scene AUC
    #    (evaluate_videos_distributed).
    maybe_initialize_distributed()
    multiproc = jax.process_count() > 1
    mesh = (
        make_mesh() if len(jax.devices()) > 1 and not multiproc else None
    )

    cfg = preset(args.preset)
    predict = args.predict or args.backbone == "convae_predict"
    attn_kernel = args.attn_kernel
    if attn_kernel == "auto":
        attn_kernel = "fold" if args.fused else "base"
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, predict=args.predict, backbone=args.backbone,
            fused_attention=args.fused, fused_cluster=args.fused,
            attn_kernel=attn_kernel,
        )
    )
    if args.image_size:
        cfg = cfg.replace(
            data=dataclasses.replace(
                cfg.data, image_size=(args.image_size, args.image_size)
            ),
            model=dataclasses.replace(
                cfg.model,
                cluster=dataclasses.replace(
                    cfg.model.cluster, space_size=args.image_size // 8
                ),
            ),
        )
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = VADModel(config=cfg.model, dtype=dtype)
    # convae_predict consumes frame_num-1 input frames (true-future target)
    model_frames = (
        args.frame_num - 1 if args.backbone == "convae_predict" else args.frame_num
    )
    sample = jnp.zeros(
        (1, model_frames, *cfg.data.image_size, 3), jnp.float32
    )
    variables = jax.jit(model.init)(jax.random.key(0), sample)

    if args.torch_ckpt:
        from vadcl_tpu.train.torch_import import load_reference_checkpoint

        params, stats, unmatched = load_reference_checkpoint(args.torch_ckpt)
        flat = {f"params/{k}": v for k, v in params.items()}
        flat.update({f"batch_stats/{k}": v for k, v in stats.items()})
        variables, hits, misses = tolerant_merge(variables, flat)
        print(f"translated torch ckpt: {len(hits)} loaded, {len(misses)} kept, "
              f"{len(unmatched)} unmatched torch keys")
    elif args.ckpt:
        with np.load(args.ckpt) as z:
            flat = {k: z[k] for k in z.files if k != "__meta__"}
        # checkpoints store a full TrainState: params/... plus the non-param
        # collections under extras/ (batch_stats, memory)
        sel = {}
        for k, v in flat.items():
            if k.startswith("params/"):
                sel[k] = v
            elif k.startswith("extras/"):
                sel[k.split("/", 1)[1]] = v
        flat = sel
        variables, hits, misses = tolerant_merge(variables, flat)
        print(f"checkpoint: {len(hits)} loaded, {len(misses)} kept at init")

    def apply_fn(clips):
        return model.apply(variables, clips).recon

    scorer = make_video_scorer(
        apply_fn,
        frame_num=args.frame_num,
        predict=predict,
        batch_windows=args.batch_windows,
        first_frame_quirk=args.protocol == "stride1_first_frame",
        mesh=mesh,
        input_frames=eval_input_frames(args.backbone, predict, args.frame_num),
    )
    ds = ClipDataset(
        args.test_data_path,
        frame_num=args.frame_num,
        size=cfg.data.image_size,
        label_root=args.label_path,
        istest=True,
    )
    proto = "stride1" if args.protocol == "stride1_first_frame" else args.protocol
    if multiproc:
        from vadcl_tpu.eval.predict import evaluate_videos_distributed

        all_scenes = sorted(
            {os.path.basename(v).split("_")[0] for v in ds.videos}
        )
        auc, per_scene, per_video = evaluate_videos_distributed(
            scorer,
            num_videos=len(ds.videos),
            get_video=ds.get_test_video,
            all_scenes=all_scenes,
            frame_num=args.frame_num,
            predict=predict,
            protocol=proto,
        )
    else:
        auc, per_scene, per_video = evaluate_videos(
            scorer,
            ds.iter_test_videos(),
            frame_num=args.frame_num,
            predict=predict,
            protocol=proto,
        )
    if jax.process_index() == 0:
        for scene, a in sorted(per_scene.items()):
            print(f"scene {scene}: AUC = {a:.4f}")
        print(f"mean scene AUC = {auc:.4f}")
    out = args.out
    if multiproc:
        base, ext = os.path.splitext(args.out)
        out = f"{base}.proc{jax.process_index()}{ext}"  # local videos only
    np.savez(
        out,
        **{
            f"video{i}_{v.scene}": np.stack([v.scores, v.labels.astype(np.float64)])
            for i, v in enumerate(per_video)
        },
    )
    print("per-video score curves ->", out)


if __name__ == "__main__":
    main()
