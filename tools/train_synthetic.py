"""End-to-end slice: synthetic data -> train -> eval AUC on one chip.

Usage:  python tools/train_synthetic.py [--steps N] [--size 64] [--predict]

Generates the ShanghaiTech-shaped synthetic fixture, trains the tiny flagship
config for a few hundred steps, then runs the sliding-window evaluator and
prints the per-scene AUCs.  This is the runnable minimum end-to-end slice of
SURVEY.md §7.2 and the verification drive for the training stack.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vadcl_tpu.core.config import (
    ClusterConfig,
    Config,
    DataConfig,
    ModelConfig,
    OptimConfig,
)
from vadcl_tpu.data import ClipDataset, HostDataLoader, make_synthetic_dataset
from vadcl_tpu.eval.predict import (
    eval_input_frames,
    evaluate_videos,
    make_video_scorer,
)
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.train.loop import train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--predict", action="store_true")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--root", type=str, default="")
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix="vadcl_synth_")
    train_dir, test_dir, label_dir = make_synthetic_dataset(
        root, num_train_videos=4, num_test_videos=4, frames_per_video=32,
        size=args.size,
    )
    print("fixture at", root)

    size = args.size
    cfg = Config(
        model=ModelConfig(
            embed_dim=32,
            encoder_depths=(1, 1),
            encoder_heads=(2, 4),
            decoder_depths=(1, 1),
            decoder_heads=(4, 2),
            predict=args.predict,
            fused_attention=args.fused,
            cluster=ClusterConfig(
                feature_clusters=16, space_clusters=8, space_size=size // 8
            ),
        ),
        data=DataConfig(frame_num=4, image_size=(size, size)),
        optim=OptimConfig(lr=3e-4, min_lr=1e-5, epochs=8),
        batch_size_per_device=8,
        output_dir=os.path.join(root, "run"),
    )

    ds = ClipDataset(train_dir, frame_num=4, size=(size, size))
    loader = HostDataLoader(ds, batch_size=cfg.batch_size_per_device, seed=cfg.seed)
    state = train(cfg, loader, max_steps=args.steps)
    print("trained", int(state.step), "steps")

    model = VADModel(config=cfg.model)
    variables = {"params": state.params, **state.extras}

    def apply_fn(clips):
        return model.apply(variables, clips).recon

    scorer = make_video_scorer(
        apply_fn, frame_num=4, predict=cfg.model.predict, batch_windows=8,
        input_frames=eval_input_frames("swin", cfg.model.predict, 4),
    )
    test_ds = ClipDataset(
        test_dir, frame_num=4, size=(size, size), label_root=label_dir,
        istest=True,
    )
    auc, per_scene, _ = evaluate_videos(
        scorer,
        test_ds.iter_test_videos(),
        frame_num=4,
        predict=cfg.model.predict,
        protocol="stride1",
    )
    print("per-scene AUC:", {k: round(v, 4) for k, v in per_scene.items()})
    print("mean scene AUC:", round(auc, 4))
    return auc


if __name__ == "__main__":
    main()
