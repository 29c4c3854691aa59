"""Export a checkpoint as a self-contained serving artifact (StableHLO).

  python tools/export.py --ckpt log_dir/ckpt/ckpt_100.npz --out artifact/ \\
      [--torch-ckpt reference.pth] [--predict] [--batch-windows 64] \\
      [--platforms tpu,cpu] [--check]

The artifact scores uint8 video windows with no model code (see
vadcl_tpu/serve).  ``--check`` reloads it and verifies it against the live
model on random windows.  The reference has no deployment path at all —
its eval scripts reconstruct the torch model from source every run.
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
from vadcl_tpu.eval.predict import eval_input_frames
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.serve import (
    export_window_scorer,
    load_artifact,
    save_artifact,
)
from vadcl_tpu.train.checkpoint import tolerant_merge


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="shanghaitech")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--torch-ckpt", default="")
    ap.add_argument("--out", required=True)
    ap.add_argument("--predict", action="store_true")
    ap.add_argument("--first-frame-quirk", action="store_true")
    ap.add_argument("--batch-windows", type=int, default=64,
                    help="0 = dynamic batch (symbolic dim; pure-XLA path only)")
    ap.add_argument("--frame-num", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=0)
    ap.add_argument("--backbone", default="swin",
                    choices=["swin", "unet3d", "convae", "convae_predict"])
    ap.add_argument("--fused", action="store_true",
                    help="fused Pallas kernels (TPU-only artifact)")
    ap.add_argument("--platforms", default="",
                    help="comma list, e.g. tpu,cpu (default: this backend)")
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and verify vs the live model")
    args = ap.parse_args()

    import dataclasses

    cfg = preset(args.preset)
    predict = args.predict or args.backbone == "convae_predict"
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, predict=args.predict, backbone=args.backbone,
            fused_attention=args.fused, fused_cluster=args.fused,
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
    model_frames = (
        args.frame_num - 1
        if args.backbone == "convae_predict"
        else args.frame_num
    )
    sample = jnp.zeros((1, model_frames, *cfg.data.image_size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), sample)

    if args.torch_ckpt:
        from vadcl_tpu.train.torch_import import load_reference_checkpoint

        params, stats, unmatched = load_reference_checkpoint(args.torch_ckpt)
        flat = {f"params/{k}": v for k, v in params.items()}
        flat.update({f"batch_stats/{k}": v for k, v in stats.items()})
        variables, hits, misses = tolerant_merge(variables, flat)
        print(f"translated torch ckpt: {len(hits)} loaded, {len(misses)} kept")
    elif args.ckpt:
        with np.load(args.ckpt) as z:
            flat = {k: z[k] for k in z.files if k != "__meta__"}
        sel = {}
        for k, v in flat.items():
            if k.startswith("params/"):
                sel[k] = v
            elif k.startswith("extras/"):
                sel[k.split("/", 1)[1]] = v
        variables, hits, misses = tolerant_merge(variables, sel)
        print(f"checkpoint: {len(hits)} loaded, {len(misses)} kept at init")

    def apply_fn(clips):
        return model.apply(variables, clips).recon

    platforms = (
        tuple(p.strip() for p in args.platforms.split(",") if p.strip())
        or None
    )
    blob, meta = export_window_scorer(
        apply_fn,
        batch_windows=args.batch_windows or None,
        frame_num=args.frame_num,
        image_size=cfg.data.image_size,
        predict=predict,
        first_frame_quirk=args.first_frame_quirk,
        input_frames=eval_input_frames(args.backbone, predict, args.frame_num),
        platforms=platforms,
    )
    meta["preset"] = args.preset
    meta["backbone"] = args.backbone
    save_artifact(args.out, blob, meta)
    print(
        f"exported {len(blob) / 1e6:.1f} MB artifact -> {args.out} "
        f"(platforms {meta['platforms']}, "
        f"input {meta['batch_windows'] or 'dyn'}x{meta['frame_num']}x"
        f"{meta['image_size'][0]}x{meta['image_size'][1]}x{meta['channels']} "
        f"{meta['input_dtype']})"
    )

    if args.check:
        art = load_artifact(args.out)
        rng = np.random.RandomState(0)
        windows = rng.randint(
            0, 256,
            (args.batch_windows or 2, args.frame_num, *cfg.data.image_size, 3),
            dtype=np.uint8,
        )
        got = np.asarray(art.score(windows))
        from vadcl_tpu.eval.predict import window_score_fn

        ref_fn = jax.jit(
            window_score_fn(
                apply_fn,
                predict=predict,
                first_frame_quirk=args.first_frame_quirk,
                input_frames=eval_input_frames(
                    args.backbone, predict, args.frame_num
                ),
            )
        )
        want = np.asarray(ref_fn(jnp.asarray(windows)))
        diff = float(np.max(np.abs(got - want)))
        print(f"reload check: max |artifact - live| = {diff:.3e}")
        assert diff <= 1e-5 + 1e-3 * float(np.max(np.abs(want))), diff


if __name__ == "__main__":
    main()
