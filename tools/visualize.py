"""Visual-inspection CLI — capability parity with the reference's viz scripts.

  heatmaps  — per-frame reconstruction-error jet heat maps over a test video
              (Error_thermal_visualization.py:60-143)
  tsne      — cluster-feature t-SNE export for the latent space
              (聚类可视化.py:62-160)
  losses    — overlay loss curves from .npy records (loss_contrast.py:1-25)

Examples:
  python tools/visualize.py heatmaps --ckpt run/ckpt/ckpt_100.npz \\
      --video /data/test/frames/01_0025 --out heatmaps/
  python tools/visualize.py tsne --ckpt ... --video ... --out tsne.npz
  python tools/visualize.py losses --records a.npy b.npy --out losses.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_model(args):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vadcl_tpu.core.config import preset
    from vadcl_tpu.models.backbone import VADModel
    from vadcl_tpu.train.checkpoint import tolerant_merge

    cfg = preset(args.preset)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, predict=args.predict)
    )
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = VADModel(config=cfg.model, dtype=dtype)
    sample = jnp.zeros((1, args.frame_num, *cfg.data.image_size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), sample)
    if args.ckpt:
        with np.load(args.ckpt) as z:
            flat = {}
            for k in z.files:
                if k.startswith("params/"):
                    flat[k] = z[k]
                elif k.startswith("extras/"):
                    flat[k.split("/", 1)[1]] = z[k]
        variables, hits, _ = tolerant_merge(variables, flat)
        print(f"loaded {len(hits)} leaves from {args.ckpt}")
    return cfg, model, variables


def cmd_heatmaps(args):
    import jax

    from vadcl_tpu.data.dataset import load_video
    from vadcl_tpu.viz.dumps import error_heatmap, save_clip_frames
    from PIL import Image

    cfg, model, variables = _load_model(args)
    frames = load_video(args.video, cfg.data.image_size)
    fwd = jax.jit(lambda c: model.apply(variables, c).recon)
    os.makedirs(args.out, exist_ok=True)
    F = args.frame_num
    for start in range(0, frames.shape[0] - F, F):
        clip = frames[None, start : start + F]
        recon = np.asarray(fwd(clip).astype("float32"))[0]
        for t in range(recon.shape[0]):
            origin = clip[0, -1] if args.predict else clip[0, t]
            hm = error_heatmap(recon[t], origin)
            Image.fromarray(hm).save(
                os.path.join(args.out, f"heat_{start + t:04d}.png")
            )
    print("heat maps ->", args.out)


def cmd_tsne(args):
    import jax

    from vadcl_tpu.data.dataset import load_video
    from vadcl_tpu.viz.dumps import export_cluster_embedding

    cfg, model, variables = _load_model(args)
    frames = load_video(args.video, cfg.data.image_size)
    fwd = jax.jit(lambda c: model.apply(variables, c))
    feats, labels = [], []
    F = args.frame_num
    for start in range(0, frames.shape[0] - F, F):
        out = fwd(frames[None, start : start + F])
        feats.append(np.asarray(out.feature, np.float32))
        labels.append(np.asarray(out.feature_label))
    emb, lab = export_cluster_embedding(
        np.concatenate(feats), np.concatenate(labels), args.out
    )
    print(f"t-SNE of {emb.shape[0]} tokens ->", args.out)


def cmd_losses(args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 5))
    for rec in args.records:
        arr = np.load(rec)
        plt.plot(arr, label=os.path.splitext(os.path.basename(rec))[0])
    plt.xlabel("iteration")
    plt.ylabel("loss")
    plt.legend()
    plt.savefig(args.out, dpi=150, bbox_inches="tight")
    print("loss comparison ->", args.out)


def cmd_paradigm(args):
    """Paradigm-comparison plot (tool/contrast_evaluae.py:281-291): overlay
    the model's per-video anomaly-score curve (first ``--frames`` frames of
    each video in a ``scores.npz`` from tools/evaluate.py) against a
    reference paradigm curve in the tool/temp.csv format (pandas csv, index
    column + one value column).  ``--export-csv`` additionally dumps our own
    first-curve in that same format (tool/predict_evaluae.py:281-282)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with np.load(args.scores) as z:
        curves = {k: z[k][0] for k in sorted(z.files)}
    if not curves:
        raise SystemExit(f"no score curves in {args.scores}")

    other = None
    if args.csv:
        import pandas as pd

        other = pd.read_csv(args.csv, index_col=0).values.ravel()

    plt.figure(figsize=(8, 5))
    plt.title("Comparison of two anomaly detection paradigms")
    for name, scores in curves.items():
        plt.plot(scores[: args.frames], label=name)
    if other is not None:
        plt.plot(other[: args.frames], "k--", label="paradigm (csv)")
    plt.ylabel("Abnormal score")
    plt.xlabel("frames")
    plt.legend(fontsize=7)
    plt.savefig(args.out, dpi=150, bbox_inches="tight")
    print("paradigm comparison ->", args.out)

    if args.export_csv:
        import pandas as pd

        first = next(iter(curves.values()))[: args.frames]
        pd.DataFrame({"0": first}).to_csv(args.export_csv)
        print("score curve (temp.csv format) ->", args.export_csv)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("heatmaps", "tsne"):
        p = sub.add_parser(name)
        p.add_argument("--preset", default="shanghaitech")
        p.add_argument("--ckpt", default="")
        p.add_argument("--video", required=True)
        p.add_argument("--out", required=True)
        p.add_argument("--predict", action="store_true")
        p.add_argument("--frame-num", type=int, default=4)
    l = sub.add_parser("losses")
    l.add_argument("--records", nargs="+", required=True)
    l.add_argument("--out", default="losses.png")
    c = sub.add_parser("paradigm")
    c.add_argument("--scores", required=True, help="scores.npz from tools/evaluate.py")
    c.add_argument("--csv", default="", help="paradigm curve, temp.csv format")
    c.add_argument("--frames", type=int, default=24)
    c.add_argument("--out", default="paradigm.png")
    c.add_argument("--export-csv", default="")
    args = ap.parse_args()
    {
        "heatmaps": cmd_heatmaps,
        "tsne": cmd_tsne,
        "losses": cmd_losses,
        "paradigm": cmd_paradigm,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
