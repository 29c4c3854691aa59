"""Serve: score videos with a deployed StableHLO artifact — no model code.

The deployment counterpart of ``tools/export.py``: loads the self-contained
``jax.export`` artifact (weights baked in as program constants), walks a
directory of frame-folder videos (ShanghaiTech layout, ``SS_VVVV`` names),
computes per-frame anomaly scores exactly like ``tools/evaluate.py``
(PSNR -> per-video min-max anomaly score, ``tool/contrast_evaluae.py:258-299``
semantics) and writes ``scores.npz``.  With ``--label-path`` it also prints
per-scene AUC.  The serving process needs only jax + numpy + this repo's
eval/scoring math — no flax model, no checkpoint translation (the reference
has no deployment story: its eval tools rebuild the torch model from source
and reload the .pth every run).

Usage:
  python tools/serve.py --artifact scorer.vadcl --data-path testing/frames \
      [--label-path test_label] [--protocol stride1] [--out scores.npz]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--data-path", required=True,
                    help="directory of frame-folder videos (test layout)")
    ap.add_argument("--label-path", default="",
                    help="optional <video>.npy label dir: prints per-scene AUC")
    ap.add_argument("--protocol", default="stride1",
                    choices=["stride1", "nonoverlap"])
    ap.add_argument("--out", default="scores.npz")
    args = ap.parse_args()

    from vadcl_tpu.data.dataset import ClipDataset
    from vadcl_tpu.eval.predict import evaluate_videos
    from vadcl_tpu.serve.export import artifact_window_runner, load_artifact

    art = load_artifact(args.artifact)
    print(
        f"artifact: frame_num={art.frame_num} image={art.image_size} "
        f"predict={art.predict} batch_windows={art.batch_windows} "
        f"platforms={list(art.platforms)} input={art.input_dtype}"
    )

    runner = artifact_window_runner(art)
    if art.input_dtype != "uint8":
        # frame folders decode to uint8; float artifacts take [0, 1] pixels
        base = runner

        def runner(windows, _base=base):  # noqa: F811
            return _base(windows.astype(np.float32) / 255.0)

    ds = ClipDataset(
        args.data_path,
        frame_num=art.frame_num,
        size=tuple(art.image_size),
        label_root=args.label_path or None,
        istest=True,
    )
    auc, per_scene, per_video = evaluate_videos(
        runner,
        ds.iter_test_videos(),
        frame_num=art.frame_num,
        predict=art.predict,
        protocol=args.protocol,
    )
    if args.label_path:
        for scene, a in sorted(per_scene.items()):
            print(f"scene {scene}: AUC = {a:.4f}")
        print(f"mean scene AUC = {auc:.4f}")
    np.savez(
        args.out,
        **{
            f"video{i}_{v.scene}": np.stack(
                [v.scores, v.labels.astype(np.float64)]
            )
            for i, v in enumerate(per_video)
        },
    )
    print("per-video score curves ->", args.out)


if __name__ == "__main__":
    main()
