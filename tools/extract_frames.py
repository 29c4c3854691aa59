"""Offline dataset preparation.

Capability parity with the reference's prep scripts:

* video -> frame-folder extraction, keeping every Nth frame
  (``dataset/ShanhaiTech.py:16-42``: every 18th frame ~= 1 fps of the
  ShanghaiTech training videos):
      python tools/extract_frames.py videos --src .../training/videos \\
          --dst .../training/frames [--every 18]
* Avenue/Ped2 ``.mat`` frame labels -> per-video ``.npy``
  (``misc/utils.py:212-220``):
      python tools/extract_frames.py mat2npy --dir .../testing_label
* Avenue/Ped2 test dir renaming to the ``SS_VVVV`` scheme
  (``misc/utils.py:223-238``):
      python tools/extract_frames.py rename --dir .../testing/frames
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


def extract_videos(src: str, dst: str, every: int = 18, fmt: str = "%03d.jpg"):
    import cv2

    os.makedirs(dst, exist_ok=True)
    for vid_path in sorted(glob.glob(os.path.join(src, "*"))):
        name = os.path.splitext(os.path.basename(vid_path))[0]
        out_dir = os.path.join(dst, name)
        os.makedirs(out_dir, exist_ok=True)
        cap = cv2.VideoCapture(vid_path)
        idx = kept = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if idx % every == 0:
                cv2.imwrite(os.path.join(out_dir, fmt % kept), frame)
                kept += 1
            idx += 1
        cap.release()
        print(f"{name}: kept {kept}/{idx} frames")


def mat2npy(label_dir: str):
    import numpy as np
    import scipy.io as scio

    for mat_path in sorted(glob.glob(os.path.join(label_dir, "*.mat"))):
        name = os.path.splitext(os.path.basename(mat_path))[0][-2:]
        data = np.array(scio.loadmat(mat_path)["frame_label"])
        np.save(os.path.join(label_dir, name + ".npy"), data)
        print(mat_path, "->", name + ".npy")


def rename_scene(dir_path: str, suffix: str = ""):
    for p in sorted(glob.glob(os.path.join(dir_path, "*" + suffix))):
        base = os.path.basename(p)
        stem = base[: len(base) - len(suffix)] if suffix else base
        try:
            idx = int(stem)
        except ValueError:
            continue
        new = os.path.join(os.path.dirname(p), f"01_{idx:04d}{suffix}")
        os.rename(p, new)
        print(p, "=>", new)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("videos")
    v.add_argument("--src", required=True)
    v.add_argument("--dst", required=True)
    v.add_argument("--every", type=int, default=18)
    m = sub.add_parser("mat2npy")
    m.add_argument("--dir", required=True)
    r = sub.add_parser("rename")
    r.add_argument("--dir", required=True)
    r.add_argument("--suffix", default="")
    args = ap.parse_args()
    if args.cmd == "videos":
        extract_videos(args.src, args.dst, args.every)
    elif args.cmd == "mat2npy":
        mat2npy(args.dir)
    else:
        rename_scene(args.dir, args.suffix)


if __name__ == "__main__":
    main()
