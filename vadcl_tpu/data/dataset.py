"""Frame-folder clip dataset with the reference's exact sample semantics.

Parity target ``dataset/utils_dataset.py:55-148``:

* layout: ``<root>/<video_id>/<NNN>.jpg`` frame folders, sorted; test labels
  ``<label_root>/<video_id>.npy``; scene id = ``video_id.split('_')[0]``
  (ShanghaiTech ``SS_VVVV`` naming, ``:122``);
* train samples: every frame index with ``frame_num`` lookahead —
  ``i <= len - frame_num`` (``:104-114``), clip = ``frame_num`` consecutive
  frames;
* test samples: one item per video = ALL frames + labels + scene id
  (``:116-135``);
* transform: resize to 224x224 (bilinear) then /255 — mean/std normalization
  is deliberately commented out in the reference (``:184-188``), so inputs are
  raw [0, 1]; reproduced faithfully.

Returns NDHWC float32 arrays (TPU layout), not the reference's (C, T, H, W).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def _decode_resize(path: str, size: Tuple[int, int]) -> np.ndarray:
    """JPEG -> RGB float32 [0,1], resized bilinear (torchvision tf.resize on a
    PIL image is bilinear+antialias; PIL's BILINEAR resize matches).

    NOTE: the reference decodes with cv2 (BGR) and never converts to RGB
    before wrapping in PIL (``dataset/utils_dataset.py:23-33``) — channel
    order is consistently 'BGR treated as RGB' end-to-end, which cancels out
    for training and MSE scoring.  We use true RGB; scores are invariant.
    """
    with Image.open(path) as im:
        im = im.convert("RGB")
        if im.size != (size[1], size[0]):
            im = im.resize((size[1], size[0]), Image.BILINEAR)
        return np.asarray(im, np.float32) / 255.0


def load_clip(
    frame_paths: Sequence[str],
    size: Tuple[int, int] = (224, 224),
    use_native: bool = True,
    as_uint8: bool = False,
) -> np.ndarray:
    """(T, H, W, C) float32 in [0, 1], or uint8 pixels with ``as_uint8``.

    Uses the C++ threaded decoder (vadcl_tpu.data.native) when built and the
    frames are JPEG; falls back to PIL otherwise.

    ``as_uint8`` reproduces the REFERENCE pipeline's quantization point: the
    reference resizes as a PIL image (uint8) and only then /255s
    (``dataset/utils_dataset.py:168-188``), so every pixel is k/255.  The
    PIL path here is bit-exact by construction; the native resampler works
    in float space, so its output is rounded to the same uint8 grid
    (<= 0.5/255 from its unquantized value, i.e. tighter PIL parity)."""
    if use_native and all(
        p.lower().endswith((".jpg", ".jpeg")) for p in frame_paths
    ):
        from vadcl_tpu.data import native

        if native.available():
            try:
                if as_uint8 and native.has_u8():
                    return native.decode_resize_batch_u8(frame_paths, size)
                out = native.decode_resize_batch(frame_paths, size)
                if as_uint8:
                    return np.rint(out * 255.0).astype(np.uint8)
                return out
            except (IOError, RuntimeError):
                pass
    out = np.stack([_decode_resize(p, size) for p in frame_paths])
    if as_uint8:
        return np.rint(out * 255.0).astype(np.uint8)
    return out


def load_video(
    video_dir: str, size: Tuple[int, int] = (224, 224)
) -> np.ndarray:
    paths = sorted(glob.glob(os.path.join(video_dir, "*")))
    return load_clip(paths, size)


class TestVideo(NamedTuple):
    video_dir: str
    labels_path: Optional[str]
    scene: str
    num_frames: int


@dataclass
class ClipDataset:
    """Enumerates (video, start) train samples or whole test videos."""

    root: str
    frame_num: int = 4
    size: Tuple[int, int] = (224, 224)
    label_root: Optional[str] = None
    istest: bool = False

    def __post_init__(self):
        self.videos = sorted(
            d for d in glob.glob(os.path.join(self.root, "*"))
            if os.path.isdir(d)
        )
        self.frames = {
            v: sorted(glob.glob(os.path.join(v, "*.jpg")))
            or sorted(glob.glob(os.path.join(v, "*")))
            for v in self.videos
        }
        if self.istest:
            self.samples: List = list(range(len(self.videos)))
        else:
            samples = []
            for vi, v in enumerate(self.videos):
                n = len(self.frames[v])
                # i <= n - frame_num (dataset/utils_dataset.py:110-113)
                samples.extend(
                    (vi, i) for i in range(max(n - self.frame_num + 1, 0))
                )
            self.samples = samples

    def __len__(self) -> int:
        return len(self.samples)

    def get_clip(self, index: int) -> np.ndarray:
        """Train sample: (frame_num, H, W, C) uint8.

        uint8 on the wire, /255 on device (the jitted train step
        normalizes): 4x less host->device traffic per batch, and the uint8
        quantization point matches the reference pipeline exactly (resize
        as uint8 image, then /255 — see ``load_clip``)."""
        vi, start = self.samples[index]
        paths = self.frames[self.videos[vi]][start : start + self.frame_num]
        if len(paths) < self.frame_num:
            # lookahead walked off the end (reference would 404 on the
            # synthesized filename); clamp by repeating the last frame
            paths = paths + [paths[-1]] * (self.frame_num - len(paths))
        return load_clip(paths, self.size, as_uint8=True)

    def get_test_video(self, index: int) -> Tuple[np.ndarray, np.ndarray, str]:
        """Test sample: (frames (T,H,W,C) uint8, labels (T,), scene).

        Frames come back uint8 (quantization point identical to the
        reference pipeline — see ``load_clip``) so the eval path ships 4x
        less data to the device; the /255 normalization runs on-device
        (``make_video_scorer``) or at window assembly (``score_video``),
        either way computing the identical k/255.0 fp32 values the train
        path uses."""
        v = self.videos[index]
        name = os.path.basename(v)
        scene = name.split("_")[0]
        frames = load_clip(self.frames[v], self.size, as_uint8=True)
        if self.label_root:
            labels = np.load(os.path.join(self.label_root, name + ".npy"))
            labels = np.asarray(labels).ravel()
        else:
            labels = np.zeros((frames.shape[0],), np.int64)
        return frames, labels, scene

    def iter_test_videos(self):
        for i in range(len(self.videos)):
            yield self.get_test_video(i)
