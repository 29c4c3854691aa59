"""Export / reload the window scorer as a portable StableHLO artifact.

``jax.export`` traces the jitted scorer once, lowers it to StableHLO for the
requested platform(s), and serializes the program — model weights ride inside
as constants, so the artifact is fully self-contained.  A serving process
deserializes and calls it without importing any model code (the reference has
no equivalent: its eval tools rebuild the torch model from source each run,
``tool/contrast_evaluae.py:148-176``).

Artifact layout (a directory):
  scorer.stablehlo   serialized jax.export.Exported (versioned, stable format)
  meta.json          input spec, protocol fields, platforms, package version

The exported function is ``window_score_fn`` (vadcl_tpu/eval/predict.py):
(batch, frame_num, H, W, C) uint8 (or float32) windows -> anomaly MSE per
window (predict mode) or per frame (recon mode).  uint8-in is the wire format
of the eval pipeline — /255 normalization happens inside the program.
"""

from __future__ import annotations

import json
import os
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from vadcl_tpu.eval.predict import window_score_fn

_BLOB = "scorer.stablehlo"
_META = "meta.json"


class ServingArtifact(NamedTuple):
    """A reloaded scorer: ``score`` runs the deserialized program under jit.

    ``batch_windows`` is None for dynamic-batch artifacts (symbolic batch
    dim): ``score`` then accepts any leading batch size."""

    score: Callable[[jax.Array], jax.Array]
    batch_windows: Optional[int]
    frame_num: int
    image_size: Tuple[int, int]
    channels: int
    input_dtype: str
    predict: bool
    platforms: Tuple[str, ...]
    meta: dict


def export_window_scorer(
    apply_fn: Callable[[jax.Array], jax.Array],
    *,
    batch_windows: Optional[int],
    frame_num: int,
    image_size: Tuple[int, int],
    channels: int = 3,
    predict: bool = True,
    first_frame_quirk: bool = False,
    input_frames: Optional[int] = None,
    input_dtype: str = "uint8",
    platforms: Optional[Sequence[str]] = None,
) -> Tuple[bytes, dict]:
    """Serialize the scorer; returns (blob, meta).

    ``apply_fn(clips) -> recon`` must already be bound to its weights (they
    are captured as program constants).  ``platforms`` defaults to the
    session's backend platform; pass e.g. ("tpu", "cpu") for a multi-platform
    artifact (only pure-XLA paths lower on both — export with
    ``fused_attention=False`` for a CPU-loadable artifact).

    ``batch_windows=None`` exports a DYNAMIC batch dimension
    (``jax.export.symbolic_shape``): the artifact then scores any batch size
    without re-export.  Requires the pure-XLA model path (the Pallas kernels
    need static grids — export with ``fused_attention=False``).
    """
    score = window_score_fn(
        apply_fn,
        predict=predict,
        first_frame_quirk=first_frame_quirk,
        input_frames=input_frames,
    )
    h, w = image_size
    batch_dim = (
        jax_export.symbolic_shape("b")[0]
        if batch_windows is None
        else batch_windows
    )
    spec = jax.ShapeDtypeStruct(
        (batch_dim, frame_num, h, w, channels), jnp.dtype(input_dtype)
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jax.jit(score), **kwargs)(spec)
    blob = exported.serialize()
    meta = {
        "format": "jax.export.Exported",
        "calling_convention_version": exported.calling_convention_version,
        "platforms": list(exported.platforms),
        "batch_windows": batch_windows,
        "frame_num": frame_num,
        "image_size": [h, w],
        "channels": channels,
        "input_dtype": input_dtype,
        "predict": predict,
        "first_frame_quirk": first_frame_quirk,
        "input_frames": input_frames,
        "out_shape": [
            [d if isinstance(d, int) else str(d) for d in a.shape]
            for a in exported.out_avals
        ],
    }
    return bytes(blob), meta


def save_artifact(path: str, blob: bytes, meta: dict) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _BLOB), "wb") as f:
        f.write(blob)
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)


def load_artifact(path: str) -> ServingArtifact:
    """Deserialize an artifact directory into a callable scorer.

    The returned ``score`` accepts exactly the exported batch shape; feed it
    through ``batched`` padding (or re-export at the serving batch).  Runs on
    any platform the artifact was exported for.
    """
    with open(os.path.join(path, _BLOB), "rb") as f:
        blob = f.read()
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    exported = jax_export.deserialize(bytearray(blob))
    call = jax.jit(exported.call)
    bw = meta["batch_windows"]
    return ServingArtifact(
        score=call,
        batch_windows=None if bw is None else int(bw),
        frame_num=int(meta["frame_num"]),
        image_size=tuple(meta["image_size"]),
        channels=int(meta["channels"]),
        input_dtype=meta["input_dtype"],
        predict=bool(meta["predict"]),
        platforms=tuple(meta["platforms"]),
        meta=meta,
    )


def artifact_window_runner(
    art: ServingArtifact,
) -> Callable[[np.ndarray], np.ndarray]:
    """Wrap a loaded artifact as a padded any-length window scorer (the same
    contract as ``make_window_scorer``'s runner): (N, frame_num, H, W, C)
    numpy -> (N,) / (N, frame_num) scores, padding the tail batch.  For
    dynamic-batch artifacts the input goes through in one call, unpadded."""
    bw = art.batch_windows

    def run(windows: np.ndarray) -> np.ndarray:
        if bw is None:  # dynamic batch: one shot, no padding
            return np.asarray(art.score(windows))
        n = windows.shape[0]
        pad = (-n) % bw
        if pad:
            windows = np.concatenate(
                [windows, np.repeat(windows[-1:], pad, axis=0)], axis=0
            )
        outs = []
        for i in range(0, windows.shape[0], bw):
            outs.append(np.asarray(art.score(windows[i : i + bw])))
        return np.concatenate(outs, axis=0)[:n]

    return run
