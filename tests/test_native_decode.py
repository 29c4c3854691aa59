"""Native C++ decoder parity with the PIL path and throughput sanity."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from vadcl_tpu.data import native
from vadcl_tpu.data.dataset import _decode_resize


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(480, 856), (240, 360), (224, 224)]):
        # smooth image: JPEG lossy error stays small, so the PIL-vs-native
        # comparison measures the resampler, not codec noise
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                127 + 120 * np.sin(xx / 37.0 + i),
                127 + 120 * np.cos(yy / 53.0),
                127 + 120 * np.sin((xx + yy) / 71.0),
            ],
            -1,
        ).astype(np.uint8)
        p = str(d / f"{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_builds():
    if not native.available():
        pytest.skip("native toolchain/libjpeg unavailable")
    assert os.path.exists(native._SO)


def test_native_matches_pil(jpegs):
    if not native.available():
        pytest.skip("native decoder unavailable")
    size = (224, 224)
    got = native.decode_resize_batch(jpegs, size)
    want = np.stack([_decode_resize(p, size) for p in jpegs])
    assert got.shape == want.shape == (3, 224, 224, 3)
    # identical resampling algorithm; difference bounded by fp rounding
    assert np.abs(got - want).max() < 6e-3
    assert np.abs(got - want).mean() < 2e-3


def test_native_error_on_missing(jpegs):
    if not native.available():
        pytest.skip("native decoder unavailable")
    with pytest.raises(IOError):
        native.decode_resize_batch([jpegs[0], "/nonexistent/x.jpg"], (64, 64))


def test_load_clip_native_fallback(jpegs):
    from vadcl_tpu.data.dataset import load_clip

    a = load_clip(jpegs, (112, 112), use_native=True)
    b = load_clip(jpegs, (112, 112), use_native=False)
    assert a.shape == b.shape
    assert np.abs(a - b).max() < 6e-3


def test_native_u8_matches_float_rounding(jpegs):
    if not native.available():
        pytest.skip("native decoder unavailable")
    if not native.has_u8():
        pytest.skip("u8 entry point not built")
    size = (224, 224)
    u8 = native.decode_resize_batch_u8(jpegs, size)
    assert u8.dtype == np.uint8 and u8.shape == (3, 224, 224, 3)
    # same resampler, quantized at the vertical-pass end; the float path
    # re-rounded on the host may differ by 1 on exact .5 ties (rint is
    # round-half-even, the C++ clip8 is round-half-up)
    f = native.decode_resize_batch(jpegs, size)
    np.testing.assert_allclose(
        u8.astype(np.int32), np.rint(f * 255.0).astype(np.int32), atol=1
    )


def test_load_clip_as_uint8_paths(jpegs):
    from vadcl_tpu.data.dataset import load_clip

    a = load_clip(jpegs, (112, 112), use_native=True, as_uint8=True)
    b = load_clip(jpegs, (112, 112), use_native=False, as_uint8=True)
    assert a.dtype == b.dtype == np.uint8
    # native and PIL resamplers agree within the established envelope
    # (6e-3 in [0,1] units ~ 1.5 uint8 steps) plus the quantization step
    assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 3
