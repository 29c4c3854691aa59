"""Eval-layer tests: PSNR/anomaly formulas, AUC vs sklearn, protocols, and an
end-to-end scoring run with a synthetic scorer."""

import math

import numpy as np
from sklearn.metrics import roc_auc_score

from vadcl_tpu.eval.predict import evaluate_videos, score_video, sliding_windows
from vadcl_tpu.eval.scoring import anomaly_score, psnr, roc_auc


def test_psnr_formula():
    """misc/utils.py:124-128."""
    mse = np.array([0.01, 0.5, 1.0])
    got = psnr(mse)
    want = [10 * math.log10(1.0 / m) for m in mse]
    np.testing.assert_allclose(got, want)


def test_anomaly_score_formula():
    """misc/utils.py:131-135: 1 - minmax, per video."""
    p = np.array([30.0, 20.0, 25.0])
    got = anomaly_score(p)
    np.testing.assert_allclose(got, [0.0, 1.0, 0.5])


def test_roc_auc_matches_sklearn():
    rng = np.random.RandomState(0)
    for trial in range(5):
        labels = rng.randint(0, 2, 200)
        if labels.sum() in (0, 200):
            labels[0] = 1 - labels[0]
        scores = np.round(rng.rand(200), 2)  # rounding forces ties
        np.testing.assert_allclose(
            roc_auc(labels, scores), roc_auc_score(labels, scores), rtol=1e-12
        )


def test_sliding_windows_reference_bounds():
    """Loop bound is start + frame_num < T strictly (main_predict.py:401)."""
    assert sliding_windows(24, 4, "stride1") == list(range(20))
    assert sliding_windows(24, 4, "nonoverlap") == [0, 4, 8, 12, 16]
    assert sliding_windows(4, 4, "stride1") == []
    assert sliding_windows(5, 4, "stride1") == [0]


def _constant_scorer(mse_by_window):
    def scorer(windows):
        return mse_by_window(windows)

    return scorer


def test_score_video_predict_alignment():
    """Predict mode: one score per window, labeled frame start+frame_num."""
    T, F = 12, 4
    frames = np.zeros((T, 8, 8, 3), np.float32)
    labels = np.arange(T)

    def mse_fn(windows):
        return np.arange(windows.shape[0], dtype=np.float64) + 1.0

    mse, lab = score_video(mse_fn, frames, labels, F, predict=True, protocol="stride1")
    assert mse.shape == (T - F,)
    np.testing.assert_array_equal(lab, labels[F:])


def test_score_video_recon_alignment():
    T, F = 12, 4
    frames = np.zeros((T, 8, 8, 3), np.float32)
    labels = np.arange(T)

    def mse_fn(windows):
        return np.ones((windows.shape[0], F), np.float64)

    mse, lab = score_video(mse_fn, frames, labels, F, predict=False, protocol="nonoverlap")
    starts = [0, 4]
    assert mse.shape == (len(starts) * F,)
    np.testing.assert_array_equal(
        lab, np.concatenate([labels[s : s + F] for s in starts])
    )


def test_evaluate_videos_perfect_detector():
    """A scorer with high MSE on labeled-anomalous frames must reach AUC 1
    per scene and mean 1."""
    T, F = 20, 4
    rng = np.random.RandomState(0)

    def make_video(scene):
        frames = rng.rand(T, 8, 8, 3).astype(np.float32)
        labels = np.zeros(T, np.int64)
        labels[10:15] = 1
        return frames, labels, scene

    videos = [make_video("01"), make_video("02")]
    label_lookup = {}
    for frames, labels, scene in videos:
        label_lookup[frames.tobytes()[:64]] = labels

    def mse_fn_factory(labels):
        def mse_fn(windows):
            # one score per window: anomalous target frames get huge MSE
            n = windows.shape[0]
            return np.array(
                [10.0 if labels[s + F] else 0.01 for s, _ in zip(range(n), range(n))]
            )

        return mse_fn

    # simpler: iterate manually to keep labels in scope
    from vadcl_tpu.eval.scoring import per_scene_auc, mean_scene_auc
    from vadcl_tpu.eval.predict import VideoScores
    from vadcl_tpu.eval.scoring import psnr as _psnr, anomaly_score as _an

    scene_scores, scene_labels = {}, {}
    for frames, labels, scene in videos:
        mse_fn = mse_fn_factory(labels)
        mse, lab = score_video(mse_fn, frames, labels, F, True, "stride1")
        s = _an(_psnr(mse))
        scene_scores.setdefault(scene, np.zeros(0))
        scene_labels.setdefault(scene, np.zeros(0, np.int64))
        scene_scores[scene] = np.append(scene_scores[scene], s)
        scene_labels[scene] = np.append(scene_labels[scene], lab)
    aucs = per_scene_auc(scene_scores, scene_labels)
    assert mean_scene_auc(aucs) == 1.0


def test_spmd_scorer_matches_single_device():
    """Mesh-sharded window scorer == single-device scorer."""
    import jax
    import jax.numpy as jnp

    from vadcl_tpu.core.mesh import make_mesh
    from vadcl_tpu.eval.predict import make_window_scorer

    def apply_fn(clips):
        # toy "model": reconstruct a blurred last frame
        return jnp.mean(clips, axis=1, keepdims=True)

    rng = np.random.RandomState(0)
    windows = rng.rand(19, 4, 16, 16, 3).astype(np.float32)
    s1 = make_window_scorer(apply_fn, 4, predict=True, batch_windows=8)
    s2 = make_window_scorer(
        apply_fn, 4, predict=True, batch_windows=8, mesh=make_mesh(8)
    )
    np.testing.assert_allclose(s1(windows), s2(windows), rtol=1e-6)


def test_video_scorer_matches_window_scorer():
    """Device-resident video scorer == host-window scorer, every mode:
    predict/recon, f32/uint8 frames, input_frames slicing, mesh sharding."""
    import jax.numpy as jnp

    from vadcl_tpu.core.mesh import make_mesh
    from vadcl_tpu.eval.predict import make_video_scorer, make_window_scorer

    def apply_fn(clips):
        return jnp.mean(clips, axis=1, keepdims=True)

    rng = np.random.RandomState(0)
    T, fn_ = 23, 4
    frames_u8 = rng.randint(0, 256, (T, 16, 16, 3)).astype(np.uint8)
    frames = frames_u8.astype(np.float32) / 255.0
    starts = sliding_windows(T, fn_, "stride1")
    windows = np.stack([frames[s : s + fn_] for s in starts])

    for predict in (True, False):
        for input_frames in (None, 3):
            def sliced_apply(clips, _n=input_frames):
                return apply_fn(clips)

            ws = make_window_scorer(
                sliced_apply, fn_, predict=predict, batch_windows=8,
                input_frames=input_frames,
            )
            vs = make_video_scorer(
                sliced_apply, fn_, predict=predict, batch_windows=8,
                input_frames=input_frames,
            )
            want = ws(windows)
            np.testing.assert_allclose(vs(frames, starts), want, rtol=1e-6)
            # uint8 frames: /255 on device reproduces the same fp32 pixels
            np.testing.assert_allclose(vs(frames_u8, starts), want, rtol=1e-6)

    # mesh-sharded video scorer
    vs_mesh = make_video_scorer(
        apply_fn, fn_, predict=True, batch_windows=8, mesh=make_mesh(8)
    )
    ws_ref = make_window_scorer(apply_fn, fn_, predict=True, batch_windows=8)
    np.testing.assert_allclose(
        vs_mesh(frames_u8, starts), ws_ref(windows), rtol=1e-6
    )

    # empty start list
    assert make_video_scorer(
        apply_fn, fn_, predict=True, batch_windows=8
    )(frames, []).shape == (0,)


def test_score_video_accepts_uint8_and_video_scorer():
    """score_video feeds (frames, starts) to takes_video scorers and
    normalizes uint8 for window scorers; results agree."""
    import jax.numpy as jnp

    from vadcl_tpu.eval.predict import make_video_scorer, make_window_scorer

    def apply_fn(clips):
        return jnp.mean(clips, axis=1, keepdims=True)

    rng = np.random.RandomState(1)
    frames_u8 = rng.randint(0, 256, (17, 8, 8, 3)).astype(np.uint8)
    labels = (rng.rand(17) > 0.5).astype(np.int64)
    ws = make_window_scorer(apply_fn, 4, predict=True, batch_windows=4)
    vs = make_video_scorer(apply_fn, 4, predict=True, batch_windows=4)
    mse_w, lab_w = score_video(ws, frames_u8, labels, 4, True, "stride1")
    mse_v, lab_v = score_video(vs, frames_u8, labels, 4, True, "stride1")
    np.testing.assert_allclose(mse_w, mse_v, rtol=1e-6)
    np.testing.assert_array_equal(lab_w, lab_v)


def test_eval_input_frames_policy():
    """Single source of truth for eval-time input slicing (per-backbone)."""
    from vadcl_tpu.eval.predict import eval_input_frames
    from vadcl_tpu.train.step import PREDICT_INPUT_FRAMES

    assert eval_input_frames("swin", True, 4) == PREDICT_INPUT_FRAMES
    assert eval_input_frames("swin", True, 7) == PREDICT_INPUT_FRAMES
    assert eval_input_frames("swin", False, 4) is None
    assert eval_input_frames("convae_predict", True, 5) == 4
    assert eval_input_frames("unet3d", False, 4) is None


def test_normalize_clip_exact():
    """uint8 -> k/255.0 fp32 on device equals the host-side /255 bit-for-bit;
    float input passes through untouched."""
    import jax.numpy as jnp

    from vadcl_tpu.train.step import normalize_clip

    k = np.arange(256, dtype=np.uint8).reshape(1, 1, 16, 16, 1)
    got = np.asarray(normalize_clip(jnp.asarray(k)))
    want = k.astype(np.float32) / 255.0
    np.testing.assert_array_equal(got, want)
    f = jnp.asarray(want)
    assert normalize_clip(f) is f


def test_staged_video_scoring_matches_unstaged():
    """scorer.stage(frames) pre-uploads; scoring a StagedVideo must equal
    scoring raw frames (plain and mesh-sharded scorers)."""
    import jax.numpy as jnp

    from vadcl_tpu.core.mesh import make_mesh
    from vadcl_tpu.eval.predict import StagedVideo, make_video_scorer

    def apply_fn(clips):
        return jnp.mean(clips, axis=1, keepdims=True)

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (23, 8, 8, 3)).astype(np.uint8)
    starts = sliding_windows(23, 4, "stride1")
    for mesh in (None, make_mesh(8)):
        vs = make_video_scorer(
            apply_fn, 4, predict=True, batch_windows=8, mesh=mesh
        )
        staged = vs.stage(frames)
        assert isinstance(staged, StagedVideo)
        assert staged.num_frames == 23
        assert staged.video.shape[0] % 64 == 0  # T-bucketed
        np.testing.assert_allclose(
            vs(staged, starts), vs(frames, starts), rtol=1e-6
        )
        # score_video accepts the staged form too
        labels = (rng.rand(23) > 0.5).astype(np.int64)
        mse_s, lab_s = score_video(vs, staged, labels, 4, True, "stride1")
        mse_r, lab_r = score_video(vs, frames, labels, 4, True, "stride1")
        np.testing.assert_allclose(mse_s, mse_r, rtol=1e-6)
        np.testing.assert_array_equal(lab_s, lab_r)


def test_pipeline_videos_order_and_staging():
    """pipeline_videos yields every video in order; frames become
    StagedVideo for video-resident scorers and pass through otherwise."""
    import jax.numpy as jnp

    from vadcl_tpu.eval.predict import (
        StagedVideo,
        make_video_scorer,
        make_window_scorer,
        pipeline_videos,
    )

    def apply_fn(clips):
        return jnp.mean(clips, axis=1, keepdims=True)

    rng = np.random.RandomState(8)
    vids = [
        (rng.randint(0, 256, (11 + i, 8, 8, 3)).astype(np.uint8),
         np.zeros(11 + i, np.int64), f"{i:02d}")
        for i in range(4)
    ]
    vs = make_video_scorer(apply_fn, 4, predict=True, batch_windows=4)
    out = list(pipeline_videos(vs, iter(vids)))
    assert [scene for _, _, scene in out] == ["00", "01", "02", "03"]
    for (fr, lab, scene), (fr0, lab0, _) in zip(out, vids):
        assert isinstance(fr, StagedVideo)
        assert fr.num_frames == fr0.shape[0]
        np.testing.assert_array_equal(
            np.asarray(fr.video)[: fr.num_frames], fr0
        )
        assert lab is lab0

    ws = make_window_scorer(apply_fn, 4, predict=True, batch_windows=4)
    out_w = list(pipeline_videos(ws, iter(vids)))
    assert all(fr is fr0 for (fr, _, _), (fr0, _, _) in zip(out_w, vids))

    # producer errors surface to the consumer
    def boom():
        yield vids[0]
        raise RuntimeError("decode failed")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="decode failed"):
        list(pipeline_videos(vs, boom()))


def test_evaluate_videos_pipelined_equals_reference_auc():
    """evaluate_videos through the pipelined path reproduces the same AUC a
    hand-rolled serial loop computes (real jitted scorer, 8-dev CPU)."""
    import jax.numpy as jnp

    from vadcl_tpu.eval.predict import make_video_scorer
    from vadcl_tpu.eval.scoring import mean_scene_auc, per_scene_auc

    def apply_fn(clips):
        return jnp.mean(clips, axis=1, keepdims=True)

    rng = np.random.RandomState(9)
    vids = []
    for i in range(3):
        T = 19 + 3 * i
        frames = rng.randint(0, 256, (T, 8, 8, 3)).astype(np.uint8)
        labels = (rng.rand(T) > 0.7).astype(np.int64)
        vids.append((frames, labels, "01" if i < 2 else "02"))

    vs = make_video_scorer(apply_fn, 4, predict=True, batch_windows=4)
    auc, per_scene, per_video = evaluate_videos(
        vs, iter(vids), 4, True, "stride1"
    )

    scene_scores, scene_labels = {}, {}
    for frames, labels, scene in vids:
        mse, lab = score_video(vs, frames, labels, 4, True, "stride1")
        s = anomaly_score(psnr(mse))
        scene_scores.setdefault(scene, np.zeros(0))
        scene_labels.setdefault(scene, np.zeros(0, np.int64))
        scene_scores[scene] = np.append(scene_scores[scene], s)
        scene_labels[scene] = np.append(scene_labels[scene], lab)
    want = mean_scene_auc(per_scene_auc(scene_scores, scene_labels))
    np.testing.assert_allclose(auc, want, rtol=1e-12)
    assert len(per_video) == 3
