"""Whole-model numerical parity against the ACTUAL reference PyTorch code.

Unlike the module-level torch oracles elsewhere in tests/, these tests import
the real ``/root/reference`` tree (via tests/reference_harness.py stubs),
instantiate the genuine ``Mymodel`` (``model/backbone.py:28``) on CPU,
translate its ``state_dict()`` through
``vadcl_tpu.train.torch_import.translate_torch_state``, and assert:

  (a) forward ``recon`` max-abs-diff < 1e-4 fp32, in both predict and recon
      decoder modes (``model/swin_decoder_predict.py:591-595``);
  (b) identical hard cluster labels (``model/cluster.py:88``);
  (c) cluster/space loss scalars match to rtol 1e-4
      (``model/backbone.py:94-98``);
  (d) end-to-end: the same synthetic test videos produce matching PSNR
      curves, anomaly scores, and per-scene AUC between the torch reference
      eval protocol (``tool/contrast_evaluae.py:170-299``) and
      ``vadcl_tpu.eval.predict.evaluate_videos``.

The reference is run in eval() mode with ``cluster_loss_on()`` +
``encoder_compatness()`` — the configuration every reference eval tool uses
(``tool/contrast_evaluae.py:163-165``); the non-compactness cluster branch is
unreachable in the reference (unbound ``feature``, ``model/backbone.py:92-129``).
"""

from __future__ import annotations

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vadcl_tpu.core.config import ModelConfig
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.train.checkpoint import flatten_state, tolerant_merge
from vadcl_tpu.train.torch_import import translate_torch_state

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from reference_harness import RefArgs, import_reference  # noqa: E402

pytestmark = pytest.mark.slow

FRAME_NUM = 4
RES = 224


@pytest.fixture(scope="module")
def reference():
    return import_reference()


def _build_pair(reference, predict: bool):
    """(torch Mymodel in eval+cluster+compactness, our model, merged vars)."""
    ref_backbone, _ = reference
    import torch

    torch.manual_seed(0)
    ref = ref_backbone.Mymodel(
        RefArgs(), iscluster=False, ispredict=predict
    ).eval()
    ref.cluster_loss_on()
    ref.encoder_compatness()

    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, stats, unmatched = translate_torch_state(state, predict=predict)
    assert unmatched == [], unmatched[:10]

    cfg = ModelConfig(predict=predict, use_cluster=True, compactness=True)
    ours = VADModel(config=cfg)
    clip0 = jnp.zeros((1, FRAME_NUM, RES, RES, 3), jnp.float32)
    template = jax.jit(ours.init)(jax.random.key(0), clip0)

    flat = {f"params/{k}": v for k, v in params.items()}
    flat.update({f"batch_stats/{k}": v for k, v in stats.items()})
    merged, hits, misses = tolerant_merge(template, flat)
    assert misses == [], misses[:10]
    # every translated tensor must land (no silent drops either way)
    assert len(hits) == len(flatten_state(template))
    return ref, ours, merged


def _torch_forward(ref, clip_np: np.ndarray):
    """clip_np is ours-layout (B, D, H, W, 3); returns reference outputs in
    ours-layout numpy."""
    import torch

    x = torch.from_numpy(np.transpose(clip_np, (0, 4, 1, 2, 3)).copy())
    with torch.no_grad():
        recon, c_loss, s_loss, _, _, feature, label = ref(x)
    return (
        np.transpose(recon.numpy(), (0, 2, 3, 4, 1)),
        float(c_loss),
        float(s_loss),
        feature.numpy(),
        label.numpy(),
    )


@pytest.mark.parametrize("predict", [True, False], ids=["predict", "recon"])
def test_whole_model_forward_parity(reference, predict):
    ref, ours, variables = _build_pair(reference, predict)

    rng = np.random.RandomState(42)
    clip = rng.rand(1, FRAME_NUM, RES, RES, 3).astype(np.float32)

    ref_recon, ref_closs, ref_sloss, ref_feat, ref_lbl = _torch_forward(
        ref, clip
    )
    out = jax.jit(lambda v, c: ours.apply(v, c, deterministic=True))(
        variables, jnp.asarray(clip)
    )

    recon = np.asarray(out.recon, np.float32)
    assert recon.shape == ref_recon.shape
    recon_diff = float(np.max(np.abs(recon - ref_recon)))
    assert recon_diff < 1e-4, f"recon max-abs-diff {recon_diff}"

    np.testing.assert_array_equal(
        np.asarray(out.feature_label), ref_lbl.astype(np.int64)
    )
    feat_diff = float(np.max(np.abs(np.asarray(out.feature) - ref_feat)))
    assert feat_diff < 1e-4, f"feature max-abs-diff {feat_diff}"

    np.testing.assert_allclose(
        float(out.cluster_loss), ref_closs, rtol=1e-4
    )
    np.testing.assert_allclose(float(out.space_loss), ref_sloss, rtol=1e-4)


def _reference_eval(ref, videos):
    """The reference eval protocol, verbatim semantics from
    ``tool/contrast_evaluae.py:170-299`` (non-overlap windows; predict mode
    feeds the whole 4-frame window, scores recon vs the window's LAST frame,
    and labels the result with frame ``start + frame_num`` — the overlap
    quirk; per-video anomaly min-max; per-scene AUC; mean over scenes)."""
    import torch
    from sklearn.metrics import roc_auc_score

    _, ref_utils = import_reference()
    recon_loss = torch.nn.MSELoss(reduction="none")

    scene_scores, scene_labels = {}, {}
    per_video_psnr = []
    for frames, labels, scene in videos:
        T = frames.shape[0]
        psnr_list, label_list = [], []
        index = 0
        while index + FRAME_NUM < T:
            clip_np = frames[index : index + FRAME_NUM]
            x = torch.from_numpy(
                np.transpose(clip_np[None], (0, 4, 1, 2, 3)).copy()
            )
            true_video = x[:, :, -1:]
            with torch.no_grad():
                recon, *_ = ref(x)
            loss = recon_loss(recon, true_video)
            # B C D H W -> per-frame mean over C, H, W (contrast_evaluae:235)
            loss_frame = loss.mean(dim=4).mean(dim=3).mean(dim=1)
            psnr_list.extend(ref_utils.psnr(loss_frame.flatten().tolist()))
            label_list.append(int(labels[index + FRAME_NUM]))
            index += FRAME_NUM
        scores = np.asarray(ref_utils.anomly_score(psnr_list))
        per_video_psnr.append(np.asarray(psnr_list))
        lbl = np.asarray(label_list)
        if scene in scene_scores:
            scene_scores[scene] = np.append(scene_scores[scene], scores)
            scene_labels[scene] = np.append(scene_labels[scene], lbl)
        else:
            scene_scores[scene], scene_labels[scene] = scores, lbl
    aucs = {
        k: roc_auc_score(scene_labels[k], scene_scores[k])
        for k in scene_scores
    }
    return float(np.mean(list(aucs.values()))), aucs, per_video_psnr


def test_eval_protocol_end_to_end_parity(reference):
    """Same synthetic test videos => equal PSNR curves and per-scene AUC
    through the torch-reference pipeline and vadcl_tpu's evaluator."""
    from vadcl_tpu.eval.predict import evaluate_videos, make_window_scorer
    from vadcl_tpu.eval.scoring import psnr as our_psnr

    ref, ours, variables = _build_pair(reference, predict=True)

    rng = np.random.RandomState(7)
    videos = []
    for i, scene in enumerate(["01", "01", "02"]):
        T = 14 + 4 * i  # ragged lengths
        frames = rng.rand(T, RES, RES, 3).astype(np.float32)
        labels = (rng.rand(T) > 0.5).astype(np.int64)
        videos.append((frames, labels, scene))
    # ensure both classes appear among scored frames of every scene
    for frames, labels, _ in videos:
        starts = range(0, frames.shape[0] - FRAME_NUM, FRAME_NUM)
        scored = [s + FRAME_NUM for s in starts]
        labels[scored[0]] = 0
        labels[scored[-1]] = 1

    ref_auc, ref_aucs, ref_psnr = _reference_eval(ref, videos)

    def apply_fn(clips):
        return ours.apply(variables, clips, deterministic=True).recon

    scorer = make_window_scorer(
        apply_fn, frame_num=FRAME_NUM, predict=True, batch_windows=2
    )
    our_auc, our_aucs, per_video = evaluate_videos(
        scorer, videos, frame_num=FRAME_NUM, predict=True,
        protocol="nonoverlap",
    )

    for vid, ref_curve in zip(per_video, ref_psnr):
        assert len(vid.scores) == len(ref_curve)

    assert set(our_aucs) == set(ref_aucs)
    for scene in ref_aucs:
        np.testing.assert_allclose(
            our_aucs[scene], ref_aucs[scene], atol=1e-9,
            err_msg=f"scene {scene} AUC mismatch",
        )
    np.testing.assert_allclose(our_auc, ref_auc, atol=1e-9)

    # PSNR curves themselves (not just their ranks) must match
    all_ref = np.concatenate(ref_psnr)
    from vadcl_tpu.eval.predict import score_video

    curves = []
    for frames, labels, _ in videos:
        mse, _ = score_video(
            scorer, frames, labels, FRAME_NUM, True, "nonoverlap"
        )
        curves.append(our_psnr(mse))
    all_ours = np.concatenate(curves)
    np.testing.assert_allclose(all_ours, all_ref, rtol=1e-5, atol=1e-4)


def test_load_reference_checkpoint_real_pth(reference, tmp_path):
    """`load_reference_checkpoint` on GENUINE torch.save artifacts: both
    on-disk formats the reference produces — a raw state_dict
    (``main_predict.py:331`` torch.save(model.state_dict(), ...)) and the
    ``{"state_dict": ...}`` wrapper handled by ``misc/utils.py:104`` — must
    round-trip through torch serialization and translate identically to the
    in-memory path."""
    import torch

    from vadcl_tpu.train.torch_import import load_reference_checkpoint

    ref_backbone, _ = reference
    torch.manual_seed(0)
    ref = ref_backbone.Mymodel(RefArgs(), iscluster=False, ispredict=True)
    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    want_params, want_stats, want_unmatched = translate_torch_state(state)

    raw_path = str(tmp_path / "raw.pth")
    torch.save(ref.state_dict(), raw_path)
    wrapped_path = str(tmp_path / "wrapped.pth")
    torch.save({"state_dict": ref.state_dict(), "epoch": 3}, wrapped_path)

    for path in (raw_path, wrapped_path):
        params, stats, unmatched = load_reference_checkpoint(path)
        assert unmatched == want_unmatched == []
        assert set(params) == set(want_params)
        assert set(stats) == set(want_stats)
        for k in params:
            np.testing.assert_array_equal(params[k], want_params[k], err_msg=k)
        for k in stats:
            np.testing.assert_array_equal(stats[k], want_stats[k], err_msg=k)
