from vadcl_tpu.eval.scoring import (
    anomaly_score,
    per_scene_auc,
    psnr,
    roc_auc,
)
from vadcl_tpu.eval.predict import (
    VideoScores,
    eval_input_frames,
    evaluate_videos,
    make_video_scorer,
    make_window_scorer,
    sliding_windows,
)

__all__ = [
    "anomaly_score",
    "per_scene_auc",
    "psnr",
    "roc_auc",
    "VideoScores",
    "eval_input_frames",
    "evaluate_videos",
    "make_video_scorer",
    "make_window_scorer",
    "sliding_windows",
]
