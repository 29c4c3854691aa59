"""Long-horizon staged cluster-center training experiment.

Reproduces the recorded experiment in PARITY.md ("Staged center training"):
the reference's actual training regime — recon-only warmup, then cluster
losses + center training + compactness decode all engage at a staged
iteration threshold (``main_predict.py:244-257``), cluster-loss weight from
the author's working range 1e4-2e4 (``实验小笔记.txt:2``) — run end to end
on the latent-anomaly fixture with centers trained FROM THE torch.rand INIT
(no codebook warm start).  Evals fire at leg boundaries with BOTH decode
paths + codebook occupancy, so the run shows whether trained centers
converge toward (or past) the recon-only baseline as the horizon grows.

Run on a TPU-backed session (thousands of toy-scale steps are minutes
there; the pytest tier pins CPU where 1200 staged steps cost ~35 min, which
is why this ships as a script, not a test):

    EXP_W=10000 EXP_K=256 EXP_ALPHA=16 EXP_LEGS='[300, 1500, 3000, 6000]' \
        python tools/center_training_experiment.py

Recorded result (round 5): warmup recon-only baseline AUC 0.9545; the
compactness decode through trained centers reaches 1.0 by 1200 staged steps
and holds to 5700, with occupancy spreading (used 9%->24%, top1 0.44->0.13).
"""
import dataclasses
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vadcl_tpu.core.config import (
    ClusterConfig, Config, DataConfig, ModelConfig, OptimConfig, ScheduleConfig,
)
from vadcl_tpu.data import ClipDataset, HostDataLoader
from vadcl_tpu.data.synthetic import make_latent_anomaly_dataset
from vadcl_tpu.eval.predict import evaluate_videos, make_window_scorer
from vadcl_tpu.models.backbone import VADModel
from vadcl_tpu.train.loop import train

SIZE = 32
WARMUP = int(os.environ.get("EXP_WARMUP", "300"))
LEGS = json.loads(os.environ.get("EXP_LEGS", "[300, 1500, 3000, 6000]"))
W = float(os.environ.get("EXP_W", "10000.0"))
K = int(os.environ.get("EXP_K", "256"))
ALPHA = float(os.environ.get("EXP_ALPHA", "16.0"))
SEED = int(os.environ.get("EXP_SEED", "0"))
root = tempfile.mkdtemp(prefix="center_long_")
train_dir, test_dir, label_dir = make_latent_anomaly_dataset(
    root, num_train_videos=4, num_test_videos=2, frames_per_video=32,
    size=SIZE,
)
test_ds = ClipDataset(
    test_dir, frame_num=4, size=(SIZE, SIZE), label_root=label_dir,
    istest=True,
)

mc = ModelConfig(
    embed_dim=32,
    encoder_depths=(1, 1), encoder_heads=(2, 4),
    decoder_depths=(1, 1), decoder_heads=(4, 2),
    use_cluster=True, compactness=True,
    cluster=ClusterConfig(
        feature_clusters=K, feature_alpha=ALPHA,
        space_clusters=8, space_size=SIZE // 8,
    ),
)
mc_plain = dataclasses.replace(mc, compactness=False)
schedule = ScheduleConfig(
    cluster_start_iter=WARMUP,
    cluster_train_start_iter=WARMUP,
    compactness_start_iter=WARMUP,
    cluster_weight=W, space_weight=0.0,
)
ds = ClipDataset(train_dir, frame_num=4, size=(SIZE, SIZE))
steps_per_epoch = -(-len(ds) // 8)
epochs = LEGS[-1] // steps_per_epoch + 2
cfg = Config(
    model=mc,
    data=DataConfig(frame_num=4, image_size=(SIZE, SIZE)),
    optim=OptimConfig(lr=3e-4, min_lr=1e-5, epochs=epochs),
    schedule=schedule,
    batch_size_per_device=8,
    output_dir=os.path.join(root, "run"),
    save_every_epochs=0,
    save_every_iters=WARMUP,
    bf16=False,  # fp32 on TPU: match the CPU test numerics
    seed=SEED,
)
loader = HostDataLoader(ds, batch_size=8, seed=SEED, num_workers=2)


def run_eval(model, variables):
    def apply_fn(c):
        return model.apply(variables, c).recon

    scorer = make_window_scorer(apply_fn, 4, predict=False, batch_windows=8)
    auc, _, _ = evaluate_videos(
        scorer, test_ds.iter_test_videos(), frame_num=4, predict=False,
        protocol="nonoverlap",
    )
    return auc


def occupancy(model, variables):
    harvest = np.linspace(0, len(ds) - 1, 16).astype(int)
    clips = (
        jnp.asarray(np.stack([ds.get_clip(int(i)) for i in harvest]),
                    jnp.float32) / 255.0
    )
    out = model.apply(variables, clips[:8])
    assign = np.asarray(out.cluster_assign).reshape(-1, K)
    hist = np.bincount(assign.argmax(-1), minlength=K)
    return float(np.mean(hist > 0)), float(hist.max()) / float(hist.sum())


for leg in LEGS:
    state = train(cfg, loader, max_steps=leg)
    variables = {"params": state.params, **state.extras}
    rec = {
        "step": leg, "w": W, "K": K, "alpha": ALPHA, "seed": SEED,
        "auc_plain_decode": round(run_eval(VADModel(config=mc_plain),
                                           variables), 4),
    }
    if leg > WARMUP:
        rec["auc_compact_decode"] = round(
            run_eval(VADModel(config=mc), variables), 4
        )
        used, top1 = occupancy(VADModel(config=mc), variables)
        rec["occ_used"], rec["occ_top1"] = round(used, 4), round(top1, 4)
    print(json.dumps(rec), flush=True)
shutil.rmtree(root, ignore_errors=True)
