"""Viz-layer tests: paradigm-comparison plot + temp.csv export, loss plotter."""

import os
from types import SimpleNamespace

import numpy as np

from tools.visualize import cmd_losses, cmd_paradigm


def _scores_npz(path):
    rng = np.random.RandomState(0)
    np.savez(
        path,
        **{
            f"video{i}_0{i + 1}": np.stack(
                [rng.rand(30), rng.randint(0, 2, 30).astype(np.float64)]
            )
            for i in range(2)
        },
    )


def test_paradigm_plot_and_csv_export(tmp_path):
    scores = str(tmp_path / "scores.npz")
    _scores_npz(scores)
    # a paradigm curve in the reference temp.csv format (index col + one col)
    csv_in = str(tmp_path / "temp.csv")
    with open(csv_in, "w") as f:
        f.write(",0\n" + "".join(f"{i},{0.1 * i}\n" for i in range(24)))

    out_png = str(tmp_path / "paradigm.png")
    out_csv = str(tmp_path / "exported.csv")
    cmd_paradigm(
        SimpleNamespace(
            scores=scores, csv=csv_in, frames=24, out=out_png, export_csv=out_csv
        )
    )
    assert os.path.getsize(out_png) > 0

    # the export round-trips through the same reader path
    import pandas as pd

    exported = pd.read_csv(out_csv, index_col=0).values.ravel()
    with np.load(scores) as z:
        first = z[sorted(z.files)[0]][0][:24]
    np.testing.assert_allclose(exported, first)


def test_losses_plot(tmp_path):
    recs = []
    for name in ("mix", "no_attn"):
        p = str(tmp_path / f"{name}.npy")
        np.save(p, np.linspace(5, 1, 60))
        recs.append(p)
    out = str(tmp_path / "losses.png")
    cmd_losses(SimpleNamespace(records=recs, out=out))
    assert os.path.getsize(out) > 0


def test_save_clip_frames_roundtrip(tmp_path):
    """JPEG dump layout (<dir>/<b>/imgN.jpg, misc/utils.py:21-48) and
    approximate pixel round-trip (JPEG is lossy)."""
    from vadcl_tpu.viz.dumps import save_clip_frames

    # smooth gradients: JPEG round-trips these closely (random noise is its
    # adversarial worst case and tests nothing about our layout/scaling)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, 32), np.linspace(0, 1, 32), indexing="ij"
    )
    clip = np.stack(
        [
            np.stack(
                [
                    np.stack([0.2 + 0.6 * xx, 0.3 + 0.5 * yy, 0.5 * (xx + yy) / 2 + 0.1 * b + 0.05 * t], -1)
                    for t in range(3)
                ]
            )
            for b in range(2)
        ]
    ).astype(np.float32)
    out = str(tmp_path / "video_show")
    save_clip_frames(clip, out)
    from PIL import Image

    for b in range(2):
        for t in range(3):
            p = os.path.join(out, str(b), f"img{t}.jpg")
            assert os.path.exists(p), p
            back = np.asarray(Image.open(p), np.float32) / 255.0
            assert np.max(np.abs(back - clip[b, t])) < 0.1  # JPEG loss bound

    # uint8 input takes the same path
    save_clip_frames((clip * 255).astype(np.uint8), str(tmp_path / "u8"))
    assert os.path.exists(str(tmp_path / "u8" / "0" / "img0.jpg"))


def test_error_heatmap_against_matplotlib_jet():
    """The hand-rolled jet map must track matplotlib's jet (the colormap the
    reference renders with, misc/utils.py:190-194) and the heat math must be
    |minmax-gray(origin) - minmax-gray(recon)|^2 * 10."""
    import matplotlib.cm as cm

    from vadcl_tpu.viz.dumps import _jet, error_heatmap

    # colormap parity: analytic jet vs matplotlib jet, all ramp positions
    x = np.linspace(0, 1, 101)
    ours = _jet(x).astype(np.float32) / 255.0
    mpl = cm.jet(x)[:, :3].astype(np.float32)
    assert float(np.max(np.abs(ours - mpl))) < 0.16  # documented approximation

    rng = np.random.RandomState(1)
    origin = rng.rand(24, 24, 3).astype(np.float32)
    recon = origin.copy()
    recon[4, 5] += 0.5  # a single hot error site
    heat = error_heatmap(recon, origin)
    assert heat.shape == (24, 24, 3) and heat.dtype == np.uint8

    # zero-error pixels map to jet(0) (dark blue); the error site is hottest
    def gray(img):
        return np.asarray(img, np.float32) @ np.array([0.2125, 0.7154, 0.0721])

    def mm(g):
        return (g - g.min()) / (g.max() - g.min() + 1e-12)

    d = np.abs(mm(gray(origin)) - mm(gray(recon))) ** 2 * 10.0
    expect = _jet(d)
    np.testing.assert_array_equal(heat, expect)
    assert tuple(heat[4, 5]) == tuple(_jet(np.clip(d, 0, 1))[4, 5])
    far = heat[0, 0]
    assert far[2] > far[0]  # cold pixels are blue-dominant


def test_export_cluster_embedding_bucket_semantics(tmp_path):
    """Top-occupancy cluster selection (聚类可视化.py:132-158): only the
    top-N most-populated labels survive, subsampled to max_points."""
    from vadcl_tpu.viz.dumps import export_cluster_embedding

    rng = np.random.RandomState(2)
    # cluster c has 10*(c+1) members, c in 0..7 -> top-3 = {7, 6, 5}
    labels = np.concatenate([np.full(10 * (c + 1), c) for c in range(8)])
    features = rng.rand(labels.size, 16).astype(np.float32)

    out = str(tmp_path / "emb.npz")
    emb, l = export_cluster_embedding(
        features, labels, out, top_clusters=3, max_points=50, run_tsne=False
    )
    assert set(np.unique(l)) == {5, 6, 7}
    assert emb.shape[0] == l.shape[0] == 50  # capped
    with np.load(out) as z:
        np.testing.assert_array_equal(z["labels"], l)
        np.testing.assert_allclose(z["embedding"], emb)

    # without the cap: every member of the top clusters survives
    emb2, l2 = export_cluster_embedding(
        features, labels, out, top_clusters=2, max_points=10**6, run_tsne=False
    )
    assert l2.size == 80 + 70


def test_train_loop_periodic_dump(tmp_path):
    """Config.dump_every_iters wires the reference's every-N-iters input+recon
    JPEG dump (main_predict.py:265-267) into the train loop."""
    from vadcl_tpu.core.config import (
        ClusterConfig, Config, DataConfig, ModelConfig, OptimConfig,
    )
    from vadcl_tpu.data import ClipDataset, HostDataLoader, make_synthetic_dataset
    from vadcl_tpu.train.loop import train
    from PIL import Image

    root = str(tmp_path / "data")
    train_dir, _, _ = make_synthetic_dataset(
        root, num_train_videos=1, num_test_videos=1, frames_per_video=9, size=56
    )
    cfg = Config(
        model=ModelConfig(
            embed_dim=32,
            encoder_depths=(1, 1),
            encoder_heads=(2, 4),
            decoder_depths=(1, 1),
            decoder_heads=(4, 2),
            predict=True,
            cluster=ClusterConfig(feature_clusters=8, space_clusters=4, space_size=7),
        ),
        data=DataConfig(frame_num=4, image_size=(56, 56)),
        optim=OptimConfig(lr=1e-4, epochs=1),
        batch_size_per_device=2,
        output_dir=str(tmp_path / "run"),
        dump_every_iters=1,
    )
    ds = ClipDataset(train_dir, frame_num=4, size=(56, 56))
    loader = HostDataLoader(ds, batch_size=2, seed=0, num_workers=2)
    train(cfg, loader, max_steps=2)

    show = str(tmp_path / "run" / "video_show")
    origin = str(tmp_path / "run" / "video_show_origin")
    # predict mode: target/recon are single frames per batch element
    for d in (show, origin):
        p = os.path.join(d, "0", "img0.jpg")
        assert os.path.exists(p), p
        img = np.asarray(Image.open(p))
        assert img.shape == (56, 56, 3)
    assert not os.path.exists(os.path.join(show, "0", "img1.jpg"))


def test_heatmaps_and_tsne_cli(tmp_path):
    """Drive the heatmaps/tsne visualize subcommands end-to-end on a tiny
    synthetic frame-folder video (Error_thermal_visualization.py and
    聚类可视化.py capability paths)."""
    from PIL import Image

    from tools.visualize import cmd_heatmaps, cmd_tsne

    vdir = tmp_path / "01_0001"
    os.makedirs(vdir)
    yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64), indexing="ij")
    for t in range(9):
        img = np.stack([0.2 + 0.6 * xx, 0.3 + 0.5 * yy, np.full_like(xx, 0.1 + 0.05 * t)], -1)
        Image.fromarray((img * 255).astype(np.uint8)).save(vdir / f"{t:03d}.jpg")

    heat_out = str(tmp_path / "heat")
    cmd_heatmaps(
        SimpleNamespace(
            preset="tiny", ckpt="", video=str(vdir), out=heat_out,
            predict=False, frame_num=4,
        )
    )
    heats = sorted(os.listdir(heat_out))
    assert heats == [f"heat_{i:04d}.png" for i in range(8)]
    hm = np.asarray(Image.open(os.path.join(heat_out, heats[0])))
    assert hm.shape == (56, 56, 3)

    emb_out = str(tmp_path / "emb.npz")
    cmd_tsne(
        SimpleNamespace(
            preset="tiny", ckpt="", video=str(vdir), out=emb_out,
            predict=False, frame_num=4,
        )
    )
    with np.load(emb_out) as z:
        assert z["embedding"].shape[1] == 2  # t-SNE ran
        assert z["labels"].shape[0] == z["embedding"].shape[0]
