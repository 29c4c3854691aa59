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
