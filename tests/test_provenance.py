"""Run-provenance stamping (utils/provenance.py).

The reference stamps every run with git SHA + full args at launch
(``utils/distritributed_model.py:82-100`` ``get_sha()``,
``主要框架.py:166-168`` dumping ``vars(args)``); ``write_run_stamp`` must
leave an equivalent ``run_meta.json`` in the output_dir.
"""

import json
import os

from vadcl_tpu.core.config import Config, preset
from vadcl_tpu.utils.provenance import git_info, resolved_config, write_run_stamp


def test_write_run_stamp(tmp_path):
    cfg = preset("ped2")
    path = write_run_stamp(str(tmp_path), cfg, extra={"note": "unit-test"})
    assert path == str(tmp_path / "run_meta.json")
    with open(path) as f:
        meta = json.load(f)
    # fully-resolved config tree: every default explicit, nested dataclasses
    assert meta["config"]["data"]["name"] == "ped2"
    assert meta["config"]["model"]["embed_dim"] == cfg.model.embed_dim
    assert meta["config"]["model"]["cluster"]["feature_clusters"] == (
        cfg.model.cluster.feature_clusters
    )
    # git provenance (this repo IS a checkout, so real values must appear)
    assert len(meta["git"]["sha"]) == 40
    assert isinstance(meta["git"]["dirty"], bool)
    # argv + topology + versions + start time
    assert isinstance(meta["argv"], list) and meta["argv"]
    assert meta["topology"]["device_count"] >= 1
    assert meta["topology"]["process_count"] == 1
    assert "jax" in meta["versions"]
    assert meta["start_time"]
    assert meta["note"] == "unit-test"


def test_git_info_outside_checkout(tmp_path):
    info = git_info(str(tmp_path))
    assert info["sha"] == "N/A"  # degrade, never raise (get_sha semantics)


def test_resolved_config_json_safe():
    tree = resolved_config(Config())
    json.dumps(tree)  # must be serializable without default=repr


def test_train_writes_stamp(tmp_path):
    """train() stamps the output_dir at start (VERDICT r3 item 8)."""
    import numpy as np

    from vadcl_tpu.core.config import (
        ClusterConfig,
        DataConfig,
        ModelConfig,
        OptimConfig,
    )
    from vadcl_tpu.data.loader import HostDataLoader
    from vadcl_tpu.train.loop import train

    class _Stub:
        def __len__(self):
            return 4

        def get_clip(self, i):
            return np.random.RandomState(i).rand(4, 56, 56, 3).astype(
                np.float32
            )

    cfg = Config(
        model=ModelConfig(
            embed_dim=32,
            encoder_depths=(1, 1),
            encoder_heads=(2, 4),
            decoder_depths=(1, 1),
            decoder_heads=(4, 2),
            cluster=ClusterConfig(
                feature_clusters=16, space_clusters=8, space_size=7
            ),
        ),
        data=DataConfig(frame_num=4, image_size=(56, 56)),
        optim=OptimConfig(lr=1e-4, epochs=1),
        batch_size_per_device=2,
        output_dir=str(tmp_path / "run"),
    )
    loader = HostDataLoader(_Stub(), batch_size=2, seed=0, num_workers=0)
    train(cfg, loader, max_steps=1)
    with open(tmp_path / "run" / "run_meta.json") as f:
        meta = json.load(f)
    assert meta["config"]["batch_size_per_device"] == 2
    assert meta["config"]["output_dir"] == cfg.output_dir
