"""Data-layer tests: fixture format, sample enumeration semantics, host
sharding, loader batching/determinism."""

import numpy as np
import pytest

from vadcl_tpu.data import ClipDataset, HostDataLoader, make_synthetic_dataset


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(
        str(root), num_train_videos=2, num_test_videos=2,
        frames_per_video=16, size=32,
    )


def test_train_sample_enumeration(fixture_dirs):
    train_dir, _, _ = fixture_dirs
    ds = ClipDataset(train_dir, frame_num=4, size=(32, 32))
    # reference: i <= len - frame_num  -> len - frame_num + 1 starts per video
    assert len(ds) == 2 * (16 - 4 + 1)
    clip = ds.get_clip(0)
    assert clip.shape == (4, 32, 32, 3)
    # uint8 on the wire; the jitted train step divides by 255 on device
    # (exact pre-/255 pixels, no mean/std anywhere)
    assert clip.dtype == np.uint8


def test_test_video_labels_and_scene(fixture_dirs):
    _, test_dir, label_dir = fixture_dirs
    ds = ClipDataset(test_dir, frame_num=4, size=(32, 32),
                     label_root=label_dir, istest=True)
    frames, labels, scene = ds.get_test_video(0)
    assert frames.shape == (16, 32, 32, 3)
    # uint8 frames: exact pre-/255 pixels (k/255.0 fp32 round-trips to k)
    assert frames.dtype == np.uint8
    assert labels.shape == (16,)
    assert labels.sum() > 0  # fixture injects an anomaly span
    assert scene == "01"  # SS_VVVV -> SS


def test_resize_applied(fixture_dirs):
    train_dir, _, _ = fixture_dirs
    ds = ClipDataset(train_dir, frame_num=4, size=(24, 24))
    assert ds.get_clip(0).shape == (4, 24, 24, 3)


def test_loader_batches_and_determinism(fixture_dirs):
    train_dir, _, _ = fixture_dirs
    ds = ClipDataset(train_dir, frame_num=4, size=(32, 32))
    dl = HostDataLoader(ds, batch_size=4, seed=1, num_workers=2)
    batches = list(dl.epoch(0))
    assert all(b.shape == (4, 4, 32, 32, 3) for b in batches)
    assert len(batches) == dl.steps_per_epoch() == len(ds) // 4
    again = list(dl.epoch(0))
    for a, b in zip(batches, again):
        np.testing.assert_array_equal(a, b)  # epoch-seeded determinism
    other = list(dl.epoch(1))
    assert any(
        not np.array_equal(a, b) for a, b in zip(batches, other)
    )  # reshuffled per epoch


def test_host_sharding_partitions(fixture_dirs):
    train_dir, _, _ = fixture_dirs
    ds = ClipDataset(train_dir, frame_num=4, size=(32, 32))
    loaders = [
        HostDataLoader(ds, batch_size=2, seed=3, host_id=h, num_hosts=4)
        for h in range(4)
    ]
    slices = [ld._epoch_indices(0) for ld in loaders]
    combined = np.sort(np.concatenate(slices))
    n = len(ds)
    pad = (-n) % 4
    # every sample covered; padding duplicates only the permutation head
    assert len(combined) == n + pad
    assert set(combined.tolist()) == set(range(n))
