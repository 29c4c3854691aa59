from vadcl_tpu.data.dataset import ClipDataset, TestVideo, load_clip, load_video
from vadcl_tpu.data.loader import HostDataLoader
from vadcl_tpu.data.synthetic import make_synthetic_dataset

__all__ = [
    "ClipDataset",
    "TestVideo",
    "load_clip",
    "load_video",
    "HostDataLoader",
    "make_synthetic_dataset",
]
