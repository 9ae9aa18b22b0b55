from d3dp_tpu.data.skeleton import Skeleton
from d3dp_tpu.data.mocap import MocapDataset
from d3dp_tpu.data.generators import ChunkedGenerator, UnchunkedGenerator
from d3dp_tpu.data.windowing import window_sequence, stitch_windows

__all__ = [
    "Skeleton",
    "MocapDataset",
    "ChunkedGenerator",
    "UnchunkedGenerator",
    "window_sequence",
    "stitch_windows",
]
