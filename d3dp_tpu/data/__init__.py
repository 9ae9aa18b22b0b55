from d3dp_tpu.data.skeleton import Skeleton
from d3dp_tpu.data.mocap import MocapDataset
from d3dp_tpu.data.generators import (
    ChunkedGenerator,
    UnchunkedGenerator,
    UnchunkedGeneratorSeq2Seq,
)
from d3dp_tpu.data.windowing import window_sequence, stitch_windows

__all__ = [
    "Skeleton",
    "MocapDataset",
    "ChunkedGenerator",
    "UnchunkedGenerator",
    "UnchunkedGeneratorSeq2Seq",
    "window_sequence",
    "stitch_windows",
]
