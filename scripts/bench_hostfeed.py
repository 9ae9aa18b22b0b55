"""Host-feed throughput: can the C++ chunk assembler + prefetcher keep an
N-chip pod busy?

One chip on the bf16+Pallas fast path consumes ~19k training frames/s
(PERFORMANCE.md); dp-scaling is only real if the host assembles batches at
N x that rate. This measures the host side alone: ChunkedGenerator epoch
iteration (flip augmentation, edge padding, fixed-shape pad_last batches)
with the C++ assembler and with the pure-numpy fallback, plus the threaded
prefetcher on top.

    python scripts/bench_hostfeed.py [--frames 243] [--batch 4] [--minutes-of-data 60]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CHIP_TRAIN_FRAMES_PER_SEC = 19_000.0  # PERFORMANCE.md, bf16+Pallas


def make_data(n_seqs, seq_len, rng):
    poses_3d = [rng.randn(seq_len, 17, 3).astype(np.float32) for _ in range(n_seqs)]
    poses_2d = [rng.randn(seq_len, 17, 2).astype(np.float32) for _ in range(n_seqs)]
    cams = [rng.randn(9).astype(np.float32) for _ in range(n_seqs)]
    return cams, poses_3d, poses_2d


def run_epoch(gen):
    frames = 0
    t0 = time.perf_counter()
    for batch in gen.next_epoch():
        batch_2d = batch[2]
        frames += batch_2d.shape[0] * batch_2d.shape[1]
    return frames / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=243)
    p.add_argument("--batch", type=int, default=4, help="chunks per batch")
    p.add_argument("--minutes-of-data", type=int, default=60,
                   help="synthetic corpus size (50 fps)")
    opts = p.parse_args()

    from d3dp_tpu.data.generators import ChunkedGenerator
    from d3dp_tpu.data.prefetch import Prefetcher

    rng = np.random.RandomState(0)
    seq_len = 50 * 60  # one minute at 50 fps per sequence
    cams, p3, p2 = make_data(opts.minutes_of_data, seq_len, rng)

    kw = dict(
        chunk_length=opts.frames, shuffle=True, augment=True,
        kps_left=[4, 5, 6, 11, 12, 13], kps_right=[1, 2, 3, 14, 15, 16],
        joints_left=[4, 5, 6, 11, 12, 13], joints_right=[1, 2, 3, 14, 15, 16],
        pad_last=True,
    )

    results = {}
    for name, native in (("cpp_assembler", True), ("numpy_fallback", False)):
        gen = ChunkedGenerator(opts.batch, cams, p3, p2, use_native=native,
                               **kw)
        run_epoch(gen)  # warm the page cache / allocator
        results[name] = round(run_epoch(gen), 1)

    # prefetcher on top of the native path: throughput seen by a consumer
    # that spends no time computing (pure host-side ceiling)
    gen = ChunkedGenerator(opts.batch, cams, p3, p2, use_native=True, **kw)
    frames = 0
    t0 = time.perf_counter()
    for batch in Prefetcher(gen.next_epoch(), depth=4):
        frames += batch[2].shape[0] * batch[2].shape[1]
    results["cpp_plus_prefetcher"] = round(frames / (time.perf_counter() - t0), 1)

    try:  # optional grain-backed pipeline (same batches, grain read-ahead)
        from d3dp_tpu.data.grain_pipeline import GrainChunkedPipeline

        gen = ChunkedGenerator(opts.batch, cams, p3, p2, use_native=True, **kw)
        pipe = GrainChunkedPipeline(gen, num_threads=8, prefetch=16)
        for _ in pipe.next_epoch():  # warm grain's one-time bootstrap (~2s)
            pass
        frames = 0
        t0 = time.perf_counter()
        for batch in pipe.next_epoch():
            frames += batch[2].shape[0] * batch[2].shape[1]
        results["cpp_plus_grain"] = round(frames / (time.perf_counter() - t0), 1)
    except ImportError:
        pass

    best = max(results.values())
    print(json.dumps({
        "metric": "host_feed_frames_per_sec",
        "value": best,
        "unit": "frames/s assembled",
        "detail": {
            **results,
            "chips_sustainable_at_19k_frames_per_sec":
                round(best / CHIP_TRAIN_FRAMES_PER_SEC, 1),
        },
    }))


if __name__ == "__main__":
    main()
