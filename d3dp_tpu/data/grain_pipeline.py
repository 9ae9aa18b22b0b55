"""Grain-backed input pipeline: an alternative to the thread Prefetcher.

Wraps a ChunkedGenerator and serves its epochs through `grain.MapDataset`
with multi-threaded prefetching. The determinism contract is untouched:
the epoch order comes from the generator's own RandomState (same
`_epoch_order` consumption as the plain path — so batches are
byte-identical to `ChunkedGenerator.next_epoch` and `random_state()`
checkpoint/resume keeps working); grain only parallelises the batch
ASSEMBLY (edge padding, flip augmentation, the C++ assembler call), which
is a pure function per batch.

The reference feeds the GPU synchronously from the training loop
(main.py:364-380); this is the industrial-strength version of the same
role. Optional — `Prefetcher` + the C++ assembler already sustain ~5.6M
frames/s (scripts/bench_hostfeed.py); use whichever fits the deployment.
"""


class GrainChunkedPipeline:
    """Iterate a ChunkedGenerator's epochs via grain with read-ahead.

    gen: a ChunkedGenerator (endless=False; grain owns the epoch loop).
    to_device: optional callable applied to each batch on the consumer
    side (e.g. partial device_put), matching Prefetcher's contract.
    """

    def __init__(self, gen, num_threads=8, prefetch=8, to_device=None):
        assert not gen.endless, (
            "GrainChunkedPipeline owns epoch iteration; build the generator "
            "with endless=False")
        self.gen = gen
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.to_device = to_device or (lambda x: x)

    def next_epoch(self):
        import grain

        start_idx, table = self.gen._epoch_order()
        bs = self.gen.batch_size
        batches = [
            table[b_i * bs : (b_i + 1) * bs]
            for b_i in range(start_idx, self.gen.num_batches)
        ]
        ds = grain.MapDataset.source(batches).map(self.gen.assemble_batch)
        it = ds.to_iter_dataset(grain.ReadOptions(
            num_threads=self.num_threads,
            prefetch_buffer_size=self.prefetch))
        for batch in it:
            yield self.to_device(tuple(batch))

    # passthroughs preserving the generator surface used by the train loop
    def num_frames(self):
        return self.gen.num_frames()

    def random_state(self):
        return self.gen.random_state()

    def set_random_state(self, random):
        self.gen.set_random_state(random)
