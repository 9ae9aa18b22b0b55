"""Background-thread batch prefetcher: overlap host batch assembly (and
host->device transfer) with device compute.

The reference feeds the GPU synchronously from the training loop
(main.py:364-380). Here a worker thread runs the generator (optionally the
C++ assembler underneath) and stages `device_put` results a few batches
ahead, so the accelerator never waits on the host.
"""

import queue
import threading


class _Stop:
    pass


class Prefetcher:
    """Wrap a batch iterable; yields batches moved to device ahead of time.

    to_device: callable(batch)->batch, e.g. partial device_put of the array
    members; identity by default.
    """

    def __init__(self, iterable, to_device=None, depth=2):
        self.iterable = iterable
        self.to_device = to_device or (lambda x: x)
        self.depth = depth

    def __iter__(self):
        q = queue.Queue(maxsize=self.depth)
        err = []
        stop = threading.Event()

        def worker():
            try:
                for batch in self.iterable:
                    item = self.to_device(batch)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surface worker errors in the consumer
                err.append(e)
            finally:
                q.put(_Stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _Stop:
                    break
                yield item
        finally:
            # consumer stopped (break / exception / GC): release the worker
            # and drop any staged device batches
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)
        if err:
            raise err[0]


def device_put_batches(*array_indices):
    """to_device factory: jax.device_put the tuple members at given indices
    (None members pass through)."""
    import jax

    def fn(batch):
        out = list(batch)
        for i in array_indices:
            if out[i] is not None:
                out[i] = jax.device_put(out[i])
        return tuple(out)

    return fn
