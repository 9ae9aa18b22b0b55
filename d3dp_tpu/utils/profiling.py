"""Profiling: jax.profiler traces + step timing.

The reference's only instrumentation is wall-clock epoch timing
(main.py:349, :475) and the in-the-wild Timer. TPU-natively we add
device-level traces viewable in TensorBoard/Perfetto.
"""

import contextlib
import time


@contextlib.contextmanager
def trace(logdir, enabled=True):
    """Capture a jax.profiler trace around a code block."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock stats (p50/mean) for train/eval loops."""

    def __init__(self, window=100):
        self.window = window
        self.times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    def stats(self):
        if not self.times:
            return {}
        ts = sorted(self.times)
        return {
            "p50_s": ts[len(ts) // 2],
            "mean_s": sum(ts) / len(ts),
            "steps_per_s": len(ts) / sum(ts),
        }
