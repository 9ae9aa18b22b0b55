"""Prefetcher: ordering, error propagation, early-exit worker shutdown."""

import threading
import time

import pytest

from d3dp_tpu.data.prefetch import Prefetcher


def test_order_preserved():
    out = list(Prefetcher(iter(range(20)), depth=3))
    assert out == list(range(20))


def test_to_device_applied():
    out = list(Prefetcher(iter([1, 2, 3]), to_device=lambda x: x * 10))
    assert out == [10, 20, 30]


def test_worker_error_propagates():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = iter(Prefetcher(gen()))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_early_exit_releases_worker():
    """Breaking out of iteration must not leak a blocked worker thread."""
    n_before = threading.active_count()
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    for batch in Prefetcher(gen(), depth=2):
        if batch == 3:
            break  # consumer stops early

    deadline = time.time() + 5
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before
    # the worker stopped promptly instead of draining all 1000 items
    assert len(produced) < 100


def test_latest_checkpoint(tmp_path):
    from d3dp_tpu.train.checkpoint_io import latest_checkpoint

    assert latest_checkpoint(str(tmp_path)) is None
    (tmp_path / "best_epoch.ckpt").write_bytes(b"x")
    assert latest_checkpoint(str(tmp_path)).endswith("best_epoch.ckpt")
    (tmp_path / "epoch_2.ckpt").write_bytes(b"x")
    (tmp_path / "epoch_10.ckpt").write_bytes(b"x")
    assert latest_checkpoint(str(tmp_path)).endswith("epoch_10.ckpt")
