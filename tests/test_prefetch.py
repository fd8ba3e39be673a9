"""Background batch prefetcher (data/prefetch.py)."""

import threading
import time

import pytest

from ovmr_tpu.data.prefetch import prefetch_batches


def test_order_preserved():
    assert list(prefetch_batches(range(100))) == list(range(100))


def test_depth_zero_passthrough():
    assert list(prefetch_batches(range(5), depth=0)) == list(range(5))


def test_exception_propagates():
    def gen():
        yield 1
        raise ValueError("decode failed")

    it = prefetch_batches(gen())
    assert next(it) == 1
    with pytest.raises(ValueError, match="decode failed"):
        list(it)


def test_early_abandon_stops_producer():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch_batches(gen(), depth=2)
    for _ in range(3):
        next(it)
    it.close()  # consumer walks away mid-epoch
    n = len(produced)
    time.sleep(0.8)  # producer must notice the stop flag, not run to 1000
    assert len(produced) <= n + 3
    assert threading.active_count() < 20


def test_exception_survives_long_consumer_stall():
    """A producer error must reach a consumer stalled past any delivery
    timeout (cold compiles stall the consumer for minutes); the terminal
    put retries until delivered instead of silently dropping."""

    def gen():
        yield 0
        raise ValueError("late decode failure")

    it = prefetch_batches(gen(), depth=1)
    time.sleep(5.6)  # stall past the old 5s one-shot delivery window
    assert next(it) == 0
    with pytest.raises(ValueError, match="late decode failure"):
        next(it)


def test_overlap_actually_happens():
    """Producer decodes item N+1 while the consumer processes item N."""
    timeline = []

    def gen():
        for i in range(4):
            time.sleep(0.05)  # "decode"
            timeline.append(("produced", i, time.perf_counter()))
            yield i

    t0 = time.perf_counter()
    for i in prefetch_batches(gen(), depth=2):
        time.sleep(0.05)  # "device step"
        timeline.append(("consumed", i, time.perf_counter()))
    elapsed = time.perf_counter() - t0
    # serial would be 8*0.05=0.4s; overlapped ~0.25s. Allow slack for CI.
    assert elapsed < 0.36, f"no overlap: {elapsed:.3f}s, {timeline}"
