"""Prefetch iterator tests."""

import time

import pytest

from multilingual_text_to_speech_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order():
    assert list(prefetch(range(10), depth=3)) == list(range(10))


def test_prefetch_empty():
    assert list(prefetch([], depth=2)) == []


def test_prefetch_overlaps_production():
    def slow_producer():
        for i in range(4):
            time.sleep(0.05)
            yield i

    t0 = time.perf_counter()
    out = []
    for item in prefetch(slow_producer(), depth=2):
        time.sleep(0.05)  # consumer work overlaps producer work
        out.append(item)
    elapsed = time.perf_counter() - t0
    assert out == [0, 1, 2, 3]
    # serial would be >= 0.4s; overlapped should be well under
    assert elapsed < 0.35


def test_prefetch_propagates_errors():
    def failing():
        yield 1
        raise ValueError("boom")

    it = prefetch(failing(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)
