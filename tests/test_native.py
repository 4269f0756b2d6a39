"""Native C DTW kernel: build, correctness vs numpy fallback, speed sanity."""

import time

import numpy as np
import pytest

from multilingual_text_to_speech_tpu.native import (
    dtw_path_native,
    native_dtw_available,
)


def numpy_dtw(x, y):
    """Force the pure-numpy path by bypassing the native shortcut."""
    import multilingual_text_to_speech_tpu.ops.dtw as dtw_mod
    import multilingual_text_to_speech_tpu.native as native_mod

    orig = native_mod.dtw_path_native
    native_mod.dtw_path_native = lambda *a, **k: None
    try:
        return dtw_mod.dtw_path(x, y)
    finally:
        native_mod.dtw_path_native = orig


def test_native_builds():
    assert native_dtw_available(), (
        "C toolchain present in this environment; native DTW must build"
    )


def test_native_matches_numpy_cost():
    rng = np.random.RandomState(0)
    x = rng.randn(40, 12).astype(np.float32)
    y = rng.randn(55, 12).astype(np.float32)

    nx, ny = dtw_path_native(x, y)
    px, py = numpy_dtw(x, y)

    def path_cost(a, b, ix, iy):
        return float(np.sqrt(((a[ix] - b[iy]) ** 2).sum(axis=1)).sum())

    # both must be valid monotone paths with the same (optimal) cost
    for ix, iy in ((nx, ny), (px, py)):
        assert ix[0] == 0 and iy[0] == 0
        assert ix[-1] == len(x) - 1 and iy[-1] == len(y) - 1
        assert (np.diff(ix) >= 0).all() and (np.diff(iy) >= 0).all()
    np.testing.assert_allclose(
        path_cost(x, y, nx, ny), path_cost(x, y, px, py), rtol=1e-5
    )


def test_native_identical_sequences():
    x = np.random.RandomState(1).randn(30, 12).astype(np.float32)
    nx, ny = dtw_path_native(x, x)
    np.testing.assert_array_equal(nx, ny)
    assert len(nx) == 30  # pure diagonal


def test_native_speedup():
    rng = np.random.RandomState(0)
    x = rng.randn(400, 12).astype(np.float32)
    y = rng.randn(420, 12).astype(np.float32)

    def best_of(fn, n=3):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(x, y)
            times.append(time.perf_counter() - t0)
        return min(times)

    # best-of-3 minima: robust to scheduler noise when the suite runs
    # alongside other load
    t_native = best_of(dtw_path_native)
    t_numpy = best_of(numpy_dtw)
    assert t_native < t_numpy, (t_native, t_numpy)
