"""Native C++ media preprocessor: builds, matches numpy, threads correctly."""
import time

import numpy as np
import pytest

from vitron_tpu.media import native


def test_native_builds():
    assert native.native_available(), "g++ build of preprocess.cpp failed"


def test_matches_numpy_fallback():
    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 255, (3, 96, 128, 3), np.uint8)
    got = native.resize_normalize_batch(imgs, out_size=32)
    want = native._numpy_fallback(imgs, 32, native.OPENAI_DATASET_MEAN,
                                  native.OPENAI_DATASET_STD)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_threaded_equals_single():
    rs = np.random.RandomState(1)
    imgs = rs.randint(0, 255, (8, 64, 80, 3), np.uint8)
    a = native.resize_normalize_batch(imgs, out_size=32, n_threads=1)
    b = native.resize_normalize_batch(imgs, out_size=32, n_threads=8)
    np.testing.assert_array_equal(a, b)


def test_uniform_indices_parity():
    for total, k in ((100, 8), (7, 8), (1, 1), (24, 8)):
        want = np.linspace(0, total - 1, k, dtype=int)
        got = native.uniform_indices(total, k)
        np.testing.assert_array_equal(got, want)


def test_native_faster_than_numpy():
    if not native.native_available():
        pytest.skip("no native lib")
    rs = np.random.RandomState(2)
    imgs = rs.randint(0, 255, (16, 480, 640, 3), np.uint8)
    native.resize_normalize_batch(imgs, out_size=224)  # warm
    t0 = time.perf_counter()
    native.resize_normalize_batch(imgs, out_size=224, n_threads=8)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    native._numpy_fallback(imgs, 224, native.OPENAI_DATASET_MEAN,
                           native.OPENAI_DATASET_STD)
    t_numpy = time.perf_counter() - t0
    print(f"native {t_native*1e3:.1f} ms vs numpy {t_numpy*1e3:.1f} ms")
    assert t_native < t_numpy
