"""Native C++ batch-assembly tests: correctness vs the numpy/PIL path and a
throughput sanity check."""

import time

import numpy as np
import pytest

from vitax import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    return True


def test_assemble_no_resize_no_flip(lib_ok):
    rng = np.random.RandomState(0)
    data = rng.randint(0, 256, (10, 32, 32, 3), np.uint8)
    idx = np.asarray([3, 1, 4], np.int64)
    out = native.assemble_batch(data, idx, None, 4, (32, 32))
    expect = (data[idx].astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out[:3], expect, atol=1e-6)
    np.testing.assert_allclose(out[3], out[0], atol=0)  # padding row


def test_assemble_flip(lib_ok):
    rng = np.random.RandomState(1)
    data = rng.randint(0, 256, (4, 16, 16, 3), np.uint8)
    idx = np.asarray([0, 1], np.int64)
    flips = np.asarray([1, 0], np.uint8)
    out = native.assemble_batch(data, idx, flips, 2, (16, 16))
    expect0 = (data[0, :, ::-1].astype(np.float32) / 255.0 - 0.5) / 0.5
    expect1 = (data[1].astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out[0], expect0, atol=1e-6)
    np.testing.assert_allclose(out[1], expect1, atol=1e-6)


def test_assemble_resize_close_to_pil(lib_ok):
    """Upscale bilinear: within 1 LSB of PIL (float vs fixed-point)."""
    from vitax.data.pipeline import _resize_uint8, normalize
    rng = np.random.RandomState(2)
    data = rng.randint(0, 256, (2, 32, 32, 3), np.uint8)
    idx = np.asarray([0, 1], np.int64)
    out = native.assemble_batch(data, idx, None, 2, (224, 224))
    for j in range(2):
        pil = normalize(_resize_uint8(data[j], (224, 224)))
        # 1 uint8 LSB in normalized units = 2/255
        assert np.max(np.abs(out[j] - pil)) <= 2.5 / 255


def test_loader_native_matches_numpy_path():
    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    from vitax.data import SyntheticDataLoader
    kw = dict(split="train", image_size=32, batch_size=8, num_samples=16,
              seed=3, prefetch=0)
    dl_native = SyntheticDataLoader(use_native=True, **kw)
    dl_numpy = SyntheticDataLoader(use_native=False, **kw)
    assert dl_native.use_native and not dl_numpy.use_native
    for bn, bp in zip(dl_native, dl_numpy):
        np.testing.assert_allclose(bn.images, bp.images, atol=1e-6)
        np.testing.assert_array_equal(bn.labels, bp.labels)
        np.testing.assert_array_equal(bn.weight, bp.weight)


def test_native_faster_than_python(lib_ok):
    """Throughput sanity: native assembly with resize should beat the
    per-sample PIL loop comfortably."""
    from vitax.data.pipeline import _resize_uint8, normalize
    rng = np.random.RandomState(4)
    data = rng.randint(0, 256, (256, 32, 32, 3), np.uint8)
    idx = np.arange(256, dtype=np.int64)

    native.assemble_batch(data, idx, None, 256, (224, 224))  # warmup
    t_native = min(
        _timeit(lambda: native.assemble_batch(data, idx, None, 256,
                                              (224, 224)))
        for _ in range(3))
    t_python = min(
        _timeit(lambda: [normalize(_resize_uint8(data[j], (224, 224)))
                         for j in range(256)])
        for _ in range(3))
    # best-of-3 to ride out scheduler noise on the single-core box; allow
    # a small tolerance — this is a sanity check, PERF.md has real numbers
    assert t_native < 1.2 * t_python, (t_native, t_python)


def _timeit(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0
