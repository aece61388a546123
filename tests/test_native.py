"""Native IO accelerator: build, correctness vs numpy/ml_dtypes (bit-exact
conversions), parallel reads, and the graceful numpy fallback."""

import os

import ml_dtypes
import numpy as np
import pytest

from shardmerge_tpu.io import native


@pytest.fixture(scope="module")
def lib_available():
    ok = native.available()
    if not ok:
        pytest.skip("native toolchain unavailable")
    return ok


def test_bf16_to_f32_bit_exact(lib_available, rng):
    src = (
        rng.standard_normal(2_200_000).astype(np.float32).astype(ml_dtypes.bfloat16)
    )
    got = native.bf16_to_f32(src)
    expect = src.astype(np.float32)
    np.testing.assert_array_equal(got, expect)


def test_f32_to_bf16_bit_exact_rne(lib_available, rng):
    src = (rng.standard_normal(2_200_000) * 1e3).astype(np.float32)
    # include rounding-edge and special values
    src[:8] = [0.0, -0.0, np.inf, -np.inf, np.nan, 1e-40, 3.0000001, -3.0000001]
    got = native.f32_to_bf16(src)
    expect = src.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got.view(np.uint16), expect.view(np.uint16))


def test_parallel_copy(lib_available, rng):
    src = rng.standard_normal(1_500_000).astype(np.float32)
    got = native.parallel_copy(src)
    assert got is not src
    np.testing.assert_array_equal(got, src)


def test_read_blocks(tmp_path, lib_available, rng):
    data = rng.integers(0, 255, 1 << 20, dtype=np.uint8).tobytes()
    path = tmp_path / "blob.bin"
    path.write_bytes(data)

    offsets = [0, 1000, 500_000]
    sizes = [512, 4096, 100_000]
    buffers = [np.empty(s, np.uint8) for s in sizes]
    assert native.read_blocks(str(path), offsets, sizes, buffers)
    for off, size, buf in zip(offsets, sizes, buffers):
        np.testing.assert_array_equal(
            buf, np.frombuffer(data[off : off + size], np.uint8)
        )


def test_prefault_no_crash(tmp_path, lib_available):
    path = tmp_path / "x.bin"
    path.write_bytes(b"a" * 8192)
    native.prefault_file(str(path))


def test_fallback_when_disabled(tmp_path, rng, monkeypatch):
    """SHARDMERGE_NO_NATIVE=1 must route everything through numpy."""
    import importlib

    monkeypatch.setenv("SHARDMERGE_NO_NATIVE", "1")
    import shardmerge_tpu.io.native as native_mod

    fallback = importlib.reload(native_mod)
    try:
        assert not fallback.available()
        src = (rng.standard_normal(100) * 10).astype(np.float32)
        got = fallback.f32_to_bf16(src)
        np.testing.assert_array_equal(
            got.view(np.uint16), src.astype(ml_dtypes.bfloat16).view(np.uint16)
        )
        src16 = src.astype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(
            fallback.bf16_to_f32(src16), src16.astype(np.float32)
        )
        data = rng.integers(0, 255, 4096, dtype=np.uint8)
        path = tmp_path / "f.bin"
        path.write_bytes(data.tobytes())
        buf = np.empty(1024, np.uint8)
        assert fallback.read_blocks(str(path), [100], [1024], [buf])
        np.testing.assert_array_equal(buf, data[100:1124])
    finally:
        monkeypatch.delenv("SHARDMERGE_NO_NATIVE")
        importlib.reload(native_mod)
