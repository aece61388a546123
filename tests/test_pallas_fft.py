"""Pallas MXU DFT kernels: correctness vs numpy FFT (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from shardmerge_tpu.ops.pallas_fft import (
    dft_cols,
    dft_rows,
    fft2_mxu,
    good_split,
    ifft2_mxu,
)


def test_good_split():
    assert good_split(8192) == (64, 128)
    assert good_split(4096) == (64, 64)
    assert good_split(48) == (6, 8)
    assert good_split(7) == (1, 7)


@pytest.mark.parametrize("shape", [(64, 96), (32, 128)])
def test_dft_axes_match_numpy(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    xr, xi = jnp.asarray(x), jnp.zeros(shape, jnp.float32)

    rr, ri = dft_rows(xr, xi)
    ref = np.fft.fft(x, axis=-1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        np.asarray(rr) + 1j * np.asarray(ri), ref, atol=2e-6 * scale
    )

    cr, ci = dft_cols(xr, xi)
    refc = np.fft.fft(x, axis=0)
    np.testing.assert_allclose(
        np.asarray(cr) + 1j * np.asarray(ci), refc, atol=2e-6 * scale
    )


def test_fft2_roundtrip_and_match(rng):
    x = rng.standard_normal((64, 96)).astype(np.float32)
    fr, fi = fft2_mxu(jnp.asarray(x))
    ref = np.fft.fft2(x)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        np.asarray(fr) + 1j * np.asarray(fi), ref, atol=2e-6 * scale
    )
    br, _ = ifft2_mxu(fr, fi)
    np.testing.assert_allclose(np.asarray(br), x, atol=1e-5)


def test_complex_input_dft(rng):
    x = rng.standard_normal((32, 64)).astype(np.float32)
    y = rng.standard_normal((32, 64)).astype(np.float32)
    rr, ri = dft_rows(jnp.asarray(x), jnp.asarray(y))
    ref = np.fft.fft(x + 1j * y, axis=-1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        np.asarray(rr) + 1j * np.asarray(ri), ref, atol=2e-6 * scale
    )
