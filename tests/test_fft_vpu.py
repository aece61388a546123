"""VPU Stockham FFT kernels (ops/fft_vpu): correctness vs numpy, interpret
mode on CPU. Reference FFT semantics: shard/tensor/functions.py:45-73
(torch.fft.fftn/ifftn); this module replaces only the transform, so parity
with numpy's rfftn/irfftn at fp32 accuracy is the whole contract."""

import jax.numpy as jnp
import numpy as np
import pytest

from shardmerge_tpu.ops import fft_vpu


def test_factorize():
    assert fft_vpu.factorize(4096) is not None
    assert fft_vpu.factorize(14336 // 2) is not None  # 2^10 * 7 (Llama MLP)
    assert fft_vpu.factorize(11) is None
    assert fft_vpu.factorize(1) == []


def test_supported_gate():
    assert fft_vpu.vpu_supported((4096, 8192))
    assert fft_vpu.vpu_supported((2048, 3584))  # radix-7 axis (1792=2^8*7)
    assert not fft_vpu.vpu_supported((4096, 14336))  # m=7168 > VMEM bound
    assert not fft_vpu.vpu_supported((4096, 8191))  # odd n
    assert not fft_vpu.vpu_supported((4, 128))  # rows too small to block
    assert not fft_vpu.vpu_supported((4096, 22))  # m=11 unfactorable
    assert not fft_vpu.vpu_supported((4096,))  # 1-D


@pytest.mark.parametrize(
    "shape",
    [
        (64, 128),  # radix 4/2 only
        (128, 448),  # radix-7 column axis (224 = 2^5 * 7)
        (56, 112),  # radix-7 rows AND columns
        (96, 160),  # radix 3 and 5
    ],
)
def test_rfft2_matches_numpy(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(fft_vpu.rfft2_vpu(jnp.asarray(x)))
    want = np.fft.rfftn(x, axes=(-2, -1))
    scale = np.abs(want).max()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=4e-6 * scale)


@pytest.mark.parametrize("shape", [(64, 128), (128, 448)])
def test_irfft2_roundtrip(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    spec = fft_vpu.rfft2_vpu(jnp.asarray(x))
    back = np.asarray(fft_vpu.irfft2_vpu(spec, shape))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_irfft2_from_numpy_spectrum(rng):
    """Inverse accepts any Hermitian half spectrum, not just our forward's."""
    shape = (64, 128)
    x = rng.standard_normal(shape).astype(np.float32)
    spec = np.fft.rfftn(x, axes=(-2, -1)).astype(np.complex64)
    back = np.asarray(fft_vpu.irfft2_vpu(jnp.asarray(spec), shape))
    np.testing.assert_allclose(back, x, atol=1e-5)
