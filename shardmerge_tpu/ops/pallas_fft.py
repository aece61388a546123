"""Pallas MXU-based DFT kernels (four-step Cooley-Tukey as fused matmuls).

XLA's TPU FFT streams ~6 memory passes per axis (observed ~90 GB/s
effective); the DFT-as-matmul formulation ("Large-Scale Discrete Fourier
Transform on TPUs", arxiv 2002.03260) turns each axis into two small matrix
multiplications plus a twiddle — compute that is nearly free on the MXU.
Fusing DFT-matmul -> twiddle -> DFT-matmul -> reorder into ONE Pallas kernel
reduces the per-axis cost to a single HBM read + write of the data.

Decomposition (input split n = n2*N1 + n1, output k = k1*N2 + k2; chosen so
every in-kernel op is Mosaic-lowerable — lane dimensions are never split by
reshapes, contractions run through dot_general, and the final reorder is a
supported transpose):

    X[k1*N2 + k2] = sum_n1 W1[k1,n1] * w^(n1*k2) *
                        ( sum_n2 W2[k2,n2] * x[n2*N1 + n1] )

Complex arithmetic is carried as separate fp32 real/imag planes (TPU Pallas
has no complex registers); each complex matmul is 4 real MXU matmuls at
HIGHEST precision (~1.5e-7 relative accuracy vs np.fft — the same error
class as a library FFT).

Kernels:
- dft_rows: DFT along the last axis of an (M, N) array, grid over row blocks
- dft_cols: DFT along the first axis, grid over column blocks
- fft2_mxu / ifft2_mxu: full 2-D transform composed from the two

The host-side wrappers reshape (M, N) <-> 3-D views (free, row-major) so
the kernels only ever merge/split leading dimensions.

STATUS — experimental, not wired into the merge engines. Measured on a
v5e chip: dft_rows 6.7 ms vs XLA fft 4.8 ms per (4096, 8192) axis pass.
The HIGHEST-precision (6x bf16) complex matmuls on VMEM-constrained blocks
(Mosaic caps blocks well under the 16 MB VMEM; lane dims cannot be split
in-kernel) leave the MXU underutilized, and XLA's TPU FFT is better than
its ~90 GB/s streaming suggests. Kept as the starting point for a future
round; correctness is pinned by tests/test_pallas_fft.py. Further probes:
copy-only kernel floor at this block shape is ~2.0 ms (so ~4.7 ms is
matmul/layout overhead), Mosaic rejects Precision.HIGH inside kernels
(only DEFAULT/HIGHEST), and raising the block budget to 16 MB VMEM OOMs at
tm=16 — the remaining ideas are manual bf16x3 split-matmuls and leaner
buffer reuse.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dft_rows", "dft_cols", "fft2_mxu", "ifft2_mxu", "good_split"]

_P = jax.lax.Precision.HIGHEST


def good_split(n: int) -> Tuple[int, int]:
    """Split n = n1*n2 with factors as close as possible (n2 >= n1, so the
    lane-side factor is the larger, MXU-friendlier one)."""
    for n1 in range(int(math.isqrt(n)), 0, -1):
        if n % n1 == 0:
            return (n1, n // n1)
    return (1, n)


@lru_cache(maxsize=32)
def _factors(n: int, inverse: bool) -> Tuple[np.ndarray, ...]:
    """DFT matrices W1 (n1, n1), W2 (n2, n2) and twiddles tw (n1, n2)."""
    n1, n2 = good_split(n)
    sign = 2j if inverse else -2j
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    w1 = np.exp(sign * np.pi * np.outer(k1, k1) / n1)
    w2 = np.exp(sign * np.pi * np.outer(k2, k2) / n2)
    tw = np.exp(sign * np.pi * np.outer(k1, k2) / n)
    return (
        w1.real.astype(np.float32),
        w1.imag.astype(np.float32),
        w2.real.astype(np.float32),
        w2.imag.astype(np.float32),
        tw.real.astype(np.float32),
        tw.imag.astype(np.float32),
    )


def _cdot(ar, ai, br, bi, dims):
    """Complex dot_general via 4 real MXU matmuls."""
    dn = (dims, ((), ()))
    rr = jax.lax.dot_general(ar, br, dn, precision=_P) - jax.lax.dot_general(
        ai, bi, dn, precision=_P
    )
    ri = jax.lax.dot_general(ar, bi, dn, precision=_P) + jax.lax.dot_general(
        ai, br, dn, precision=_P
    )
    return rr, ri


def _rows_kernel(
    xr_ref, xi_ref, w1r_ref, w1i_ref, w2r_ref, w2i_ref, twr_ref, twi_ref,
    or_ref, oi_ref
):
    # block: (tm, n2, n1); contract n2 with W2[k2, n2] -> (tm, n1, k2)
    br, bi = _cdot(xr_ref[:], xi_ref[:], w2r_ref[:], w2i_ref[:], ((1,), (1,)))
    # twiddle tw[n1, k2]
    twr = twr_ref[:][None]
    twi = twi_ref[:][None]
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    # contract n1 with W1[k1, n1] -> (tm, k2, k1)
    dr, di = _cdot(cr, ci, w1r_ref[:], w1i_ref[:], ((1,), (1,)))
    # output (tm, k1, k2): minor-dims swap
    or_ref[:] = dr.transpose(0, 2, 1)
    oi_ref[:] = di.transpose(0, 2, 1)


def _pow2_floor(x: int) -> int:
    return 1 << max(x.bit_length() - 1, 0)


def _pick_block(other: int, fixed_elems: int) -> int:
    """Block length along the gridded axis: power of two; ~12 live fp32
    planes plus Pallas's double-buffered in/out copies within the 16 MB
    VMEM (budgeted at 5 MB of live planes)."""
    budget = max(5 * 2**20 // (12 * 4 * fixed_elems), 8)
    b = min(_pow2_floor(budget), 256)
    while other % b != 0 and b > 1:
        b //= 2
    return max(b, 1)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@partial(jax.jit, static_argnames=("inverse",))
def dft_rows(xr: jnp.ndarray, xi: jnp.ndarray, *, inverse: bool = False):
    """Complex DFT along the last axis of (M, N) fp32 planes -> (re, im)."""
    m, n = xr.shape
    n1, n2 = good_split(n)
    tm = _pick_block(m, n)
    w1r, w1i, w2r, w2i, twr, twi = (jnp.asarray(f) for f in _factors(n, inverse))

    # input split n = n2*N1 + n1: (M, N) -> (M, n2, n1) is a free view
    x3r = xr.reshape(m, n2, n1)
    x3i = xi.reshape(m, n2, n1)

    row_in = pl.BlockSpec((tm, n2, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    row_out = pl.BlockSpec((tm, n1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out_r, out_i = pl.pallas_call(
        _rows_kernel,
        grid=(m // tm,),
        in_specs=[
            row_in,
            row_in,
            full((n1, n1)),
            full((n1, n1)),
            full((n2, n2)),
            full((n2, n2)),
            full((n1, n2)),
            full((n1, n2)),
        ],
        out_specs=(row_out, row_out),
        out_shape=(
            jax.ShapeDtypeStruct((m, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((m, n1, n2), jnp.float32),
        ),
        interpret=_interpret(),
    )(x3r, x3i, w1r, w1i, w2r, w2i, twr, twi)
    # output k = k1*N2 + k2: (M, n1, n2) -> (M, N) free view
    out_r = out_r.reshape(m, n)
    out_i = out_i.reshape(m, n)
    if inverse:
        out_r = out_r / n
        out_i = out_i / n
    return out_r, out_i


def _cols_kernel(
    xr_ref, xi_ref, w1r_ref, w1i_ref, w2r_ref, w2i_ref, twr_ref, twi_ref,
    or_ref, oi_ref
):
    # block: (m2, m1, tn); contract r2 (axis 0) with W2[k2, r2]
    # -> (m1, tn, k2)
    br, bi = _cdot(xr_ref[:], xi_ref[:], w2r_ref[:], w2i_ref[:], ((0,), (1,)))
    # twiddle tw[r1, k2] -> broadcast over tn
    twr = twr_ref[:][:, None, :]
    twi = twi_ref[:][:, None, :]
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    # contract r1 (axis 0) with W1[k1, r1] -> (tn, k2, k1)
    dr, di = _cdot(cr, ci, w1r_ref[:], w1i_ref[:], ((0,), (1,)))
    # output (k1, k2, tn): full reverse
    or_ref[:] = dr.transpose(2, 1, 0)
    oi_ref[:] = di.transpose(2, 1, 0)


@partial(jax.jit, static_argnames=("inverse",))
def dft_cols(xr: jnp.ndarray, xi: jnp.ndarray, *, inverse: bool = False):
    """Complex DFT along the first axis of (M, N) fp32 planes -> (re, im)."""
    m, n = xr.shape
    m1, m2 = good_split(m)
    tn = _pick_block(n, m)
    w1r, w1i, w2r, w2i, twr, twi = (jnp.asarray(f) for f in _factors(m, inverse))

    # input split r = r2*M1 + r1: (M, N) -> (m2, m1, N) free view
    x3r = xr.reshape(m2, m1, n)
    x3i = xi.reshape(m2, m1, n)

    col_in = pl.BlockSpec((m2, m1, tn), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    col_out = pl.BlockSpec((m1, m2, tn), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out_r, out_i = pl.pallas_call(
        _cols_kernel,
        grid=(n // tn,),
        in_specs=[
            col_in,
            col_in,
            full((m1, m1)),
            full((m1, m1)),
            full((m2, m2)),
            full((m2, m2)),
            full((m1, m2)),
            full((m1, m2)),
        ],
        out_specs=(col_out, col_out),
        out_shape=(
            jax.ShapeDtypeStruct((m1, m2, n), jnp.float32),
            jax.ShapeDtypeStruct((m1, m2, n), jnp.float32),
        ),
        interpret=_interpret(),
    )(x3r, x3i, w1r, w1i, w2r, w2i, twr, twi)
    # output row k = k1*M2 + k2: (m1, m2, N) -> (M, N) free view
    out_r = out_r.reshape(m, n)
    out_i = out_i.reshape(m, n)
    if inverse:
        out_r = out_r / m
        out_i = out_i / m
    return out_r, out_i


def fft2_mxu(xr: jnp.ndarray, xi=None):
    """2-D DFT of fp32 planes via the fused MXU kernels; returns (re, im)."""
    if xi is None:
        xi = jnp.zeros_like(xr)
    yr, yi = dft_rows(xr, xi)
    return dft_cols(yr, yi)


def ifft2_mxu(xr: jnp.ndarray, xi: jnp.ndarray):
    yr, yi = dft_cols(xr, xi, inverse=True)
    return dft_rows(yr, yi, inverse=True)
