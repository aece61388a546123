"""From-scratch TPU VPU rfft2/irfft2 — flat-2D Stockham FFT in Pallas.

Why (BASELINE.md "Measured single-chip floor"): the shipping pair merge is
FFT-bound — transforms are ~85% of the 24.2 ms kernel — and a Pallas copy
kernel moves the same data ~2.4x faster than XLA's FFT, so VERDICT r2 #4
asked for a from-scratch radix FFT or a measured post-mortem. This module
is that attempt, in the ONE formulation found to survive Mosaic lowering:

- Every in-kernel array is 2-D. A DIF Stockham stage on data (m, s*b)
  [col = s_idx*b + batch] is r row-slices, elementwise butterflies with
  in-kernel iota/cos/sin twiddles (Pallas forbids captured array
  constants), and a lane-axis concatenate — no 3-D reshapes, which Mosaic
  rejects ("unsupported shape cast"), and no bit-reversal pass.
- The tail (rows 8 -> 1) would need sub-8-sublane arrays (8x padding
  waste); instead an 8-point DFT runs as one fp32 MXU matmul
  (precision=HIGHEST) and the result IS row-major (n, b) by the layout
  invariant.
- Kernel I/O is batch-major (b, N) sublane blocks (lane-axis blocks must
  be multiples of 128, which blows the 16 MB VMEM with double-buffered
  pipelining at N=4096); one in-kernel transpose per direction.
- The real-packing (rfft via N/2-point complex FFT), untangling, spectrum
  transposes and final reorder run in XLA, where they fuse into adjacent
  HBM passes.

Reference semantics anchored at shard/tensor/functions.py:45-73 (the
reference's fft_transform/ifft_transform are torch.fft.fftn/ifftn); output
equals ``jnp.fft.rfftn(x, axes=(-2, -1))`` up to fp32 rounding (~1e-6
relative; the chained-multiply twiddles cost ~4x vs library rounding).

STATUS — measured on the v5e, closing VERDICT r2 #4: the core batched
complex FFT (length 4096, batch 4096 fp32, b=32) runs 6.26 ms/transform vs
2.11 ms for XLA's ``jnp.fft.fft`` on identical data (slope-timed, K=1 vs
K=3 chains; scripts/bench_fft_vpu.py + BASELINE.md "Pallas FFT
post-mortem"). Re-measured after snapping quarter-turn twiddles exact
(multiplier-free radix-2/4 butterflies) and forcing a scalar fetch in the
timer: full rfft2+irfft2 roundtrip at (4096, 8192) is 31.0 ms vs XLA's
15.9 — the VPU path stays ~2x slower. The loss is Mosaic-structural, not
tunable away here: the log2(N)-stage ping-pong keeps ALL traffic in VMEM
but each stage's sub-128-lane early concats and the two in-kernel
transposes serialize on the VPU's sublane shuffle network, while XLA's FFT
pipelines HBM<->VMEM with the MXU free. NOT wired into the merge engines;
kept as the measured answer to "is a hand-written TPU FFT faster than
XLA's?" — no, ~2-3x slower in the best lowerable formulation (the 3-D
Stockham does not lower at all, and the r2 MXU-DFT loses 39x on
fp32-exactness passes).
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rfft2_vpu", "irfft2_vpu", "vpu_supported", "factorize"]

_RADICES = (4, 2, 7, 3, 5)
# FFT lengths above this blow the scoped VMEM (the kernel keeps the whole
# axis resident per batch block); 4096 is measured to fit at b=32
_MAX_LEN = 4096


def factorize(n: int) -> Optional[List[int]]:
    """Radix sequence for n, largest radices first; None if unsupported."""
    fs: List[int] = []
    for r in _RADICES:
        while n % r == 0:
            fs.append(r)
            n //= r
    return fs if n == 1 else None


def _supported_len(n: int) -> bool:
    return n >= 8 and n % 8 == 0 and n <= _MAX_LEN and factorize(n // 8) is not None


def _pick_b(batch: int) -> Optional[int]:
    for b in (32, 16, 8):
        if batch % b == 0:
            return b
    return None


def _cmul_scalar(xr, xi, c: complex):
    """(xr + i xi) * c for a compile-time scalar c, special-casing the
    multiplier-free values so radix-2/4 butterflies cost only adds."""
    if c == 1:
        return xr, xi
    if c == -1:
        return -xr, -xi
    if c == -1j:
        return xi, -xr
    if c == 1j:
        return -xi, xr
    cr, ci = c.real, c.imag
    return xr * cr - xi * ci, xr * ci + xi * cr


def _flat_stockham(yr, yi, n: int, b: int, inverse: bool):
    """Complex FFT of length n over (n, b) fp32 planes, flat concat form.

    Invariant: data (m, s*b) with col = s_idx*b + batch; a radix-r DIF
    stage maps it to (m/r, r*s*b). Ends with a DFT-8 MXU matmul; the
    result (8, (n//8)*b) is row-major-identical to (n, b).
    Runs identically inside a Pallas kernel and under plain XLA.
    """
    radices = factorize(n // 8)
    assert radices is not None, n
    sgn = 2.0 * math.pi if inverse else -2.0 * math.pi
    sgnc = 2j * np.pi if inverse else -2j * np.pi
    m = n
    for r in radices:
        m_new = m // r
        # snap quarter-turn twiddles to exact values: np.exp gives e.g.
        # exp(-i*pi) = -1 - 1.22e-16j, which would defeat _cmul_scalar's
        # multiplier-free special cases AND seed ~1e-16 error per stage
        def _snap(z: complex) -> complex:
            snap1 = lambda v: round(v) if abs(v - round(v)) < 1e-12 else v
            return complex(snap1(z.real), snap1(z.imag))

        wr_e = tuple(_snap(complex(np.exp(sgnc * j / r))) for j in range(r))
        ar = [yr[j * m_new:(j + 1) * m_new] for j in range(r)]
        ai = [yi[j * m_new:(j + 1) * m_new] for j in range(r)]
        # w[p] = e^{sign*2pi*i*p/m}, generated in-kernel (iota must be
        # integer-typed for Mosaic), constant across the minor axis
        ang = jax.lax.broadcasted_iota(jnp.int32, (m_new, 1), 0).astype(
            jnp.float32
        ) * jnp.float32(sgn / m)
        wre = jnp.cos(ang)
        wim = jnp.sin(ang)
        outs_r, outs_i = [], []
        for e in range(r):
            br_ = ar[0]
            bi_ = ai[0]
            for j in range(1, r):
                tr, ti = _cmul_scalar(ar[j], ai[j], wr_e[(j * e) % r])
                br_ = br_ + tr
                bi_ = bi_ + ti
            er, ei = br_, bi_
            for _ in range(e):  # w^e by repeated mul (e <= 6; err ~e*eps)
                er, ei = er * wre - ei * wim, er * wim + ei * wre
            outs_r.append(er)
            outs_i.append(ei)
        yr = jnp.concatenate(outs_r, axis=1)
        yi = jnp.concatenate(outs_i, axis=1)
        m = m_new
    # tail: DFT-8 over the remaining 8 rows on the MXU (fp32 via HIGHEST)
    ki = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0).astype(jnp.float32)
    pi_ = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1).astype(jnp.float32)
    ang = jnp.float32(sgn / 8.0) * ki * pi_
    Wr = jnp.cos(ang)
    Wi = jnp.sin(ang)
    hi = jax.lax.Precision.HIGHEST
    outr = jax.lax.dot(Wr, yr, precision=hi) - jax.lax.dot(Wi, yi, precision=hi)
    outi = jax.lax.dot(Wr, yi, precision=hi) + jax.lax.dot(Wi, yr, precision=hi)
    if inverse:
        outr = outr * jnp.float32(1.0 / n)
        outi = outi * jnp.float32(1.0 / n)
    return outr, outi


def _fft_kernel(zr_ref, zi_ref, or_ref, oi_ref, *, n: int, b: int, inverse: bool):
    yr = zr_ref[:].T  # (b, n) -> (n, b)
    yi = zi_ref[:].T
    outr, outi = _flat_stockham(yr, yi, n, b, inverse)
    or_ref[:] = outr  # flat (8, (n//8)*b); XLA reorders outside
    oi_ref[:] = outi


def _fft_batched(zr, zi, inverse: bool):
    """Complex FFT along axis -1 of batch-major (B, N) fp32 planes."""
    B, N = zr.shape
    b = _pick_b(B)
    assert b is not None and _supported_len(N), (B, N)
    grid = (B // b,)
    s = N // 8
    spec = pl.BlockSpec((b, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((8, s * b), lambda i: (0, i), memory_space=pltpu.VMEM)
    nblk = B // b
    fr, fi = pl.pallas_call(
        partial(_fft_kernel, n=N, b=b, inverse=inverse),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((8, nblk * s * b), jnp.float32),
            jax.ShapeDtypeStruct((8, nblk * s * b), jnp.float32),
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(zr, zi)

    # (8, nblk, s, b) [k, i, s_idx, batch] -> (i, batch, k, s_idx) -> (B, N)
    def reorder(f):
        return f.reshape(8, nblk, s, b).transpose(1, 3, 0, 2).reshape(B, N)

    return reorder(fr), reorder(fi)


def _untangle_w(n: int):
    """e^{-2pi i k/N} for k in [0, M), as (M,) fp32 numpy planes."""
    m = n // 2
    wk = np.exp(-2j * np.pi * np.arange(m) / n)
    return (
        jnp.asarray(wk.real.astype(np.float32)),
        jnp.asarray(wk.imag.astype(np.float32)),
    )


def _plan(shape: Tuple[int, ...]):
    if len(shape) != 2:
        return None
    rows, n = shape
    if n % 2:
        return None
    m = n // 2
    if not (_supported_len(m) and _supported_len(rows)):
        return None
    b1 = _pick_b(rows)
    if b1 is None:
        return None
    b2 = _pick_b(m + 1) or 32  # pass-2 batch is padded up to a multiple
    p = -(-(m + 1) // b2) * b2
    return {"rows": rows, "n": n, "m": m, "p": p}


def vpu_supported(shape) -> bool:
    """True if rfft2_vpu can handle this 2-D fp32 shape."""
    return _plan(tuple(shape)) is not None


def rfft2_vpu(x: jnp.ndarray) -> jnp.ndarray:
    """rfftn(x, axes=(-2, -1)) for 2-D fp32 x via the VPU Stockham kernels."""
    plan = _plan(tuple(x.shape))
    assert plan is not None, x.shape
    rows, n, m, p = plan["rows"], plan["n"], plan["m"], plan["p"]
    x = x.astype(jnp.float32)

    # rows pass: rfft of length n as an m-point complex FFT of the packed
    # even/odd samples, untangled to the standard half spectrum [0..m]
    zr = x[:, 0::2]
    zi = x[:, 1::2]
    Zr, Zi = _fft_batched(zr, zi, inverse=False)
    Zfr = jnp.roll(jnp.flip(Zr, axis=-1), 1, axis=-1)
    Zfi = -jnp.roll(jnp.flip(Zi, axis=-1), 1, axis=-1)  # conj Z[(M-k)%M]
    zer = 0.5 * (Zr + Zfr)
    zei = 0.5 * (Zi + Zfi)
    zor = 0.5 * (Zi - Zfi)
    zoi = -0.5 * (Zr - Zfr)
    wkr, wki = _untangle_w(n)
    Ar = zer + wkr * zor - wki * zoi
    Ai = zei + wkr * zoi + wki * zor
    nyq_r = (zer[:, :1] - zor[:, :1])
    nyq_i = (zei[:, :1] - zoi[:, :1])
    Ar = jnp.concatenate([Ar, nyq_r], axis=-1)  # (rows, m+1)
    Ai = jnp.concatenate([Ai, nyq_i], axis=-1)

    # cols pass: plain complex FFT over the row axis, batched over the
    # (padded) half-spectrum columns
    pad = ((0, 0), (0, p - (m + 1)))
    At_r = jnp.pad(Ar, pad).T  # (p, rows) batch-major for the kernel
    At_i = jnp.pad(Ai, pad).T
    St_r, St_i = _fft_batched(At_r, At_i, inverse=False)
    return jax.lax.complex(St_r[: m + 1].T, St_i[: m + 1].T)


def irfft2_vpu(spec: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """irfftn(spec, s=shape, axes=(-2, -1)) via the VPU Stockham kernels."""
    plan = _plan(tuple(shape))
    assert plan is not None, shape
    rows, n, m, p = plan["rows"], plan["n"], plan["m"], plan["p"]

    # inverse cols pass
    pad = ((0, 0), (0, p - (m + 1)))
    St_r = jnp.pad(jnp.real(spec).astype(jnp.float32), pad).T  # (p, rows)
    St_i = jnp.pad(jnp.imag(spec).astype(jnp.float32), pad).T
    At_r, At_i = _fft_batched(St_r, St_i, inverse=True)
    Ar = At_r[: m + 1].T  # (rows, m+1)
    Ai = At_i[: m + 1].T

    # inverse rows pass: retangle the half spectrum into the packed m-point
    # complex signal, inverse FFT, interleave
    main_r = Ar[:, :m]
    main_i = Ai[:, :m]
    flip_r = jnp.flip(Ar[:, 1:m + 1], axis=-1)  # A[M-k], k in [0, M)
    flip_i = jnp.flip(Ai[:, 1:m + 1], axis=-1)
    zer = 0.5 * (main_r + flip_r)
    zei = 0.5 * (main_i - flip_i)
    dr = 0.5 * (main_r - flip_r)
    di = 0.5 * (main_i + flip_i)
    wkr, wki = _untangle_w(n)
    wki = -wki  # inverse untangle uses the conjugate twiddle
    zor = wkr * dr - wki * di
    zoi = wkr * di + wki * dr
    Zcr = zer - zoi  # Zc = ze + i*zo
    Zci = zei + zor
    zr, zi = _fft_batched(Zcr, Zci, inverse=True)
    # out[2j] = Re z_j, out[2j+1] = Im z_j
    return jnp.stack([zr, zi], axis=-1).reshape(rows, n)
