"""Distributed 2-D FFT over a mesh axis (shard_map building blocks).

A (M, N) tensor too large for one chip is sharded row-wise over mesh axis
"x". The 2-D FFT is separable: FFT the local axis, all-to-all transpose the
shard axis over ICI, FFT the other axis (SURVEY.md §7 step 6; the same
decomposition as "Large-Scale Discrete Fourier Transform on TPUs",
arxiv 2002.03260).

Layout conventions (P = axis size):
- RS (row-sharded):    local block (M/P, N)
- CS (column-sharded): local block (M, N/P)

``fft2_rs`` maps RS -> CS; ``ifft2_cs`` maps CS -> RS (returning the real
part); the ``*_cs``/``*_rs`` duals are used by the imaginary double-FFT
recursion, which starts from the opposite layout.

These run INSIDE shard_map bodies — they operate on local blocks and use
collectives, so do not call them outside a shard_map/pmap context.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "fft2_rs",
    "ifft2_cs",
    "fft2_cs",
    "ifft2_rs",
    "rfft2_rs_half",
    "irfft2_half_rs",
    "half_col_weights",
]


def _a2a_rs_to_cs(x, axis_name):
    # (M/P, N) -> (M, N/P): split columns, concat rows (ICI all-to-all)
    return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=0, tiled=True)


def _a2a_cs_to_rs(x, axis_name):
    # (M, N/P) -> (M/P, N)
    return jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=1, tiled=True)


def _pad_rows(x, pad_m: int):
    return jnp.pad(x, ((0, pad_m - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def rfft2_rs_half(x, axis_name: str, true_m: int | None = None):
    """Distributed 2-D rfft of a row-sharded REAL block.

    Returns the half spectrum in a unified local layout (M, Nb + 1):
    ``Nb = (N/2)/P`` body columns (this shard's slice of columns 0..N/2-1
    after the ICI all-to-all) plus the Nyquist column replicated on every
    device (C = N/2+1 is ragged for the all-to-all; carrying the one extra
    column replicated keeps every downstream op uniform — reductions weight
    it on device 0 only, see half_col_weights). Requires N % 2P == 0.

    ``true_m``: when the global row count does not divide the mesh, the
    caller zero-pads rows to M_pad % P == 0 and passes the true count; the
    padding rides the row FFT (zero rows stay zero) and is sliced off after
    the all-to-all, so the column FFT and every downstream reduction see
    exactly the true (true_m, N) spectrum.
    """
    h = jnp.fft.rfft(x, axis=-1)  # (M/P, N/2+1)
    body, nyq = h[:, :-1], h[:, -1:]
    body = _a2a_rs_to_cs(body, axis_name)  # (M, (N/2)/P)
    nyq = jax.lax.all_gather(nyq, axis_name, axis=0, tiled=True)  # (M, 1)
    h2 = jnp.concatenate([body, nyq], axis=1)
    if true_m is not None:
        h2 = h2[:true_m]
    return jnp.fft.fft(h2, axis=0)


def irfft2_half_rs(h, axis_name: str, n: int, pad_m: int | None = None):
    """Inverse of :func:`rfft2_rs_half`: unified half spectrum -> row-sharded
    (M/P, N) real. ``pad_m`` re-inserts the zero padding rows the forward
    sliced off (the caller slices the final result back to true_m rows)."""
    h = jnp.fft.ifft(h, axis=0)
    if pad_m is not None:
        h = _pad_rows(h, pad_m)
    body, nyq = h[:, :-1], h[:, -1:]
    body = _a2a_cs_to_rs(body, axis_name)  # (M/P, N/2)
    rank = jax.lax.axis_index(axis_name)
    mp = body.shape[0]
    nyq_rows = jax.lax.dynamic_slice_in_dim(nyq, rank * mp, mp, axis=0)
    half = jnp.concatenate([body, nyq_rows], axis=1)  # (M/P, N/2+1)
    return jnp.fft.irfft(half, n=n, axis=-1)


def half_col_weights(n: int, n_body_local: int, axis_name: str):
    """Hermitian multiplicities for the unified half-spectrum layout:
    global column 0 (DC) weighs 1, interior body columns 2, and the
    replicated Nyquist column 1 on device 0 / 0 elsewhere (so global
    reductions count it exactly once)."""
    del n
    rank = jax.lax.axis_index(axis_name)
    local = jnp.arange(n_body_local)
    global_col = rank * n_body_local + local
    body_w = jnp.where(global_col == 0, 1.0, 2.0).astype(jnp.float32)
    nyq_w = jnp.where(rank == 0, 1.0, 0.0).astype(jnp.float32)[None]
    return jnp.concatenate([body_w, nyq_w])


def fft2_rs(x, axis_name: str, true_m: int | None = None):
    """2-D FFT of a row-sharded real/complex block; returns column-sharded.
    ``true_m`` slices off caller-inserted zero padding rows after the
    all-to-all (see rfft2_rs_half)."""
    y = jnp.fft.fft(x.astype(jnp.complex64) if not jnp.iscomplexobj(x) else x, axis=-1)
    y = _a2a_rs_to_cs(y, axis_name)
    if true_m is not None:
        y = y[:true_m]
    return jnp.fft.fft(y, axis=-2)


def ifft2_cs(x, axis_name: str, pad_m: int | None = None):
    """Inverse of :func:`fft2_rs`: column-sharded complex -> row-sharded real.
    ``pad_m`` re-inserts zero rows before the all-to-all back."""
    y = jnp.fft.ifft(x, axis=-2)
    if pad_m is not None:
        y = _pad_rows(y, pad_m)
    y = _a2a_cs_to_rs(y, axis_name)
    return jnp.fft.ifft(y, axis=-1).real


def fft2_cs(x, axis_name: str, pad_m: int | None = None):
    """2-D FFT of a column-sharded block; returns row-sharded (used by the
    imaginary double-FFT recursion whose input lives in CS layout). With
    ``pad_m``, zero rows are appended AFTER the axis(-2) FFT purely to make
    the all-to-all divisible; they stay zero through the row FFT and the
    inner blend, and ifft2_rs slices them off before its axis(-2) inverse."""
    y = jnp.fft.fft(x.astype(jnp.complex64) if not jnp.iscomplexobj(x) else x, axis=-2)
    if pad_m is not None:
        y = _pad_rows(y, pad_m)
    y = _a2a_cs_to_rs(y, axis_name)
    return jnp.fft.fft(y, axis=-1)


def ifft2_rs(x, axis_name: str, true_m: int | None = None):
    """Inverse of :func:`fft2_cs`: row-sharded complex -> column-sharded real."""
    y = jnp.fft.ifft(x, axis=-1)
    y = _a2a_rs_to_cs(y, axis_name)
    if true_m is not None:
        y = y[:true_m]
    return jnp.fft.ifft(y, axis=-2).real
