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


def rfft2_rs_half(x, axis_name: str):
    """Distributed 2-D rfft of a row-sharded REAL block.

    Returns the half spectrum in a unified local layout (M, Nb + 1):
    ``Nb = (N/2)/P`` body columns (this shard's slice of columns 0..N/2-1
    after the ICI all-to-all) plus the Nyquist column replicated on every
    device (C = N/2+1 is ragged for the all-to-all; carrying the one extra
    column replicated keeps every downstream op uniform — reductions weight
    it on device 0 only, see half_col_weights). Requires N % 2P == 0.
    """
    h = jnp.fft.rfft(x, axis=-1)  # (M/P, N/2+1)
    body, nyq = h[:, :-1], h[:, -1:]
    body = _a2a_rs_to_cs(body, axis_name)  # (M, (N/2)/P)
    nyq = jax.lax.all_gather(nyq, axis_name, axis=0, tiled=True)  # (M, 1)
    h2 = jnp.concatenate([body, nyq], axis=1)
    return jnp.fft.fft(h2, axis=0)


def irfft2_half_rs(h, axis_name: str, n: int):
    """Inverse of :func:`rfft2_rs_half`: unified half spectrum -> row-sharded
    (M/P, N) real."""
    h = jnp.fft.ifft(h, axis=0)
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


def fft2_rs(x, axis_name: str):
    """2-D FFT of a row-sharded real/complex block; returns column-sharded."""
    y = jnp.fft.fft(x.astype(jnp.complex64) if not jnp.iscomplexobj(x) else x, axis=-1)
    y = _a2a_rs_to_cs(y, axis_name)
    return jnp.fft.fft(y, axis=-2)


def ifft2_cs(x, axis_name: str):
    """Inverse of :func:`fft2_rs`: column-sharded complex -> row-sharded real."""
    y = jnp.fft.ifft(x, axis=-2)
    y = _a2a_cs_to_rs(y, axis_name)
    return jnp.fft.ifft(y, axis=-1).real


def fft2_cs(x, axis_name: str):
    """2-D FFT of a column-sharded block; returns row-sharded (used by the
    imaginary double-FFT recursion whose input lives in CS layout)."""
    y = jnp.fft.fft(x.astype(jnp.complex64) if not jnp.iscomplexobj(x) else x, axis=-2)
    y = _a2a_cs_to_rs(y, axis_name)
    return jnp.fft.fft(y, axis=-1)


def ifft2_rs(x, axis_name: str):
    """Inverse of :func:`fft2_cs`: row-sharded complex -> column-sharded real."""
    y = jnp.fft.ifft(x, axis=-1)
    y = _a2a_rs_to_cs(y, axis_name)
    return jnp.fft.ifft(y, axis=-2).real
