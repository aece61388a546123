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

__all__ = ["fft2_rs", "ifft2_cs", "fft2_cs", "ifft2_rs"]


def _a2a_rs_to_cs(x, axis_name):
    # (M/P, N) -> (M, N/P): split columns, concat rows (ICI all-to-all)
    return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=0, tiled=True)


def _a2a_cs_to_rs(x, axis_name):
    # (M, N/P) -> (M/P, N)
    return jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=1, tiled=True)


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
