"""Exact order statistics without sorting.

The reference takes percentile thresholds as exact elements of a full
``torch.sort`` (shard/tensor/functions.py:113-119 cutoff, :138-147 cull).
Sorting a 100M+-element tensor on TPU is catastrophically slow and
memory-hungry; instead we binary-search the value's bit pattern.

For non-negative IEEE-754 floats, the raw bit pattern (as uint32) is
monotonically ordered, so the k-th smallest element can be found with 32
rounds of counting — each a single streaming pass at HBM bandwidth, fully
jittable, and trivially extensible to sharded tensors (the count becomes a
``psum``). NaNs sort last, matching ``torch.sort`` semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kth_smallest_nonneg"]

# Bits per bisection round. Measured on v5e (32M-element weighted select):
# 1 bit -> 10.8 ms (32 fused passes), 2 bits -> 0.85 ms, 4 bits -> 4.5 ms
# (the (n, 15)-candidate broadcast stops fusing), 8 bits -> 98 ms. Two bits
# (3 candidates/round, 16 rounds) is the fusion sweet spot.
_BITS_PER_ROUND = 2
_ROUNDS = 32 // _BITS_PER_ROUND


def kth_smallest_nonneg(x: jnp.ndarray, k: jnp.ndarray, axis_name: str | None = None):
    """Return the k-th smallest element (0-indexed) of non-negative f32 ``x``.

    Exactly equivalent to ``jnp.sort(x.ravel())[k]`` for arrays of
    non-negative finite floats (NaNs permitted: they rank last, like
    ``torch.sort``). ``k`` may be a traced scalar.

    If ``axis_name`` is given, ``x`` is one shard of a distributed array and
    counts are combined with ``psum`` over that mesh axis, yielding the global
    order statistic.
    """
    u = jax.lax.bitcast_convert_type(x.ravel(), jnp.uint32)
    k = jnp.asarray(k, jnp.int32)

    def round_step(i, prefix):
        shift = 32 - _BITS_PER_ROUND * (i + 1)
        # Try candidate digits 1..2^B-1 at once (digit 0 trivially keeps the
        # invariant; digit 2^B would overflow the current nibble/uint32).
        cands = prefix + (
            jnp.arange(1, 2**_BITS_PER_ROUND, dtype=jnp.uint32) << shift
        )
        # counts[j] = #elements strictly below candidate j (one fused pass).
        below = u[:, None] < cands[None, :]
        counts = jnp.sum(below.astype(jnp.int32), axis=0)
        if axis_name is not None:
            counts = jax.lax.psum(counts, axis_name)
        # Largest candidate whose strict-below count is still <= k keeps the
        # invariant count(u < prefix) <= k.
        ok = counts <= k
        step = jnp.sum(ok.astype(jnp.uint32)) << shift
        return prefix + step

    prefix = jax.lax.fori_loop(0, _ROUNDS, round_step, jnp.uint32(0))
    return jax.lax.bitcast_convert_type(prefix, jnp.float32)


def kth_smallest_weighted(
    x: jnp.ndarray,
    k: jnp.ndarray,
    col_weights: jnp.ndarray,
    y: jnp.ndarray | None = None,
    axis_name: str | None = None,
):
    """k-th smallest of a column-weighted multiset (one or two 2-D arrays).

    Each element of column j counts ``col_weights[j]`` times — the exact
    half-spectrum representation of a Hermitian-symmetric full spectrum
    (rfft): interior columns appear twice, DC/Nyquist once. Equivalent to
    materializing the full mirrored array and ranking it.
    """
    k = jnp.asarray(k, jnp.int32)
    # normalize 1-D inputs to one row: the (1, C, K)-broadcast candidate
    # compare below needs >= 2 data dims or the reduction leaves a
    # per-column axis in the counts (garbage prefixes, no error)
    if x.ndim == 1:
        x = x[None, :]
    if y is not None and y.ndim == 1:
        y = y[None, :]
    w = jnp.asarray(col_weights, jnp.int32)[None, :, None]  # (1, C, 1)
    ux = jax.lax.bitcast_convert_type(x, jnp.uint32)[..., None]  # (..., C, 1)
    uy = (
        jax.lax.bitcast_convert_type(y, jnp.uint32)[..., None]
        if y is not None
        else None
    )
    # reduce every data axis, keeping only the trailing candidate axis —
    # ndim>=3 inputs (fused expert stacks, (E, M, C)) count across E too
    data_axes = tuple(range(ux.ndim - 1))

    def round_step(i, prefix):
        shift = 32 - _BITS_PER_ROUND * (i + 1)
        cands = prefix + (
            jnp.arange(1, 2**_BITS_PER_ROUND, dtype=jnp.uint32) << shift
        )[None, None, :]
        counts = jnp.sum((ux < cands).astype(jnp.int32) * w, axis=data_axes)
        if uy is not None:
            counts = counts + jnp.sum(
                (uy < cands).astype(jnp.int32) * w, axis=data_axes
            )
        if axis_name is not None:
            counts = jax.lax.psum(counts, axis_name)
        ok = counts <= k
        step = jnp.sum(ok.astype(jnp.uint32)) << shift
        return prefix + step

    prefix = jax.lax.fori_loop(0, _ROUNDS, round_step, jnp.uint32(0))
    return jax.lax.bitcast_convert_type(prefix, jnp.float32)


def kth_smallest_nonneg2(
    x: jnp.ndarray,
    y: jnp.ndarray,
    k: jnp.ndarray,
    axis_name: str | None = None,
):
    """k-th smallest of the multiset union of two arrays.

    Exactly ``kth_smallest_nonneg(concatenate([x.ravel(), y.ravel()]), k)``
    without materializing the concatenation (the cutoff threshold of
    reference functions.py:113-119 ranks cat(|Re v0|, |Re v1|); at 70B-layer
    sizes the concat buffer alone is ~2 GB).
    """
    ux = jax.lax.bitcast_convert_type(x.ravel(), jnp.uint32)
    uy = jax.lax.bitcast_convert_type(y.ravel(), jnp.uint32)
    k = jnp.asarray(k, jnp.int32)

    def round_step(i, prefix):
        shift = 32 - _BITS_PER_ROUND * (i + 1)
        cands = prefix + (
            jnp.arange(1, 2**_BITS_PER_ROUND, dtype=jnp.uint32) << shift
        )
        counts = jnp.sum(
            (ux[:, None] < cands[None, :]).astype(jnp.int32), axis=0
        ) + jnp.sum((uy[:, None] < cands[None, :]).astype(jnp.int32), axis=0)
        if axis_name is not None:
            counts = jax.lax.psum(counts, axis_name)
        ok = counts <= k
        step = jnp.sum(ok.astype(jnp.uint32)) << shift
        return prefix + step

    prefix = jax.lax.fori_loop(0, _ROUNDS, round_step, jnp.uint32(0))
    return jax.lax.bitcast_convert_type(prefix, jnp.float32)
