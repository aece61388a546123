"""Fused int4 GEMV in Pallas — the packed buffer is the only HBM read.

Why: the XLA split-half decomposition (models/quant.py dequant_matmul)
measured 171-349 GB/s effective on the v5e decode GEMV shapes while bf16
runs at 706-885 GB/s and the chip's HBM tops out ~819 GB/s
(docs/QUANT_MATMUL.json) — the unpack chain (bitwise -> int8 -> bf16 ->
scale) does not stay fused ahead of the matmul, so int4 weights decode
SLOWER per byte than bf16 ones.  Here the nibble unpack runs on the VPU in
VMEM, tiled so each packed byte is DMA'd from HBM exactly once, the two
half-matmuls hit the MXU per tile, and the per-output-channel scale is
applied once to the f32 accumulator on the final reduction tile.

Layout contract (models/quant.py ``_pack4``): weight W is (N, K), packed
``q`` is (N, K//2) uint8 where byte j holds reduction columns j (low
nibble) and j + K//2 (high nibble) as (value + 8) in [0, 15]; ``scale`` is
(N, 1) f32.  The kernel computes ``x @ dequant(W).T`` with f32
accumulation (the XLA path accumulates in x.dtype, so bf16 inputs agree
only to bf16 rounding).

The -8 zero-point is folded out of the per-element path: with unsigned
nibbles u, ``x @ (u - 8).T == x @ u.T - 8 * sum(x)``, so the VPU does two
bitwise ops and two uint8->dtype converts per byte and the correction is
one (B, 1) reduction per tile.

Reference surface being accelerated: the bitsandbytes 4-bit load option at
/root/reference/shard/inference.py:90-115 (reimagined as TPU weight-only
quantization in models/quant.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["int4_matmul", "supported"]

# Decode/pool/speculative token counts ride the kernel; big prefill
# batches stay on XLA, whose compute-bound scheduling is already good.
_MAX_ROWS = 64
_ROW_PAD = 8  # MXU sublane granule the flattened token dim pads up to


def _tiles(n: int, kh: int) -> Tuple[Optional[int], Optional[int]]:
    """(out-tile, reduction-tile) dividing (N, K//2), chosen per the v5e
    tile sweep (scripts/int4_kernel_tilesweep.py, clean re-run pinned in
    docs/QUANT_MATMUL.json tile_sweep): square-ish 4096-row outputs (qkv,
    mlp_down) run ~25% faster at TN=2048 (halves the out-grid), wide-N
    shapes (mlp_up 14336) regress at 2048 and peak at TN=1024, and very
    tall outputs whose divisibility caps TN at 256 (the 128256-row
    lm_head) want the deeper TKH=2048 reduction tile (+30%)."""
    tn_prefs = (2048, 1024, 512, 256, 128) if n <= 4096 else (1024, 512, 256, 128)
    tn = next((t for t in tn_prefs if n % t == 0), None)
    tkh_prefs = (
        (2048, 1024, 512, 256, 128)
        if tn is not None and tn <= 256
        else (1024, 512, 256, 128)
    )
    tkh = next((t for t in tkh_prefs if kh % t == 0), None)
    return tn, tkh


def supported(x_shape, q_shape) -> bool:
    """True if int4_matmul can run this (x, packed-q) pair."""
    if len(q_shape) != 2:
        return False
    n, kh = q_shape
    if x_shape[-1] != 2 * kh:
        return False
    rows = 1
    for d in x_shape[:-1]:
        rows *= d
    if rows > _MAX_ROWS:
        return False
    tn, tkh = _tiles(n, kh)
    return tn is not None and tkh is not None


def _gemv4_kernel(xl_ref, xh_ref, q_ref, scale_ref, out_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qb = q_ref[:]  # (TN, TKH) uint8, one HBM visit per byte
    # Mosaic has no uint8->float cast; hop through int8 (nibbles fit).
    # The high-nibble shift must ALSO hop through int32: a sub-word
    # `uint8 >> 4` crashes the remote Mosaic compile at production shapes
    # (HTTP 500 from tpu_compile_helper; bisected feature-by-feature in
    # scripts/int4_kernel_ablate.py — `& 0xF` lowers, `>> 4` does not).
    lo = (qb & 0xF).astype(jnp.int8).astype(xl_ref.dtype)  # [0, 15]
    hi = (qb.astype(jnp.int32) >> 4).astype(jnp.int8).astype(xl_ref.dtype)
    dims = (((1,), (1,)), ((), ()))
    prod = jax.lax.dot_general(
        xl_ref[:], lo, dims, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xh_ref[:], hi, dims, preferred_element_type=jnp.float32
    )
    # fold the +8 nibble offset: x @ (u - 8).T = x @ u.T - 8 * sum(x)
    sx = jnp.sum(
        xl_ref[:].astype(jnp.float32) + xh_ref[:].astype(jnp.float32),
        axis=1,
        keepdims=True,
    )
    acc_ref[:] += prod - 8.0 * sx

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[:]).astype(out_ref.dtype)


def _int4_matmul_2d(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray):
    """(B, K) @ dequant((N, K//2) packed).T -> (B, N), B <= _MAX_ROWS."""
    b, k = x.shape
    n, kh = q.shape
    tn, tkh = _tiles(n, kh)
    pb = -(-b // _ROW_PAD) * _ROW_PAD
    if pb != b:
        x = jnp.pad(x, ((0, pb - b), (0, 0)))
    grid = (n // tn, kh // tkh)
    out = pl.pallas_call(
        _gemv4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((pb, tkh), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((pb, tkh), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tkh), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (pb, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pb, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((pb, tn), jnp.float32)],
        interpret=(jax.default_backend() == "cpu"),
    )(x[:, :kh], x[:, kh:], q, scale.reshape(1, n).astype(jnp.float32))
    return out[:b]


@jax.custom_vjp
def int4_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray):
    """``x @ dequant({q, scale}).T`` via the fused Pallas kernel.

    x is (..., K) float; q/scale per the module docstring.  Check
    :func:`supported` first — unaligned shapes must take the XLA path.
    """
    lead = x.shape[:-1]
    out = _int4_matmul_2d(x.reshape(-1, x.shape[-1]), q, scale)
    return out.reshape(*lead, q.shape[0])


def _fwd(x, q, scale):
    return int4_matmul(x, q, scale), (q, scale)


def _bwd(res, g):
    # dx = g @ dequant(W); frozen-base quantized weights carry no grads.
    # The backward runs on the XLA dequant path (training batch shapes).
    q, scale = res
    lo = (q & 0xF).astype(jnp.int8) - 8
    hi = (q >> 4).astype(jnp.int8) - 8
    w = (
        jnp.concatenate([lo, hi], axis=1).astype(jnp.float32) * scale
    ).astype(g.dtype)
    dims = (((g.ndim - 1,), (0,)), ((), ()))
    dx = jax.lax.dot_general(g, w, dims, preferred_element_type=g.dtype)
    return dx, None, None


int4_matmul.defvjp(_fwd, _bwd)
