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

The unpack itself is the kernel's bottleneck (round-5 variant shootout,
scripts/int4_kernel_variants.py: pipeline-semantics, row-padding and
MXU-fusion variants all landed within noise — the VPU nibble work is the
critical path). The shipped formulation therefore minimizes per-byte VPU
ops with the byte-plus-low-nibble decomposition: with v the RAW byte
(= u_lo + 16*u_hi, exact in bf16) and u_lo the low nibble,

    x_lo@w_lo + x_hi@w_hi = (x_hi/16)@v + (x_lo - x_hi/16)@u_lo - 8*sum(x)

so the HIGH nibble is never extracted (no int32 hop, no shift — the two
ops Mosaic pays most for), the kernel does one int32->dtype convert (v)
plus one masked int8->dtype convert (u_lo) per byte, and both the x-side
combinations and the -8 zero-point fold happen OUTSIDE the kernel where
XLA fuses them. Measured +13-17% on the 8B MLP GEMVs (526->605, 540->630
GB/s), neutral on qkv; the bf16 rounding of (x_lo - x_hi/16) adds ~5e-3
relL2 vs the two-extract form — an order below the int4 quantization
error itself.

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
    tile sweeps (scripts/int4_kernel_tilesweep.py; round-4 policy pinned
    in docs/QUANT_MATMUL.json tile_sweep, re-swept in round 5 for the
    byte-plus-low-nibble kernel): with the cheaper unpack, the DEEP
    TKH=2048 reduction tile wins at every 2048-divisible shape
    (qkv 576→621, mlp_up 542→615, lm_head already there) with TN=1024
    preferred; shapes whose kh does not divide 2048 (mlp_down's 7168)
    keep the round-4 policy (TN=2048/TKH=1024, 606 GB/s)."""
    if kh % 2048 == 0:
        tn = next((t for t in (1024, 2048, 512, 256, 128) if n % t == 0), None)
        if tn is not None:
            return tn, 2048
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


def _gemv4_kernel(xs_ref, xd_ref, q_ref, scale_ref, out_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qb = q_ref[:]  # (TN, TKH) uint8, one HBM visit per byte
    # Byte-plus-low-nibble form (module docstring): the full byte v needs
    # an int32 hop (Mosaic has no uint8->float cast and bytes don't fit
    # int8); the low nibble masks into int8 directly. The high nibble is
    # never extracted — `uint8 >> 4` also CRASHES the remote Mosaic
    # compile at production shapes (HTTP 500; bisected in
    # scripts/int4_kernel_ablate.py), so this form sidesteps the shift
    # entirely instead of hopping around it.
    v = qb.astype(jnp.int32).astype(xs_ref.dtype)  # [0, 255]
    lo = (qb & 0xF).astype(jnp.int8).astype(xs_ref.dtype)  # [0, 15]
    dims = (((1,), (1,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        xs_ref[:], v, dims, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xd_ref[:], lo, dims, preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:] * scale_ref[:]


def _int4_matmul_2d(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray):
    """(B, K) @ dequant((N, K//2) packed).T -> (B, N), B <= _MAX_ROWS."""
    b, k = x.shape
    n, kh = q.shape
    tn, tkh = _tiles(n, kh)
    pb = -(-b // _ROW_PAD) * _ROW_PAD
    if pb != b:
        x = jnp.pad(x, ((0, pb - b), (0, 0)))
    # x-side combinations of the byte-plus-low-nibble form, computed
    # once outside the kernel (XLA fuses them with the caller): xs rides
    # the raw-byte dot, xd the low-nibble dot. x_hi/16 is exact in bf16
    # (exponent shift); the xd subtraction rounds once.
    xl, xh = x[:, :kh], x[:, kh:]
    xs = xh / 16
    xd = xl - xs
    sumx = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    s_row = scale.reshape(1, n).astype(jnp.float32)
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
        out_shape=jax.ShapeDtypeStruct((pb, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((pb, tn), jnp.float32)],
        interpret=(jax.default_backend() == "cpu"),
    )(xs, xd, q, s_row)
    # the -8 zero-point fold, outside the kernel:
    # x @ (u - 8).T == x @ u.T - 8 * sum(x)
    out = (out - 8.0 * sumx * s_row).astype(x.dtype)
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
