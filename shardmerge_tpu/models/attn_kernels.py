"""Flash-decode attention in Pallas — STATUS: built, measured, OPT-IN ONLY.

History: the end-to-end context probe priced the decode attention's K/V
reads at ~121-125 GB/s (15% of the v5e's 819 GB/s HBM roof), which this
kernel was written to fix. An isolated microbenchmark
(scripts/flash_decode_microbench.py, slope-timed on the chip at 8B
geometry B=1 KVH=8 G=4 D=128 S=8192) then showed the REAL cause was
elsewhere: XLA's own einsum decode attention streams the cache at
~757 GB/s (92% of roof) when handed the cache buffer directly — the
end-to-end 121 GB/s came from ``forward`` re-assembling the stacked KV
cache with ``jnp.stack`` every step, copying the whole multi-GiB cache
per token (fixed in models/llama.py by threading the stacked buffers
through the layer loop with in-place dynamic_update_slices). This kernel
measures ~458 GB/s on the same shape — the (G=4, BS) score tiles are too
skinny to keep the MXU busy and the per-tile softmax recurrence runs on
the VPU between DMAs — so the XLA path is the better production route
and this kernel is OFF by default (SHARDMERGE_FLASH_DECODE=1 opts in).
Kept as working, tested infrastructure: at G>=8 with a fatter tile the
balance may flip on future geometries.

Semantics: identical to the masked full-bucket attention it replaces.
The caller passes the SAME additive mask ``forward`` already built
(0 / -1e9 over cache slots), so causal horizons, ``attn_len``, sliding
windows, chunked attention, left-padded batch rows and the continuous
pool's ``key_positions`` gaps all ride through unchanged — the kernel
never re-derives masking logic. Softmax is the standard online
(running-max) recurrence in f32; a fully-masked tile contributes weight
``exp(-1e9 - m)`` which underflows to zero the moment any valid slot has
been seen, and the running max is seeded at -1e30 so an all-masked
prefix stays finite (decode always has >= 1 valid slot: the token just
written).

Out of scope (callers route these to the XLA path): T > 1 queries,
gpt-oss attention sinks, gemma2 logit softcapping, MLA's compressed
cache, and GSPMD-traced programs (a pallas_call cannot be partitioned
over mesh-sharded operands — the quant.suppress_int4_kernel() scope
gates this kernel too).

Reference surface being accelerated: the decode half of the HF
``model.generate`` path the reference serves through
(/root/reference/shard/inference.py:174-200); the reference has no
long-context serving story at all.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_decode", "supported", "use_flash_decode"]

_LANES = 128          # TPU lane width: head_dim must tile onto it
_NEG_INIT = -1e30     # running-max seed; more negative than any masked score


def _block_s(s: int) -> Optional[int]:
    """K/V tile length along the cache-slot dim. 512 keeps the three
    resident tiles (K, V, scores) comfortably inside VMEM at D=128 and
    amortizes the per-tile softmax recurrence; smaller buckets fall back
    to whatever divides them."""
    for bs in (512, 256, 128):
        if s % bs == 0:
            return bs
    return None


def supported(q_shape, s: int) -> bool:
    """True if flash_decode can run a (B, KVH, G, D) query over an
    S-slot cache."""
    b, kvh, g, d = q_shape
    if d % _LANES != 0 or g > 64:
        return False
    return _block_s(s) is not None


def use_flash_decode(cfg, layer, t: int, q_shape, s: int) -> bool:
    """Route decision for one attention call (trace-time, static).

    Default OFF — the isolated microbench showed XLA's einsum path
    streams the cache faster than this kernel once the cache-restack bug
    was fixed (module docstring). SHARDMERGE_FLASH_DECODE=1 opts in (on
    the CPU backend that runs in interpret mode — tests).
    """
    if t != 1 or "sinks" in layer or cfg.attn_logit_softcapping:
        return False
    if os.environ.get("SHARDMERGE_FLASH_DECODE", "") != "1":
        return False
    from .quant import pallas_kernels_suppressed

    if pallas_kernels_suppressed():
        return False
    return supported(q_shape, s)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, m_ref, l_ref, acc_ref):
    si = pl.program_id(2)

    @pl.when(si == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INIT)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qb = q_ref[0, 0]  # (G, D) f32 — pre-scaled by 1/sqrt(d) at the call site
    kb = k_ref[0, 0]  # (BS, D) bf16, the HBM-bound read
    vb = v_ref[0, 0]  # (BS, D)
    dims = (((1,), (1,)), ((), ()))
    # cast in VMEM (free of HBM traffic) to match the XLA path's f32 scores
    s_tile = jax.lax.dot_general(
        qb, kb.astype(jnp.float32), dims, preferred_element_type=jnp.float32
    )  # (G, BS)
    s_tile = s_tile + mask_ref[0]  # (1, BS) additive mask broadcasts

    m_prev = m_ref[:, :1]  # (G, 1), lane-replicated store below
    m_new = jnp.maximum(m_prev, jnp.max(s_tile, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)  # (G, 1)
    p = jnp.exp(s_tile - m_new)  # (G, BS) f32
    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p, vb.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G, D)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(si == pl.num_programs(2) - 1)
    def _():
        out_ref[0, 0] = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)


def flash_decode(
    q: jnp.ndarray,          # (B, KVH, G, D) — already rope'd + scaled
    k_cache: jnp.ndarray,    # (B, KVH, S, D)
    v_cache: jnp.ndarray,    # (B, KVH, S, D)
    mask: jnp.ndarray,       # (B, S) additive f32 (0 valid / -1e9 masked)
) -> jnp.ndarray:
    """Masked full-bucket decode attention; returns (B, KVH, G, D) f32.

    Check :func:`supported` (or :func:`use_flash_decode`) first —
    unaligned shapes must take the XLA einsum path.
    """
    b, kvh, g, d = q.shape
    s = k_cache.shape[2]
    bs = _block_s(s)
    grid = (b, kvh, s // bs)
    return pl.pallas_call(
        _flash_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, g, d), lambda bi, hi, si: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bs, d), lambda bi, hi, si: (bi, hi, si, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bs, d), lambda bi, hi, si: (bi, hi, si, 0),
                memory_space=pltpu.VMEM,
            ),
            # mask rides as (B, 1, S): a (1, 1, BS) block keeps the
            # second-to-last block dim equal to its array dim, which the
            # Mosaic tiling rule requires (a (1, BS) block over (B, S)
            # fails it whenever B > 1 — hit live at B=4 on the chip)
            pl.BlockSpec(
                (1, 1, bs), lambda bi, hi, si: (bi, 0, si),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, g, d), lambda bi, hi, si: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g, _LANES), jnp.float32),  # running max
            pltpu.VMEM((g, _LANES), jnp.float32),  # running denominator
            pltpu.VMEM((g, d), jnp.float32),       # output accumulator
        ],
        interpret=(jax.default_backend() == "cpu"),
    )(q, k_cache, v_cache, mask.astype(jnp.float32)[:, None, :])
