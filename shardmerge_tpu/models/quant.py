"""Weight-only quantization (int8 / packed int4) for inference.

Maps the reference's bitsandbytes 4/8-bit load options
(shard/inference.py:90-115) onto TPU-friendly weight-only quantization:
per-output-channel absmax scales, dequantized on the fly inside the matmul
(bf16 compute on the MXU). int4 is stored two nibbles per uint8 in
SPLIT-HALF layout: the byte at reduction index j holds columns j (low
nibble) and j + K/2 (high nibble). Unpacking is then two ELEMENTWISE
extractions — no interleave stack/reshape, which XLA cannot fuse into the
matmul (the unpacked bf16 weight materialized, measured 3x slower than
bf16 on the v5e decode floor; the split-half GEMV decomposition won the
chip shootout at every bandwidth-bound shape, docs/QUANT_MATMUL.json).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "quantize",
    "dequant",
    "dequant_matmul",
    "quantize_stacked",
    "dequant_stacked",
    "dequant_mxfp4",
    "dequant_gptq",
    "dequant_awq",
]


def quantize(w, bits: int = 8) -> Dict[str, jnp.ndarray]:
    """Quantize an (out, in) weight matrix per output channel.

    Accepts numpy input and then computes ON HOST (returning numpy):
    checkpoint loading must quantize before device placement, or the
    transient fp32 copy spikes device memory at the exact moment
    quantization is supposed to make the model fit."""
    if isinstance(w, np.ndarray):
        return _quantize_host(w, bits)
    assert bits in (4, 8)
    w32 = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=1, keepdims=True)
    qmax = 127.0 if bits == 8 else 7.0
    scale = jnp.maximum(absmax / qmax, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -qmax, qmax).astype(jnp.int8)
    # NOTE: the bit width is encoded in the storage dtype (int8 = 8-bit,
    # uint8 = packed 4-bit) — a "bits" int in the dict would become a traced
    # pytree leaf under jit and break Python branching.
    if bits == 4:
        return {"q": _pack4(q), "scale": scale.astype(jnp.float32)}
    return {"q": q, "scale": scale.astype(jnp.float32)}


def _pack4(q):
    """Split-half nibble pack along axis 1 (jnp or numpy, 2-D or 3-D
    stacked): byte j holds columns j (low) and j+K/2 (high) of the
    reduction dim, so unpack is elementwise and a GEMV reads the packed
    buffer directly as two half-matmuls."""
    xp = np if isinstance(q, np.ndarray) else jnp
    assert q.shape[1] % 2 == 0, "int4 requires even reduction dim"
    h = q.shape[1] // 2
    u = (q + 8).astype(xp.uint8)  # [1, 15]
    return (u[:, :h] | (u[:, h:] << 4)).astype(xp.uint8)


def _quantize_host(w: np.ndarray, bits: int, qkey: str = "q") -> Dict[str, np.ndarray]:
    """Numpy twin of :func:`quantize`/:func:`quantize_stacked` (loader
    path: never touches a device) — ONE implementation for both layouts,
    since they reduce over axis 1 identically and differ only in the
    output key. Copies mmap-backed views first — ml_dtypes astype on a
    mmap bf16 view is ~25x slower than on a RAM copy."""
    assert bits in (4, 8)
    w32 = np.array(w).astype(np.float32)
    absmax = np.max(np.abs(w32), axis=1, keepdims=True)
    qmax = 127.0 if bits == 8 else 7.0
    scale = np.maximum(absmax / qmax, 1e-12).astype(np.float32)
    q = np.clip(np.round(w32 / scale), -qmax, qmax).astype(np.int8)
    if bits == 4:
        return {qkey: _pack4(q), "scale": scale}
    return {qkey: q, "scale": scale}


def _unpack4(packed: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Invert :func:`_pack4`: two elementwise nibble extractions joined by
    a half-boundary concat (the halves are contiguous column blocks — no
    interleave reshape for XLA to choke on)."""
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=axis)


def dequant(wq: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    q = _unpack4(wq["q"]) if wq["q"].dtype == jnp.uint8 else wq["q"]
    return (q.astype(jnp.float32) * wq["scale"]).astype(dtype)


def quantize_stacked(w, bits: int = 8) -> Dict[str, jnp.ndarray]:
    """Quantize a stacked (n_exp, in, out) expert tensor per (expert,
    output-channel) — the gpt-oss fused gate_up/down layout, where the
    LAST dim is the output channels (used as x @ W). Numpy input computes
    on host (see :func:`quantize`)."""
    if isinstance(w, np.ndarray):
        return _quantize_host(w, bits, qkey="q3")
    assert bits in (4, 8)
    w32 = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=1, keepdims=True)  # (E, 1, out)
    qmax = 127.0 if bits == 8 else 7.0
    scale = jnp.maximum(absmax / qmax, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -qmax, qmax).astype(jnp.int8)
    if bits == 4:
        return {"q3": _pack4(q), "scale": scale.astype(jnp.float32)}
    return {"q3": q, "scale": scale.astype(jnp.float32)}


def dequant_stacked(wq: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    q = wq["q3"]
    if q.dtype == jnp.uint8:  # split-half packed on the middle (reduction) dim
        q = _unpack4(q, axis=1)
    return (q.astype(jnp.float32) * wq["scale"]).astype(dtype)


# Trace-time switch: GSPMD jit (no shard_map) cannot partition a
# pallas_call over mesh-sharded operands — callers that trace such
# programs (mesh-sharded serving, the auto-sharded train steps) run the
# trace inside suppress_int4_kernel() so packed int4 takes the XLA
# decomposition, which GSPMD partitions fine. A contextvar keeps the
# suppression scoped to those traces: other engines in the same process
# keep the kernel. shard_map paths need no scope — their bodies see
# per-device local blocks, which the kernel handles like any single
# device.
_kernel_suppressed = contextvars.ContextVar(
    "shardmerge_int4_kernel_suppressed", default=False
)


@contextlib.contextmanager
def suppress_int4_kernel():
    """Route Pallas-kerneled ops through their XLA paths inside this scope.

    Despite the historical name this gates EVERY GSPMD-unpartitionable
    Pallas kernel (the int4 GEMV and the flash-decode attention): the flag
    means "this trace must be partitionable by GSPMD", which is one
    property of the trace, not of any one op."""
    token = _kernel_suppressed.set(True)
    try:
        yield
    finally:
        _kernel_suppressed.reset(token)


def pallas_kernels_suppressed() -> bool:
    """True inside a suppress_int4_kernel() scope (GSPMD-traced program)."""
    return _kernel_suppressed.get()


def scoped_without_int4_kernel(fn):
    """Wrap a (jitted) callable so its traces suppress the Pallas kernel.

    jax.jit traces lazily on first call per shape — wrapping every CALL is
    the only way to guarantee the scope is active whenever the trace
    actually happens; after the trace is cached the scope is inert."""

    @functools.wraps(fn)
    def scoped(*args, **kwargs):
        with suppress_int4_kernel():
            return fn(*args, **kwargs)

    return scoped


def _use_int4_kernel(x: jnp.ndarray, q: jnp.ndarray) -> bool:
    """Route decode-shaped packed-int4 GEMVs to the fused Pallas kernel.

    SHARDMERGE_INT4_KERNEL=0 forces the XLA split-half path, =1 forces
    the kernel even on the CPU backend (interpret mode — tests); default
    is auto: kernel on any real accelerator backend, XLA on host CPU
    (interpret-mode pallas is orders of magnitude slower than XLA there).
    Validated on the chip: compiles at every production tile after the
    uint8>>4 int32-hop fix (scripts/int4_kernel_ablate.py bisected the
    Mosaic remote-compile crash to the sub-word shift) and beats the XLA
    decomposition at every measured decode shape (docs/QUANT_MATMUL.json
    `int4_pallas` 437-479 GB/s vs `int4_splithalf` 255-413)."""
    import os

    mode = os.environ.get("SHARDMERGE_INT4_KERNEL", "")
    if mode == "0" or _kernel_suppressed.get():
        return False
    from .quant_kernels import supported

    if not supported(x.shape, q.shape):
        return False
    return mode == "1" or jax.default_backend() != "cpu"


def dequant_matmul(x: jnp.ndarray, wq: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x @ dequant(W).T — dequantization fuses into the matmul under XLA.

    For split-half packed int4 the product decomposes into two
    half-matmuls — x[..., :h] against the low nibbles and x[..., h:]
    against the high — so the packed buffer is the ONLY weight read from
    HBM (the interleaved layout's unpack materialized the full bf16
    weight; chip shootout in docs/QUANT_MATMUL.json). Decode-shaped
    int4 GEMVs on an accelerator route to the fused Pallas kernel
    (quant_kernels.int4_matmul), which unpacks nibbles in VMEM and beats
    the XLA decomposition on HBM traffic."""
    dims = ((((x.ndim - 1),), (1,)), ((), ()))
    q = wq["q"]
    if q.dtype == jnp.uint8:
        if _use_int4_kernel(x, q):
            from .quant_kernels import int4_matmul

            return int4_matmul(x, q, wq["scale"])
        h = q.shape[1]
        s = wq["scale"]
        wl = (((q & 0xF).astype(jnp.int8) - 8) * s).astype(x.dtype)
        wh = (((q >> 4).astype(jnp.int8) - 8) * s).astype(x.dtype)
        yl = jax.lax.dot_general(
            x[..., :h], wl, dims, preferred_element_type=x.dtype
        )
        yh = jax.lax.dot_general(
            x[..., h:], wh, dims, preferred_element_type=x.dtype
        )
        return yl + yh
    w = dequant(wq, x.dtype)
    return jax.lax.dot_general(x, w, dims, preferred_element_type=x.dtype)


# FP4 e2m1 value table (sign in bit 3): transformers integrations/mxfp4.py
# FP4_VALUES — the authoritative decode of OpenAI's MXFP4 gpt-oss releases.
_FP4_VALUES = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0],
    np.float32,
)


def dequant_mxfp4(blocks: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Decode MXFP4 expert tensors to fp32 ON HOST (numpy).

    ``blocks``: (..., OUT, G, 16) uint8 — 32 fp4 values per 16-byte block,
    LOW nibble first; ``scales``: (..., OUT, G) uint8 e8m0 exponents with
    bias 127, one per block. Returns (..., IN, OUT) with IN = 32*G — the
    final last-two-dims transpose matches the bf16 checkpoint orientation,
    exactly like transformers integrations/mxfp4.py
    convert_moe_packed_tensors (same value table, nibble order, ldexp).
    """
    blocks = np.asarray(blocks)
    exps = np.asarray(scales).astype(np.int32) - 127
    if blocks.shape[:-1] != exps.shape or blocks.shape[-1] != 16:
        raise ValueError(
            f"MXFP4 shape mismatch: blocks {blocks.shape} vs scales "
            f"{np.asarray(scales).shape} (want blocks = scales + (16,))"
        )
    lo = _FP4_VALUES[(blocks & 0x0F).astype(np.int64)]
    hi = _FP4_VALUES[(blocks >> 4).astype(np.int64)]
    # byte b -> values [lo_b, hi_b]: out[0::2] = lo, out[1::2] = hi
    vals = np.stack([lo, hi], axis=-1).reshape(blocks.shape[:-1] + (32,))
    vals = np.ldexp(vals, exps[..., None])
    *prefix, out_dim, g, _ = vals.shape
    vals = vals.reshape(tuple(prefix) + (out_dim, g * 32))
    return np.swapaxes(vals, -1, -2).astype(np.float32)


# AWQ's GEMM kernels permute each 8-value pack for fused int4 dequant on
# GPU: packed nibble k of an int32 holds LOGICAL column [0,2,4,6,1,3,5,7][k]
# of the pack. Unpacking nibbles low-to-high therefore needs the inverse
# permutation (= [0,4,1,5,2,6,3,7], AutoAWQ packing_utils'
# reverse_awq_order) to restore logical column order.
_AWQ_UNPACK_ORDER = np.argsort(np.array([0, 2, 4, 6, 1, 3, 5, 7]))


def dequant_awq(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    bits: int = 4,
) -> np.ndarray:
    """Decode AutoAWQ GEMM-format packed tensors to an (out, in) fp32
    weight ON HOST (numpy).

    Layout (AutoAWQ ``version: gemm``, the Hub-dominant AWQ serialization;
    4-bit only — AutoAWQ's GEMM kernels never shipped other widths):

    - ``qweight`` int32 (in, out/8): 8 nibbles per int32 along OUT,
      little-end-first, in AWQ's interleaved pack order [0,2,4,6,1,3,5,7]
      (nibble k holds logical column AWQ_ORDER^-1[k] of the pack)
    - ``qzeros`` int32 (in/group_size, out/8): same packing, true zeros
      (no GPTQ-style zero-1 offset)
    - ``scales`` fp16 (in/group_size, out)
    - groups are CONTIGUOUS runs of group_size input rows (no g_idx):
      ``W[i, o] = scales[i//gs, o] * (q[i, o] - zero[i//gs, o])``

    group_size is derived from the qweight/qzeros row ratio. Returned
    transposed to this repo's (out, in) convention.
    """
    if bits != 4:
        raise ValueError(f"AWQ GEMM packs 4-bit only, got bits={bits}")
    per = 32 // bits
    maxq = (1 << bits) - 1

    def unpack(packed):
        p = np.asarray(packed).astype(np.uint32)
        shifts = (np.arange(per, dtype=np.uint32) * bits)[None, None, :]
        vals = (p[:, :, None] >> shifts) & maxq
        return vals[:, :, _AWQ_UNPACK_ORDER].reshape(p.shape[0], -1)

    q = unpack(qweight).astype(np.float32)
    zeros = unpack(qzeros).astype(np.float32)
    in_dim, n_groups = q.shape[0], zeros.shape[0]
    if in_dim % n_groups:
        raise ValueError(
            f"AWQ group count {n_groups} does not divide in_dim {in_dim}"
        )
    g = np.arange(in_dim) // (in_dim // n_groups)
    w = np.asarray(scales).astype(np.float32)[g] * (q - zeros[g])
    return np.ascontiguousarray(w.T)


def dequant_gptq(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: np.ndarray,
    bits: int,
    v1_zero_offset: bool = True,
) -> np.ndarray:
    """Decode AutoGPTQ-format packed tensors to an (out, in) fp32 weight
    ON HOST (numpy).

    Layout (AutoGPTQ / gptqmodel "gptq" checkpoint format, bits 4 or 8,
    values packed little-end-first within each int32):

    - ``qweight`` int32 (in/per, out), per = 32//bits values along IN:
      ``q[i, o] = (qweight[i//per, o] >> (bits*(i%per))) & maxq``
    - ``qzeros`` int32 (groups, out/per) packed along OUT; the v1 format
      stores ``zero - 1`` (``v1_zero_offset`` adds it back; ``gptq_v2``
      checkpoints store the true zero)
    - ``scales`` fp16 (groups, out); ``g_idx`` int32 (in,) maps each input
      row to its group (shuffled under desc_act)
    - ``W[i, o] = scales[g_idx[i], o] * (q[i, o] - zero[g_idx[i], o])``

    Returned transposed to this repo's (out, in) convention.
    """
    if bits not in (4, 8):
        raise ValueError(f"GPTQ bits must be 4 or 8, got {bits}")
    per = 32 // bits
    maxq = (1 << bits) - 1
    qw = np.asarray(qweight).astype(np.uint32)
    shifts = (np.arange(per, dtype=np.uint32) * bits)[None, :, None]
    # (in/per, per, out) -> (in, out)
    q = ((qw[:, None, :] >> shifts) & maxq).reshape(-1, qw.shape[1])
    qz = np.asarray(qzeros).astype(np.uint32)
    zeros = ((qz[:, :, None] >> shifts.transpose(0, 2, 1)) & maxq).reshape(
        qz.shape[0], -1
    )
    if v1_zero_offset:
        zeros = zeros + 1
    g = np.asarray(g_idx).astype(np.int64)
    s32 = np.asarray(scales).astype(np.float32)
    w = s32[g] * (q.astype(np.float32) - zeros.astype(np.float32)[g])
    return np.ascontiguousarray(w.T)
