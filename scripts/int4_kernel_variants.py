#!/usr/bin/env python
"""Variant shootout for the fused int4 GEMV (VERDICT r4 #7: 627 -> ? GB/s).

The round-4 tile sweep fixed (TN, TKH) but left ~20% to the 819 GB/s
roof. This script A/Bs kernel-structure variants against the shipped
kernel with the same min-of-reps scan-slope methodology:

- base:      the production kernel (models/quant_kernels.py)
- dimsem:    same body, grid dims annotated (parallel, arbitrary) so
             Mosaic may reorder/overlap block iterations
- pb16:      token rows padded to 16 (bf16 sublane tile) instead of 8
- fused1dot: the two half-matmuls fused into ONE MXU call over a
             (pb, 2*TKH) concatenated operand (halves the MXU issue
             count per grid step; costs one VPU concat of the unpacked
             nibbles)
- dszero:    dimsem + the k==0 accumulator zeroing replaced by
             @pl.when-free select (writes out directly on the last step)

Usage: python scripts/int4_kernel_variants.py [--shapes qkv,mlp_up]
       [--variants base,dimsem,pb16,fused1dot] [--reps 5] [--scan-k 256]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shardmerge_tpu.models import quant_kernels as qk

SHAPES = {
    "qkv": (4096, 4096),
    "mlp_up": (14336, 4096),
    "mlp_down": (4096, 14336),
    "lm_head": (128256, 4096),
}


def _body_base(xl_ref, xh_ref, q_ref, scale_ref, out_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qb = q_ref[:]
    lo = (qb & 0xF).astype(jnp.int8).astype(xl_ref.dtype)
    hi = (qb.astype(jnp.int32) >> 4).astype(jnp.int8).astype(xl_ref.dtype)
    dims = (((1,), (1,)), ((), ()))
    prod = jax.lax.dot_general(
        xl_ref[:], lo, dims, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xh_ref[:], hi, dims, preferred_element_type=jnp.float32
    )
    sx = jnp.sum(
        xl_ref[:].astype(jnp.float32) + xh_ref[:].astype(jnp.float32),
        axis=1,
        keepdims=True,
    )
    acc_ref[:] += prod - 8.0 * sx

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[:]).astype(out_ref.dtype)


def _body_fused1dot(x2_ref, q_ref, scale_ref, out_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qb = q_ref[:]
    lo = (qb & 0xF).astype(jnp.int8).astype(x2_ref.dtype)
    hi = (qb.astype(jnp.int32) >> 4).astype(jnp.int8).astype(x2_ref.dtype)
    w2 = jnp.concatenate([lo, hi], axis=1)  # (TN, 2*TKH)
    x2 = x2_ref[:]  # (pb, 2*TKH): [xl_block | xh_block]
    dims = (((1,), (1,)), ((), ()))
    prod = jax.lax.dot_general(
        x2, w2, dims, preferred_element_type=jnp.float32
    )
    sx = jnp.sum(x2.astype(jnp.float32), axis=1, keepdims=True)
    acc_ref[:] += prod - 8.0 * sx

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[:]).astype(out_ref.dtype)


def _body_vlo(xs_ref, xd_ref, q_ref, scale_ref, out_ref, acc_ref):
    """Byte-plus-low-nibble decomposition: with v the raw byte and
    u_lo the low nibble (both unsigned), x_lo@w_lo + x_hi@w_hi
    == (x_hi/16)@v + (x_lo - x_hi/16)@u_lo - 8*sum(x), so the HIGH
    nibble is never extracted (no int32 hop, no shift) and the -8 fold
    moves outside the kernel. VPU cost drops from 7 to 5 ops/byte."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qb = q_ref[:]
    v = qb.astype(jnp.int32).astype(xs_ref.dtype)  # full byte [0, 255]
    lo = (qb & 0xF).astype(jnp.int8).astype(xs_ref.dtype)  # [0, 15]
    dims = (((1,), (1,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        xs_ref[:], v, dims, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xd_ref[:], lo, dims, preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[:]).astype(out_ref.dtype)


def make_variant(name):
    """Returns fn(x (B, K), q, scale) -> (B, N) for the variant."""

    def call_2halves(x, q, scale, *, row_pad, dimsem):
        b, kdim = x.shape
        n, kh = q.shape
        tn, tkh = qk._tiles(n, kh)
        pb = -(-b // row_pad) * row_pad
        if pb != b:
            x = jnp.pad(x, ((0, pb - b), (0, 0)))
        grid = (n // tn, kh // tkh)
        params = {}
        if dimsem:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            )
        out = pl.pallas_call(
            _body_base,
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
            **params,
        )(x[:, :kh], x[:, kh:], q, scale.reshape(1, n).astype(jnp.float32))
        return out[:b]

    def call_fused(x, q, scale, *, row_pad=8, dimsem=False):
        b, kdim = x.shape
        n, kh = q.shape
        tn, tkh = qk._tiles(n, kh)
        pb = -(-b // row_pad) * row_pad
        if pb != b:
            x = jnp.pad(x, ((0, pb - b), (0, 0)))
        # x rearranged so block j of the LAST axis delivers
        # [xl[:, j*tkh:(j+1)*tkh] | xh[:, j*tkh:(j+1)*tkh]] contiguously
        xl = x[:, :kh].reshape(pb, kh // tkh, tkh)
        xh = x[:, kh:].reshape(pb, kh // tkh, tkh)
        x2 = jnp.concatenate([xl, xh], axis=2).reshape(pb, 2 * kh)
        grid = (n // tn, kh // tkh)
        params = {}
        if dimsem:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            )
        out = pl.pallas_call(
            _body_fused1dot,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (pb, 2 * tkh), lambda i, j: (0, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((tn, tkh), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (pb, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((pb, n), x.dtype),
            scratch_shapes=[pltpu.VMEM((pb, tn), jnp.float32)],
            interpret=(jax.default_backend() == "cpu"),
            **params,
        )(x2, q, scale.reshape(1, n).astype(jnp.float32))
        return out[:b]

    def call_vlo(x, q, scale, *, row_pad=8, dimsem=False):
        b, kdim = x.shape
        n, kh = q.shape
        tn, tkh = qk._tiles(n, kh)
        pb = -(-b // row_pad) * row_pad
        if pb != b:
            x = jnp.pad(x, ((0, pb - b), (0, 0)))
        xl, xh = x[:, :kh], x[:, kh:]
        xs = xh / 16
        xd = xl - xs
        sumx = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
        grid = (n // tn, kh // tkh)
        params = {}
        if dimsem:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            )
        s_row = scale.reshape(1, n).astype(jnp.float32)
        out = pl.pallas_call(
            _body_vlo,
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
            **params,
        )(xs, xd, q, s_row)
        # the -8 zero-point fold, outside the kernel (XLA fuses it)
        out = (out - 8.0 * sumx * s_row).astype(x.dtype)
        return out[:b]

    if name == "vlo":
        return partial(call_vlo, row_pad=8, dimsem=False)
    if name == "vlo_dimsem":
        return partial(call_vlo, row_pad=8, dimsem=True)
    if name == "base":
        return lambda x, q, s: qk.int4_matmul(x, q, s)
    if name == "base_copy":  # sanity: the local copy must match base perf
        return partial(call_2halves, row_pad=8, dimsem=False)
    if name == "dimsem":
        return partial(call_2halves, row_pad=8, dimsem=True)
    if name == "pb16":
        return partial(call_2halves, row_pad=16, dimsem=False)
    if name == "fused1dot":
        return partial(call_fused, row_pad=8, dimsem=False)
    if name == "fused1dot_dimsem":
        return partial(call_fused, row_pad=8, dimsem=True)
    raise SystemExit(f"unknown variant {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="qkv,mlp_up")
    ap.add_argument(
        "--variants",
        default="base,base_copy,dimsem,pb16,fused1dot,fused1dot_dimsem",
    )
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scan-k", type=int, default=256)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/shardmerge_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    for shape in args.shapes.split(","):
        n, k = SHAPES[shape]
        kh = k // 2
        key = jax.random.PRNGKey(0)
        q = jax.jit(
            lambda: jax.random.randint(
                key, (n, kh), 0, 255, jnp.int32
            ).astype(jnp.uint8)
        )()
        scale = jax.jit(lambda: jnp.full((n, 1), 0.01, jnp.float32))()
        x = jax.jit(lambda: jax.random.normal(key, (1, k), jnp.bfloat16))()
        print(f"shape {shape} N={n} K={k}", flush=True)

        ref = None
        for name in args.variants.split(","):
            fn = make_variant(name)
            sk = args.scan_k

            @jax.jit
            def run_k(x, q, scale, fn=fn):
                def body(c, _):
                    y = fn(c, q, scale)
                    bump = (jnp.sum(y[:1, :1]) * 0).astype(c.dtype)
                    return c + bump, None

                o, _ = jax.lax.scan(body, x, None, length=sk)
                return jnp.sum(o)

            @jax.jit
            def run_1(x, q, scale, fn=fn):
                return jnp.sum(fn(x, q, scale))

            try:
                import numpy as np

                y = np.asarray(jax.jit(fn)(x, q, scale), np.float64)
                if ref is None:
                    ref = y
                rel = float(
                    np.linalg.norm(y - ref) / (np.linalg.norm(ref) + 1e-30)
                )
                float(run_k(x, q, scale))
                float(run_1(x, q, scale))

                def best(f):
                    ts = []
                    for _ in range(args.reps):
                        t0 = time.perf_counter()
                        float(f(x, q, scale))
                        ts.append(time.perf_counter() - t0)
                    return min(ts)

                ms = (best(run_k) - best(run_1)) / (sk - 1) * 1e3
                gbps = (n * kh) / ms / 1e6
                print(
                    f"  {name}: {ms:.4f} ms  {gbps:.0f} GB/s  relL2 {rel:.1e}",
                    flush=True,
                )
            except Exception as e:
                msg = f"{type(e).__name__}: {e}"[:160].replace("\n", " ")
                print(f"  {name}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
