"""Bisect the int4 Pallas kernel's remote-compile failure at real shapes.

The probe (docs/QUANT_MATMUL.json round-4) showed the fused int4 GEMV
kernel compiles at toy shapes but HTTP-500s in tpu_compile_helper at the
Llama-8B decode shapes. This walks tile configs at the qkv shape
(N=4096, K=4096 -> packed KH=2048) and prints compile ok/fail + ms per
config, flushing per line so a killed run still yields data.

Usage: python scripts/int4_kernel_bisect.py [--shape qkv|down]
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


def kernel(xl_ref, xh_ref, q_ref, scale_ref, out_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qb = q_ref[:]
    lo = (qb & 0xF).astype(jnp.int8).astype(xl_ref.dtype)
    # int32 hop: sub-word uint8>>4 crashes the remote Mosaic compile
    # (see scripts/int4_kernel_ablate.py; fixed in models/quant_kernels.py)
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


def run(n, kh, tn, tkh, pb=8):
    grid = (n // tn, kh // tkh)
    f = pl.pallas_call(
        kernel,
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
        out_shape=jax.ShapeDtypeStruct((pb, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((pb, tn), jnp.float32)],
    )
    key = jax.random.PRNGKey(0)
    xl = jax.jit(lambda: jax.random.normal(key, (pb, kh), jnp.bfloat16))()
    xh = jax.jit(lambda: xl * 0.5)()
    q = jax.jit(
        lambda: jax.random.randint(key, (n, kh), 0, 255, jnp.int32).astype(
            jnp.uint8
        )
    )()
    s = jax.jit(lambda: jnp.full((1, n), 0.01, jnp.float32))()
    t0 = time.perf_counter()
    out = f(xl, xh, q, s)
    float(jnp.sum(out))
    compile_s = time.perf_counter() - t0
    # slope: 64 chained calls folded through a scalar
    K = 64

    @jax.jit
    def chain(xl, xh, q, s):
        def body(c, _):
            y = f(c[0], xh, q, s)
            bump = (jnp.sum(y[:1, :1]) * 0).astype(xl.dtype)
            return (c[0] + bump, c[1]), None

        (o, _), _ = jax.lax.scan(body, (xl, xh), None, length=K)
        return jnp.sum(o)

    float(chain(xl, xh, q, s))
    t0 = time.perf_counter()
    float(chain(xl, xh, q, s))
    t_k = time.perf_counter() - t0

    @jax.jit
    def one(xl, xh, q, s):
        return jnp.sum(f(xl, xh, q, s))

    float(one(xl, xh, q, s))
    t0 = time.perf_counter()
    float(one(xl, xh, q, s))
    t_1 = time.perf_counter() - t0
    return compile_s, (t_k - t_1) / (K - 1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="qkv")
    args = ap.parse_args()
    n, kh = {"qkv": (4096, 2048), "down": (4096, 7168)}[args.shape]
    print(f"shape N={n} KH={kh}", flush=True)
    tried = set()
    for tn in (512, 256, 128):
        for tkh in (1024, 512, 256, 128):
            if n % tn or kh % tkh or (tn, tkh) in tried:
                continue
            tried.add((tn, tkh))
            try:
                cs, ms = run(n, kh, tn, tkh)
                print(
                    f"TN={tn} TKH={tkh}: OK compile={cs:.1f}s ms/op={ms:.4f}",
                    flush=True,
                )
                # first success at large tiles is enough signal
            except Exception as e:
                msg = f"{type(e).__name__}: {e}"[:200].replace("\n", " ")
                print(f"TN={tn} TKH={tkh}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
