"""Feature-ablation bisect of the int4 Pallas kernel's chip compile failure.

scripts/int4_kernel_bisect.py showed the HTTP-500 from tpu_compile_helper
is tile-size-independent at N=4096 — so some FEATURE of the kernel (not
VMEM pressure) breaks the remote Mosaic compile. This compiles a ladder of
kernels from trivial to the full GEMV and prints ok/fail per rung,
flushing per line. Failures return in seconds once the helper is warm;
successes cost a real compile (minutes).

Usage: python scripts/int4_kernel_ablate.py [--n 4096] [--kh 2048]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PB = 8


def build(n, kh, tn, tkh, *, halves, correction, scale_in, scratch, acc_f32):
    """Assemble a rung of the ladder. Always computes something GEMV-like."""

    # explicit kernels per rung keep the Mosaic input clean
    if halves == 2 and correction and scale_in and scratch:
        def kernel(xl_ref, xh_ref, q_ref, scale_ref, out_ref, acc_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            qb = q_ref[:]
            lo = (qb & 0xF).astype(jnp.int8).astype(xl_ref.dtype)
            hi = (qb >> 4).astype(jnp.int8).astype(xl_ref.dtype)
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

        n_in = 4
    elif halves == 2 and correction and not scale_in and scratch:
        def kernel(xl_ref, xh_ref, q_ref, out_ref, acc_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            qb = q_ref[:]
            lo = (qb & 0xF).astype(jnp.int8).astype(xl_ref.dtype)
            hi = (qb >> 4).astype(jnp.int8).astype(xl_ref.dtype)
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
                out_ref[:] = acc_ref[:].astype(out_ref.dtype)

        n_in = 3
    elif halves == 2 and not correction and not scale_in and scratch:
        def kernel(xl_ref, xh_ref, q_ref, out_ref, acc_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            qb = q_ref[:]
            lo = (qb & 0xF).astype(jnp.int8).astype(xl_ref.dtype)
            hi = (qb >> 4).astype(jnp.int8).astype(xl_ref.dtype)
            dims = (((1,), (1,)), ((), ()))
            acc_ref[:] += jax.lax.dot_general(
                xl_ref[:], lo, dims, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                xh_ref[:], hi, dims, preferred_element_type=jnp.float32
            )

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                out_ref[:] = acc_ref[:].astype(out_ref.dtype)

        n_in = 3
    elif halves == 1 and not correction and not scale_in and scratch:
        def kernel(xl_ref, q_ref, out_ref, acc_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            lo = (q_ref[:] & 0xF).astype(jnp.int8).astype(xl_ref.dtype)
            dims = (((1,), (1,)), ((), ()))
            acc_ref[:] += jax.lax.dot_general(
                xl_ref[:], lo, dims, preferred_element_type=jnp.float32
            )

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                out_ref[:] = acc_ref[:].astype(out_ref.dtype)

        n_in = 2
    elif halves == 1 and not correction and not scale_in and not scratch:
        # no scratch, no multi-step reduction: grid over N only, full KH
        def kernel(xl_ref, q_ref, out_ref):
            lo = (q_ref[:] & 0xF).astype(jnp.int8).astype(xl_ref.dtype)
            dims = (((1,), (1,)), ((), ()))
            out_ref[:] = jax.lax.dot_general(
                xl_ref[:], lo, dims, preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)

        n_in = 2
    else:
        raise ValueError("unwired rung")

    multi_k = scratch
    if multi_k:
        grid = (n // tn, kh // tkh)
        x_spec = pl.BlockSpec((PB, tkh), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        q_spec = pl.BlockSpec((tn, tkh), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((PB, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        scratch_shapes = [pltpu.VMEM((PB, tn), jnp.float32)]
    else:
        grid = (n // tn,)
        x_spec = pl.BlockSpec((PB, kh), lambda i: (0, 0), memory_space=pltpu.VMEM)
        q_spec = pl.BlockSpec((tn, kh), lambda i: (i, 0), memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, tn), lambda i: (0, i), memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((PB, tn), lambda i: (0, i), memory_space=pltpu.VMEM)
        scratch_shapes = []

    in_specs = []
    if halves == 2:
        in_specs += [x_spec, x_spec]
    else:
        in_specs += [x_spec]
    in_specs += [q_spec]
    if scale_in:
        in_specs += [s_spec]

    f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((PB, n), jnp.bfloat16),
        scratch_shapes=scratch_shapes,
    )

    key = jax.random.PRNGKey(0)
    xl = jax.jit(lambda: jax.random.normal(key, (PB, kh), jnp.bfloat16))()
    q = jax.jit(
        lambda: jax.random.randint(key, (n, kh), 0, 255, jnp.int32).astype(jnp.uint8)
    )()
    args = [xl]
    if halves == 2:
        args.append(jax.jit(lambda: xl * 0.5)())
    args.append(q)
    if scale_in:
        args.append(jax.jit(lambda: jnp.full((1, n), 0.01, jnp.float32))())
    return f, args


RUNGS = [
    # name, kwargs
    ("full", dict(halves=2, correction=True, scale_in=True, scratch=True, acc_f32=True)),
    ("no_scale", dict(halves=2, correction=True, scale_in=False, scratch=True, acc_f32=True)),
    ("no_corr", dict(halves=2, correction=False, scale_in=False, scratch=True, acc_f32=True)),
    ("one_half", dict(halves=1, correction=False, scale_in=False, scratch=True, acc_f32=True)),
    ("no_scratch", dict(halves=1, correction=False, scale_in=False, scratch=False, acc_f32=True)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--kh", type=int, default=2048)
    ap.add_argument("--tn", type=int, default=256)
    ap.add_argument("--tkh", type=int, default=512)
    ap.add_argument("--rungs", default="")
    args = ap.parse_args()
    print(f"N={args.n} KH={args.kh} TN={args.tn} TKH={args.tkh}", flush=True)
    sel = set(args.rungs.split(",")) if args.rungs else None
    for name, kw in RUNGS:
        if sel and name not in sel:
            continue
        try:
            f, fargs = build(args.n, args.kh, args.tn, args.tkh, **kw)
            t0 = time.perf_counter()
            out = f(*fargs)
            float(jnp.sum(out))
            print(f"{name}: OK compile={time.perf_counter()-t0:.1f}s", flush=True)
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"[:160].replace("\n", " ")
            print(f"{name}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
