#!/usr/bin/env python
"""Decode-GEMV dequant-matmul shootout on the chip.

serve_bench (round 4) measured the int4 decode device floor at 0.21
ms/token on the tiny config — 3x SLOWER than bf16 (0.066) while int8 hit
0.033, i.e. the packed-uint8 nibble unpack (stack + interleave reshape in
models/quant.py `_unpack4`) defeats XLA's fusion and the "half the bytes"
promise of int4 arrives as a 6x regression. This probe measures the
candidate representations at real decode shapes so the fix is chosen by
data:

- **bf16**: plain dot, the baseline (2 bytes/elem HBM traffic).
- **int8**: per-channel scale, dequant fused into the dot (1 byte/elem).
- **int4-packed-u8**: the current two-nibbles-per-uint8 interleaved
  layout (0.5 bytes/elem stored; measured to materialize on unpack).
- **int4-native-s4**: jnp.int4 storage — XLA's own s4 type, packed in
  HBM by the compiler, converted in-fusion.
- **int4-splithalf**: two nibbles per uint8 but holding columns j and
  j+K/2 (not 2j/2j+1), so unpack is two ELEMENTWISE extractions and the
  GEMV decomposes into x_lo @ lo(P).T + x_hi @ hi(P).T — no interleave
  reshape anywhere; P is read twice (int8-equivalent traffic) but never
  materialized unpacked.

Method: slope timing (CLAUDE.md relay rules) — K chained GEMVs inside one
jit, serialized by folding a scalar of y back into x; ms/op =
(t_K - t_1) / (K - 1), each endpoint the MIN of --reps runs (the bench.py
min-of-N rule: relay latency swings by milliseconds between dispatches,
which at K=32 produced negative slopes on the sub-0.1 ms shapes in the
first chip run). K defaults to 256 so the slope work dwarfs the jitter.
Weights init on device (the ~85 MB/s relay must not enter the
measurement).

Usage: python scripts/quant_matmul_probe.py [--out docs/QUANT_MATMUL.json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SCAN_K = 256
REPS = 5

# (name, N out, K in): Llama-3.1-8B decode GEMV shapes.
SHAPES = [
    ("qkv_4096x4096", 4096, 4096),
    ("mlp_up_14336x4096", 14336, 4096),
    ("mlp_down_4096x14336", 4096, 14336),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=REPO / "docs" / "QUANT_MATMUL.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scan-k", type=int, default=SCAN_K)
    ap.add_argument("--reps", type=int, default=REPS)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import _probe_device

        _probe_device()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/shardmerge_xla_cache")

    def timed(make_step, init_weights, k):
        """Compile y=step(x, w) chained k times and once; slope ms/op."""

        def chained(x, w, n):
            def body(carry, _):
                y = make_step(carry, w)
                # serialize: fold a scalar of y back into x (cheap vs GEMV)
                carry = carry * (1.0 + 1e-12 * jnp.sum(y).astype(carry.dtype))
                return carry, ()

            out, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(out)

        run_k = jax.jit(lambda x, w: chained(x, w, k))
        run_1 = jax.jit(lambda x, w: chained(x, w, 1))
        w = init_weights()
        x = jax.jit(lambda: jnp.ones((1, w_in[0]), jnp.bfloat16))()
        float(run_k(x, w))  # compile + warm
        float(run_1(x, w))

        def best(fn):
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(fn(x, w))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best(run_k) - best(run_1)) / (k - 1) * 1e3

    report = {
        "device": str(jax.devices()[0]),
        "method": f"scan slope K={args.scan_k}; GEMV x(1,K) @ W(N,K).T",
    }
    w_in = [0]  # closed over by timed() for x's shape

    for name, n_out, k_in in SHAPES:
        w_in[0] = k_in
        key = jax.random.PRNGKey(0)
        row = {}

        # --- bf16 baseline
        def init_bf16():
            return jax.jit(
                lambda: jax.random.normal(key, (n_out, k_in), jnp.bfloat16)
            )()

        def dot_bf16(x, w):
            return jax.lax.dot_general(
                x, w, ((((1,), (1,))), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )

        row["bf16"] = {"ms": timed(dot_bf16, init_bf16, args.scan_k),
                       "bytes": n_out * k_in * 2}

        # --- int8 per-channel
        def init_int8():
            def f():
                w = jax.random.normal(key, (n_out, k_in), jnp.float32)
                scale = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
                q = jnp.round(w / scale).astype(jnp.int8)
                return {"q": q, "scale": scale}

            return jax.jit(f)()

        def dot_int8(x, wq):
            w = (wq["q"].astype(jnp.float32) * wq["scale"]).astype(x.dtype)
            return jax.lax.dot_general(
                x, w, ((((1,), (1,))), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )

        row["int8"] = {"ms": timed(dot_int8, init_int8, args.scan_k),
                       "bytes": n_out * k_in}

        # --- int4 packed uint8, interleaved (CURRENT models/quant.py)
        def init_p4():
            def f():
                w = jax.random.normal(key, (n_out, k_in), jnp.float32)
                scale = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 7.0
                q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int8)
                u = (q + 8).astype(jnp.uint8)
                packed = (u[:, 0::2] | (u[:, 1::2] << 4)).astype(jnp.uint8)
                return {"q": packed, "scale": scale}

            return jax.jit(f)()

        def dot_p4(x, wq):
            p = wq["q"]
            lo = (p & 0xF).astype(jnp.int8) - 8
            hi = (p >> 4).astype(jnp.int8) - 8
            q = jnp.stack([lo, hi], axis=-1).reshape(p.shape[0], p.shape[1] * 2)
            w = (q.astype(jnp.float32) * wq["scale"]).astype(x.dtype)
            return jax.lax.dot_general(
                x, w, ((((1,), (1,))), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )

        row["int4_packed_u8"] = {"ms": timed(dot_p4, init_p4, args.scan_k),
                                 "bytes": n_out * k_in // 2}

        # --- int4 native s4 storage
        def init_s4():
            def f():
                w = jax.random.normal(key, (n_out, k_in), jnp.float32)
                scale = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 7.0
                q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int4)
                return {"q": q, "scale": scale}

            return jax.jit(f)()

        def dot_s4(x, wq):
            w = (wq["q"].astype(jnp.float32) * wq["scale"]).astype(x.dtype)
            return jax.lax.dot_general(
                x, w, ((((1,), (1,))), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )

        try:
            row["int4_native_s4"] = {
                "ms": timed(dot_s4, init_s4, args.scan_k),
                "bytes": n_out * k_in // 2,
            }
        except Exception as e:  # s4 unsupported on some backends
            row["int4_native_s4"] = {"error": f"{type(e).__name__}: {e}"[:300]}

        # --- int4 split-half packing: nibbles hold cols j and j+K/2
        def init_sh():
            def f():
                w = jax.random.normal(key, (n_out, k_in), jnp.float32)
                scale = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 7.0
                q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int8)
                u = (q + 8).astype(jnp.uint8)
                h = k_in // 2
                packed = (u[:, :h] | (u[:, h:] << 4)).astype(jnp.uint8)
                return {"q": packed, "scale": scale}

            return jax.jit(f)()

        def dot_sh(x, wq):
            p = wq["q"]
            h = p.shape[1]
            lo = ((p & 0xF).astype(jnp.int8) - 8).astype(jnp.float32)
            hi = ((p >> 4).astype(jnp.int8) - 8).astype(jnp.float32)
            s = wq["scale"]
            wl = (lo * s).astype(x.dtype)
            wh = (hi * s).astype(x.dtype)
            yl = jax.lax.dot_general(
                x[:, :h], wl, ((((1,), (1,))), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            yh = jax.lax.dot_general(
                x[:, h:], wh, ((((1,), (1,))), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            return yl + yh

        row["int4_splithalf"] = {"ms": timed(dot_sh, init_sh, args.scan_k),
                                 "bytes": n_out * k_in // 2}

        # --- int4 fused Pallas kernel (models/quant_kernels.py):
        # VMEM nibble unpack, one HBM visit per packed byte, f32 acc
        from shardmerge_tpu.models.quant_kernels import int4_matmul

        def dot_pallas(x, wq):
            return int4_matmul(x, wq["q"], wq["scale"])

        if args.cpu:
            # interpret-mode pallas at these shapes runs for hours; the
            # kernel's CPU correctness lives in tests/test_models.py
            row["int4_pallas"] = {"skipped": "cpu run"}
        else:
            try:
                row["int4_pallas"] = {
                    "ms": timed(dot_pallas, init_sh, args.scan_k),
                    "bytes": n_out * k_in // 2,
                }
            except Exception as e:
                row["int4_pallas"] = {"error": f"{type(e).__name__}: {e}"[:300]}

        for v in row.values():
            if "ms" in v:
                v["ms"] = round(v["ms"], 4)
                v["eff_GBps"] = round(v["bytes"] / (v["ms"] * 1e-3) / 1e9, 1)
        report[name] = row
        print(json.dumps({name: row}), file=sys.stderr, flush=True)
        args.out.write_text(json.dumps(report, indent=1))

    args.out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
