#!/usr/bin/env python
"""Microbenchmark flash_decode (Pallas) vs the XLA einsum decode attention.

The end-to-end context probe showed the flash-decode kernel giving the
SAME ~120 GB/s effective K/V bandwidth as the XLA path at 8B geometry
(docs/DECODE_CONTEXT.json) — this isolates the attention op to tell
whether the kernel itself is slow or something upstream eats the win.

Method: K chained attention calls inside one jit (each iteration's q is
perturbed by the previous output so XLA cannot CSE them), slope vs a
single-call jit, bytes = 2*KVH*S*D*2 (bf16 K+V read once per call).

Usage: python scripts/flash_decode_microbench.py [--s 8192] [--iters 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--kvh", type=int, default=8)
    ap.add_argument("--g", type=int, default=4)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--s", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from shardmerge_tpu.models.attn_kernels import flash_decode, supported

    b, kvh, g, d, s = args.b, args.kvh, args.g, args.d, args.s
    assert supported((b, kvh, g, d), s)
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, kvh, g, d), jnp.float32)
    k_cache = jax.random.normal(kk, (b, kvh, s, d), jnp.bfloat16)
    v_cache = jax.random.normal(kv_, (b, kvh, s, d), jnp.bfloat16)
    mask = jnp.zeros((b, s), jnp.float32)

    def xla_attn(q, k_cache, v_cache, mask):
        scores = jnp.einsum(
            "bkgd,bksd->bkgs", q, k_cache.astype(jnp.float32)
        )
        scores = scores + mask[:, None, None, :]
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum(
            "bkgs,bksd->bkgd", probs, v_cache.astype(jnp.float32)
        )

    def pallas_attn(q, k_cache, v_cache, mask):
        return flash_decode(q, k_cache, v_cache, mask)

    bytes_per_call = 2 * kvh * s * d * 2 * b

    def chained(fn):
        def run(q, k_cache, v_cache, mask):
            def body(qc, _):
                out = fn(qc, k_cache, v_cache, mask)
                # feed the output back so calls serialize, scaled tiny so
                # q stays finite over 64 rounds
                return qc + out * 1e-6, jnp.sum(out)
            qf, outs = jax.lax.scan(body, q, None, length=args.iters)
            return jnp.sum(outs) + jnp.sum(qf)
        return jax.jit(run)

    def single(fn):
        def run(q, k_cache, v_cache, mask):
            return jnp.sum(fn(q, k_cache, v_cache, mask))
        return jax.jit(run)

    report = {"shape": dict(B=b, KVH=kvh, G=g, D=d, S=s),
              "bytes_per_call": bytes_per_call,
              "device": str(jax.devices()[0])}
    for name, fn in (("xla", xla_attn), ("pallas", pallas_attn)):
        cj, sj = chained(fn), single(fn)

        def t(f):
            t0 = time.perf_counter()
            r = f(q, k_cache, v_cache, mask)
            float(r)
            return time.perf_counter() - t0

        c0 = time.perf_counter()
        t(cj)
        compile_s = time.perf_counter() - c0
        t(sj)
        t_k = min(t(cj) for _ in range(3))
        t_1 = min(t(sj) for _ in range(3))
        per_call_ms = max(t_k - t_1, 1e-9) / (args.iters - 1) * 1e3
        gbps = bytes_per_call / (per_call_ms * 1e-3) / 1e9
        report[name] = {
            "per_call_ms": round(per_call_ms, 4),
            "eff_GBps": round(gbps, 1),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps({name: report[name]}), flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
