#!/usr/bin/env python
"""Decode floor vs context length: is XLA decode attention HBM-bound?

docs/SERVE_BENCH.json characterizes the 8B decode floor at a 256-slot KV
cache, where weights dominate the per-token HBM traffic. Real serving
holds thousands of cache slots, and each decode step re-reads the whole
bucket (models/llama.py _attention masks over the full static cache — the
cost model for a bucket IS its size). This probe measures the device-floor
decode slope at growing cache buckets on the 8B shape and prices the
attention increment in GB/s:

    attn_bytes(S) = 2(kv) * layers * kv_heads * head_dim * S * 2(bf16)
                  = 131072 * S   at Llama-3.1-8B geometry
    eff_GBps      = attn_bytes(S) - attn_bytes(S0)
                    -----------------------------------
                    floor_ms(S) - floor_ms(S0)

If that sits near the ~819 GB/s v5e HBM roof, XLA's cached attention is
already bandwidth-bound and a hand flash-decode kernel has no headroom;
if it sits far below, the gap is the case for one. Either way the number
closes the long-context serving row that SERVE_BENCH leaves open.

The engine is int4 (fused Pallas GEMV path) so 8B weights + an 8k-slot
cache fit one 16 GB chip; the weight-side floor is pinned by SERVE_BENCH.

Usage: python scripts/decode_context_probe.py [--buckets 256,2048,8192]
       [--out docs/DECODE_CONTEXT.json] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

SCAN_K = 64
HBM_ROOF_GBPS = 819.0  # v5e spec number used across BASELINE.md


def floor_at_bucket(engine, cache_len: int, scan_k: int = SCAN_K):
    """ms/token of scan_k chained greedy steps in ONE dispatch, slope vs
    the compiled single step, with the cache bucket nearly FULL so the
    attention term reflects cache_len, not the write frontier."""
    import jax
    import jax.numpy as jnp

    from shardmerge_tpu.models.llama import forward, rope_tables

    cfg = engine.cfg
    rope = rope_tables(cfg, cache_len)
    # leave room for scan_k appends at the bucket's end
    pos0 = jnp.int32(cache_len - scan_k - 2)

    def step_once(params, kv, tok, pos):
        logits, kv = forward(
            params,
            cfg,
            input_ids=tok[None, None],
            positions=pos[None, None],
            kv_cache=kv,
            cache_pos=pos,
            rope=rope,
            attn_len=pos + 1,
        )
        return jnp.argmax(logits[0, -1]).astype(jnp.int32), kv

    def chained(params, kv, tok0, pos0):
        def body(carry, _):
            kv, tok, pos = carry
            nxt, kv = step_once(params, kv, tok, pos)
            return (kv, nxt, pos + 1), nxt

        (_, _, _), toks = jax.lax.scan(
            body, (kv, tok0, pos0), None, length=scan_k
        )
        return toks

    def single(params, kv, tok0, pos0):
        nxt, _ = step_once(params, kv, tok0, pos0)
        return nxt

    chained_j = jax.jit(chained)
    single_j = jax.jit(single)
    kv = engine._init_kv(1, cache_len)
    tok0 = jnp.int32(2)

    def run(fn):
        t0 = time.perf_counter()
        out = fn(engine.params, kv, tok0, pos0)
        jax.block_until_ready(out)
        int(jnp.sum(out))  # scalar fetch forces the relay round-trip
        return time.perf_counter() - t0

    c0 = time.perf_counter()
    run(chained_j)
    compile_s = time.perf_counter() - c0
    run(single_j)
    t_k = min(run(chained_j) for _ in range(3))
    t_1 = min(run(single_j) for _ in range(3))
    ms = max(t_k - t_1, 0.0) / (scan_k - 1) * 1e3
    for buf in jax.tree_util.tree_leaves(kv):
        buf.delete()
    return ms, round(compile_s, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="256,2048,8192")
    ap.add_argument(
        "--out", type=Path, default=REPO / "docs" / "DECODE_CONTEXT.json"
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="logic-validation run on the CPU backend (numbers meaningless)",
    )
    ap.add_argument("--quant-bits", type=int, default=4)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import _probe_device

        _probe_device()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/shardmerge_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import serve_bench

    buckets = [int(b) for b in args.buckets.split(",")]
    cfg_dict = dict(serve_bench.EIGHT_B)
    cfg_dict["max_position_embeddings"] = max(
        cfg_dict["max_position_embeddings"], max(buckets)
    )
    if args.cpu:  # shrink to keep the interpreted path tractable
        cfg_dict.update(serve_bench.TINY)
        cfg_dict["max_position_embeddings"] = max(buckets)

    engine, init_s = serve_bench.build_engine(
        cfg_dict, seed=0, quant_bits=args.quant_bits
    )
    cfg = engine.cfg
    # bytes of K+V the attention reads per decode step at bucket S
    kv_bytes_per_slot = (
        2 * cfg.num_hidden_layers * cfg.num_key_value_heads * cfg.head_dim * 2
    )

    import os

    report = {
        "device": str(jax.devices()[0]),
        "method": f"scan slope K={SCAN_K} at pos0=S-{SCAN_K}-2 (bucket full)",
        # "" = auto (flash-decode Pallas kernel on accelerators), "0" = XLA
        # einsum attention, "1" = kernel forced (models/attn_kernels.py)
        "flash_decode_mode": os.environ.get("SHARDMERGE_FLASH_DECODE", ""),
        "config": {
            k: cfg_dict[k]
            for k in (
                "hidden_size", "num_hidden_layers", "num_attention_heads",
                "num_key_value_heads", "vocab_size",
            )
        },
        "dtype": f"int{args.quant_bits}",
        "init_s": round(init_s, 2),
        "param_bytes": serve_bench.param_bytes(engine.params),
        "kv_bytes_per_slot": kv_bytes_per_slot,
        "buckets": {},
    }
    if args.cpu:
        report["platform"] = (
            "CPU BACKEND (wall numbers are NOT chip numbers)"
        )

    prev = None
    for s in buckets:
        ms, compile_s = floor_at_bucket(engine, s)
        row = {
            "floor_ms_per_token": round(ms, 3),
            "tokens_per_s": round(1e3 / ms, 1) if ms > 0 else None,
            "kv_bytes_read_per_token": kv_bytes_per_slot * s,
            "compile_s": compile_s,
        }
        if prev is not None:
            s0, ms0 = prev
            d_ms = ms - ms0
            d_bytes = kv_bytes_per_slot * (s - s0)
            if d_ms > 0:
                eff = d_bytes / (d_ms * 1e-3) / 1e9
                row["attn_increment_vs_%d" % s0] = {
                    "delta_ms": round(d_ms, 3),
                    "delta_bytes": d_bytes,
                    "eff_GBps": round(eff, 1),
                    "pct_of_hbm_roof": round(eff / HBM_ROOF_GBPS * 100, 1),
                }
        report["buckets"][str(s)] = row
        prev = (s, ms)
        print(json.dumps({str(s): row}), flush=True)
        args.out.write_text(json.dumps(report, indent=1))

    args.out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
