#!/usr/bin/env python
"""Batched decode throughput: tokens/s/chip as the slot pool widens.

SERVE_BENCH pins the B=1 decode floor (latency); production serving runs
the continuous pool (batching.py) at B slots, where each fused step reads
the weights ONCE for all B rows — per-token weight traffic falls 1/B and
throughput should scale near-linearly until the MXU or the KV-cache reads
take over. This probe measures the device-floor ms per fused step at
growing B on the 8B shape and prices the scaling:

    tokens_per_s(B) = B / floor_ms(B) * 1e3
    weight_amortization = floor_ms(1) / floor_ms(B)   (ideal: ~1 as long
    as weights dominate; the departure marks the compute/cache knee)

The int4 fused GEMV accepts up to 64 token rows (quant_kernels._MAX_ROWS);
B beyond that routes to the XLA decomposition — the probe records the
route so the artifact shows where each regime begins.

Usage: python scripts/batch_decode_probe.py [--batches 1,4,8,16,32]
       [--quant-bits 4] [--cache-len 1024] [--out docs/BATCH_DECODE.json]
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
HBM_ROOF_GBPS = 819.0


def floor_at_batch(engine, batch: int, cache_len: int, scan_k: int = SCAN_K):
    """ms per fused decode step of `batch` rows: scan_k chained steps in
    ONE dispatch, slope vs the compiled single step."""
    import jax
    import jax.numpy as jnp

    from shardmerge_tpu.models.llama import forward, rope_tables

    cfg = engine.cfg
    rope = rope_tables(cfg, cache_len)
    pos0 = jnp.int32(cache_len // 2)

    def step_once(params, kv, toks, pos):
        logits, kv = forward(
            params,
            cfg,
            input_ids=toks[:, None],
            positions=jnp.full((batch, 1), pos, jnp.int32),
            kv_cache=kv,
            cache_pos=pos,
            rope=rope,
            attn_len=pos + 1,
        )
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), kv

    def chained(params, kv, toks0, pos0):
        def body(carry, _):
            kv, toks, pos = carry
            nxt, kv = step_once(params, kv, toks, pos)
            return (kv, nxt, pos + 1), jnp.sum(nxt)

        (_, _, _), sums = jax.lax.scan(
            body, (kv, toks0, pos0), None, length=scan_k
        )
        return jnp.sum(sums)

    def single(params, kv, toks0, pos0):
        nxt, _ = step_once(params, kv, toks0, pos0)
        return jnp.sum(nxt)

    chained_j = jax.jit(chained)
    single_j = jax.jit(single)
    kv = engine._init_kv(batch, cache_len)
    toks0 = jnp.full((batch,), 2, jnp.int32)

    def run(fn):
        t0 = time.perf_counter()
        out = fn(engine.params, kv, toks0, pos0)
        jax.block_until_ready(out)
        int(out)  # scalar fetch forces the relay round-trip
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
    ap.add_argument("--batches", default="1,4,8,16,32")
    ap.add_argument("--cache-len", type=int, default=1024)
    ap.add_argument("--quant-bits", type=int, default=4)
    ap.add_argument(
        "--out", type=Path, default=REPO / "docs" / "BATCH_DECODE.json"
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="logic-validation run on the CPU backend (numbers meaningless)",
    )
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
    from shardmerge_tpu.models import quant_kernels

    batches = [int(b) for b in args.batches.split(",")]
    cfg_dict = dict(serve_bench.TINY if args.cpu else serve_bench.EIGHT_B)

    engine, init_s = serve_bench.build_engine(
        cfg_dict, seed=0, quant_bits=args.quant_bits
    )
    report = {
        "device": str(jax.devices()[0]),
        "method": f"scan slope K={SCAN_K}, fused step of B rows, "
        f"cache_len={args.cache_len}",
        "dtype": f"int{args.quant_bits}" if args.quant_bits else "bf16",
        "init_s": round(init_s, 2),
        "param_bytes": serve_bench.param_bytes(engine.params),
        "batches": {},
    }
    if args.cpu:
        report["platform"] = "CPU BACKEND (wall numbers are NOT chip numbers)"

    # Merge with a prior run's report (the relay dies mid-session; partial
    # artifacts must accumulate, not reset) — only when the measurement
    # setup matches, so rows stay comparable.
    if args.out.exists():
        try:
            prior = json.loads(args.out.read_text())
        except json.JSONDecodeError:
            prior = {}
        if not isinstance(prior, dict):
            prior = {}
        if (
            prior.get("dtype") == report["dtype"]
            and prior.get("method") == report["method"]
            and prior.get("param_bytes") == report["param_bytes"]
            and prior.get("device") == report["device"]
            and ("platform" in prior) == ("platform" in report)
        ):
            report["batches"].update(prior.get("batches", {}))

    base_ms = None
    if "1" in report["batches"]:
        base_ms = report["batches"]["1"]["floor_ms_per_step"]
    for b in batches:
        ms, compile_s = floor_at_batch(engine, b, args.cache_len)
        route = (
            "pallas_gemv"
            if args.quant_bits == 4 and b <= quant_kernels._MAX_ROWS
            else "xla"
        )
        row = {
            "floor_ms_per_step": round(ms, 3),
            "tokens_per_s": round(b / ms * 1e3, 1) if ms > 0 else None,
            "int4_route": route,
            "compile_s": compile_s,
        }
        # vs_b1 ratios only against a REAL B=1 floor — a fallback to the
        # first measured batch would mislabel the base
        if base_ms is None and b == 1:
            base_ms = ms
        elif base_ms is not None and base_ms > 0 and ms > 0 and b != 1:
            row["step_cost_vs_b1"] = round(ms / base_ms, 3)
            row["throughput_scaling"] = round((b * base_ms) / ms, 2)
        report["batches"][str(b)] = row
        print(json.dumps({str(b): row}), flush=True)
        args.out.write_text(json.dumps(report, indent=1))

    args.out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
