#!/usr/bin/env python
"""Chip A/B: does pool decode throughput hold WHILE admissions stream in?

Round-4 verdict: `_admit_pending` ran each arrival's FULL off-pool
prefill between decode steps — a 1-2k-token prompt froze all B active
streams for its entire prefill, and concurrent arrivals serialized.
Round 5 chunked the admission (batching.py: at most one
``prefill_chunk``-token slice between pool dispatches). This probe
measures what production sees:

- baseline: pool of B EOS-less streams decoding with NO arrivals —
  steady-state tokens/s.
- churn: same pool, but long-prompt requests are submitted continuously
  (a new one whenever fewer than ``--queue-depth`` are waiting), so the
  pool is ALWAYS admitting. Reports tokens/s of the ORIGINAL streams,
  the worst single inter-token stall, and the admission-slice stall
  percentiles.

The contract under test: churn throughput stays within ~1 slice-cost of
baseline (per-step stall <= one prefill chunk), instead of collapsing by
full-prefill stalls.

Usage: python scripts/pool_admission_probe.py [--cpu] [--slots 8]
       [--prompt-tokens 1024] [--prefill-chunk 512] [--decode-tokens 256]
       [--out docs/POOL_ADMISSION.json]
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


class _NoEos:
    """Tokenizer wrapper that never emits EOS (rows run full budgets)."""

    def __init__(self, inner):
        self._inner = inner
        self.eos_token_id = None
        self.chat_template = None

    def encode(self, text):
        return self._inner.encode(text)

    def decode(self, ids, skip_special_tokens=True):
        return self._inner.decode(ids, skip_special_tokens)


def run_phase(pool, prompts, budget, churn_prompt=None, queue_depth=2,
              unchunked=False):
    """Drive the pool until the seed prompts finish; optionally keep the
    admission pipeline saturated with churn requests.

    Reports the SEED streams' throughput, the pure decode-step wall, and
    the INTER-TOKEN GAP (admission work + step — the latency an active
    stream's user actually sees between tokens; the number chunked
    admission is supposed to bound). ``unchunked=True`` emulates the
    round-4 behavior: each arrival's whole prefill runs to completion
    between two decode steps (the pool believes itself idle during
    _admit_pending, so the bounded-slice return never fires)."""
    handles = [pool.submit(p, max_new_tokens=budget) for p in prompts]
    churn_handles = []
    step_walls = []
    gaps = []
    t0 = time.monotonic()
    while not all(h.done() for h in handles):
        if churn_prompt is not None:
            with pool._lock:
                waiting = len(pool._queue)
            admitting = pool._admitting is not None
            if waiting + (1 if admitting else 0) < queue_depth:
                churn_handles.append(
                    pool.submit(churn_prompt, max_new_tokens=4)
                )
        g0 = time.monotonic()
        if unchunked:
            real_active = pool._active
            pool._active = lambda: False  # round-4 emulation: full drain
            try:
                pool._admit_pending()
            finally:
                pool._active = real_active
        else:
            pool._admit_pending()
        if pool._active():
            s0 = time.monotonic()
            pool._step()
            now = time.monotonic()
            step_walls.append(now - s0)
            gaps.append(now - g0)
    wall = time.monotonic() - t0
    seed_tokens = sum(len(h.token_ids) for h in handles)
    pool.run_until_idle()

    def pct(vals):
        if not vals:
            return None
        v = sorted(vals)
        n = len(v)
        return {
            "p50": round(v[n // 2] * 1e3, 2),
            "p99": round(v[min(n - 1, int(n * 0.99))] * 1e3, 2),
            "max": round(v[-1] * 1e3, 2),
        }

    return {
        "seed_tokens": seed_tokens,
        "wall_s": round(wall, 3),
        "tokens_per_s": round(seed_tokens / wall, 1),
        "steps": len(step_walls),
        "decode_step_ms": pct(step_walls),
        "inter_token_gap_ms": pct(gaps),
        "decode_wall_s": round(sum(step_walls), 3),
        "admission_wall_s": round(sum(gaps) - sum(step_walls), 3),
        "churn_requests_finished": sum(h.done() for h in churn_handles),
        "churn_requests_submitted": len(churn_handles),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--cache-len", type=int, default=2048)
    ap.add_argument("--prompt-tokens", type=int, default=1024)
    ap.add_argument("--prefill-chunk", type=int, default=512)
    ap.add_argument("--decode-tokens", type=int, default=256)
    ap.add_argument("--queue-depth", type=int, default=2)
    ap.add_argument("--quant-bits", type=int, default=4)
    ap.add_argument(
        "--out", type=Path, default=REPO / "docs" / "POOL_ADMISSION.json"
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

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/shardmerge_xla_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import serve_bench
    from shardmerge_tpu.batching import ContinuousEngine

    cfg_dict = dict(serve_bench.TINY if args.cpu else serve_bench.EIGHT_B)
    engine, init_s = serve_bench.build_engine(
        cfg_dict, seed=0, quant_bits=args.quant_bits or None
    )
    engine.tokenizer = _NoEos(engine.tokenizer)

    pool = ContinuousEngine(
        engine,
        slots=args.slots,
        cache_len=args.cache_len,
        greedy=True,
        use_template=False,
        prefill_chunk=args.prefill_chunk,
    )
    # seed B-2 steady streams, leaving two slots for churn requests to
    # rotate through — otherwise admissions stall on slot-wait instead of
    # exercising the chunked prefill continuously
    n_seed = max(1, args.slots - 2)
    seed_prompts = [f"steady stream {i} " * 3 for i in range(n_seed)]
    # BenchTokenizer is one token per CHARACTER — size the string exactly
    churn = "c" * args.prompt_tokens  # long arriving prompt

    # warm every shape (prefill buckets for both prompt lengths, the
    # fused step, implant) so phase walls measure steady state
    warm = pool.submit(churn, max_new_tokens=4)
    pool.submit(seed_prompts[0], max_new_tokens=4)
    pool.run_until_idle()
    assert warm.done()
    for k in pool.stats:
        pool.stats[k] = 0

    baseline = run_phase(pool, seed_prompts, args.decode_tokens)
    base_stats = dict(pool.stats)
    for k in pool.stats:
        pool.stats[k] = 0
    pool._admission_ms.clear()

    churned = run_phase(
        pool,
        seed_prompts,
        args.decode_tokens,
        churn_prompt=churn,
        queue_depth=args.queue_depth,
    )
    churn_stats = dict(pool.stats)
    churn_latency = pool.metrics().get("admission_chunk_ms")
    for k in pool.stats:
        pool.stats[k] = 0
    pool._admission_ms.clear()

    # round-4 emulation: every arrival's WHOLE prefill between two steps
    unchunked = run_phase(
        pool,
        seed_prompts,
        args.decode_tokens,
        churn_prompt=churn,
        queue_depth=args.queue_depth,
        unchunked=True,
    )

    report = {
        "device": str(jax.devices()[0]),
        "config": {
            "slots": args.slots,
            "cache_len": args.cache_len,
            "prompt_tokens_arriving": args.prompt_tokens,
            "prefill_chunk": args.prefill_chunk,
            "decode_tokens_per_seed": args.decode_tokens,
            "dtype": f"int{args.quant_bits}" if args.quant_bits else "bf16",
            "init_s": round(init_s, 1),
        },
        "baseline_no_arrivals": {**baseline, "pool_stats": base_stats},
        "under_continuous_admissions": {
            **churned,
            "pool_stats": churn_stats,
            "admission_latency": churn_latency,
        },
        "round4_unchunked_emulation": unchunked,
        # the contract: an active stream's worst inter-token gap under
        # churn stays ~(one decode step + one prefill slice); unchunked it
        # grows with the ARRIVING PROMPT LENGTH (whole prefill + implant)
        "worst_gap_ms": {
            "baseline": baseline["inter_token_gap_ms"]["max"],
            "chunked_churn": churned["inter_token_gap_ms"]["max"],
            "unchunked_churn": unchunked["inter_token_gap_ms"]["max"],
        },
    }
    if args.cpu:
        report["platform"] = "CPU BACKEND (wall numbers are NOT chip numbers)"
    args.out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
