#!/usr/bin/env python
"""Chip numbers for SPECULATIVE decoding inside the continuous pool.

Round 5 lifted the pool/speculation exclusivity: one fused dispatch per
round advances every row by its accepted prefix (1..k tokens). This
probe prices that round on the chip at production shape — an 8B int4
target with a 1B-shaped int4 draft — and reports:

- wall ms per pooled spec round at B slots (includes the host relay tax,
  the number a serving loop actually pays),
- measured tokens/s at the draft's real acceptance rate,
- the analytic tokens/s curve vs acceptance (tokens/round = B*(m+1)):
  the random-init draft accepts ~nothing, so the measured point is the
  WORST case and the curve shows what a trained draft buys.

A same-shape pure-decode pool run (same slots/cache) rides along as the
non-speculative baseline.

Usage: python scripts/spec_pool_probe.py [--cpu] [--slots 8]
       [--rounds 24] [--out docs/SPEC_POOL.json]
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

ONE_B = {
    "model_type": "llama",
    "vocab_size": 128256,
    "hidden_size": 2048,
    "intermediate_size": 8192,
    "num_hidden_layers": 16,
    "num_attention_heads": 32,
    "num_key_value_heads": 8,
    "max_position_embeddings": 8192,
    "rope_theta": 500000.0,
    "tie_word_embeddings": True,
}

TINY_DRAFT = {
    "model_type": "llama",
    "vocab_size": 128,
    "hidden_size": 128,
    "intermediate_size": 344,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "max_position_embeddings": 4096,
    "rope_theta": 10000.0,
    "tie_word_embeddings": True,
}


def build_pair(target_cfg, draft_cfg, quant_bits):
    """Target + DIFFERENT-architecture draft engine (serve_bench only
    builds same-config drafts)."""
    import jax
    import jax.numpy as jnp

    import serve_bench
    from shardmerge_tpu.inference import InferenceEngine
    from shardmerge_tpu.models.llama import ModelConfig, init_params
    from shardmerge_tpu.models.quant import quantize

    quantizable = {
        "q_proj", "k_proj", "v_proj", "o_proj",
        "gate_proj", "up_proj", "down_proj",
    }

    def make(cfg):
        def init(key):
            params = init_params(cfg, key, jnp.bfloat16)
            if quant_bits:
                for layer in params["layers"]:
                    for name in quantizable & set(layer):
                        layer[name] = quantize(
                            layer[name].astype(jnp.float32), bits=quant_bits
                        )
            return params

        p = jax.jit(init)(jax.random.PRNGKey(0))
        jax.block_until_ready(p)
        return p

    t0 = time.perf_counter()
    tcfg = ModelConfig.from_hf_config(target_cfg)
    dcfg = ModelConfig.from_hf_config(draft_cfg)
    t_params = make(tcfg)
    d_params = make(dcfg)
    init_s = time.perf_counter() - t0
    tok = serve_bench.BenchTokenizer(tcfg.vocab_size)
    engine = InferenceEngine(
        tcfg, t_params, tok, draft=(dcfg, d_params), speculation_k=4
    )
    plain = InferenceEngine(tcfg, t_params, tok)
    return engine, plain, init_s


def pool_round_floor(pool, prompts, budget, n_rounds):
    """Median wall ms of a pool step after warmup, plus token accounting.

    ALL rows join before timing starts (chunked admission hands out one
    slice per _admit_pending call while rows decode, so a naive
    submit-then-step loop would time a mostly-empty pool)."""
    handles = [pool.submit(p, max_new_tokens=budget) for p in prompts]
    while pool.stats["joins"] < len(handles):
        before = pool.stats["joins"]
        pool._admit_pending()
        if pool.stats["joins"] == before and pool._admitting is None:
            break  # safety: nothing left to admit
    assert pool.stats["joins"] == len(handles), pool.stats
    pool._step()  # compile + first-round warmup
    walls = []
    accepted_before = pool.stats.get("spec_accepted", 0)
    tokens_before = sum(len(h.token_ids) for h in handles)
    for _ in range(n_rounds):
        if not pool._active():
            break
        t0 = time.perf_counter()
        pool._step()
        walls.append(time.perf_counter() - t0)
    tokens = sum(len(h.token_ids) for h in handles) - tokens_before
    accepted = pool.stats.get("spec_accepted", 0) - accepted_before
    pool.run_until_idle()
    walls.sort()
    med = walls[len(walls) // 2] if walls else float("nan")
    return {
        "rounds_timed": len(walls),
        "round_ms_median": round(med * 1e3, 2),
        "round_ms_min": round(walls[0] * 1e3, 2) if walls else None,
        "tokens_emitted": int(tokens),
        "accepted_drafts": int(accepted),
        "tokens_per_s_measured": (
            round(tokens / sum(walls), 1) if walls else None
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--cache-len", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=24)
    ap.add_argument("--quant-bits", type=int, default=4)
    ap.add_argument(
        "--out", type=Path, default=REPO / "docs" / "SPEC_POOL.json"
    )
    ap.add_argument("--cpu", action="store_true")
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
    from shardmerge_tpu.batching import ContinuousEngine

    if args.cpu:
        target, draft = dict(serve_bench.TINY), dict(TINY_DRAFT)
        target["vocab_size"] = draft["vocab_size"] = 128
    else:
        target, draft = dict(serve_bench.EIGHT_B), dict(ONE_B)
    engine, plain, init_s = build_pair(
        target, draft, args.quant_bits or None
    )

    B = args.slots
    k = engine.speculation_k
    prompts = [f"pool stream {i} warming text " * 2 for i in range(B)]
    budget = max(args.rounds * k + 8, 64)

    spec_pool = ContinuousEngine(
        engine, slots=B, cache_len=args.cache_len, greedy=True,
        use_template=False,
    )
    spec = pool_round_floor(spec_pool, prompts, budget, args.rounds)

    plain_pool = ContinuousEngine(
        plain, slots=B, cache_len=args.cache_len, greedy=True,
        use_template=False,
    )
    base = pool_round_floor(plain_pool, prompts, budget, args.rounds)

    med = spec["round_ms_median"]
    curve = {
        f"acceptance_{m}": round(B * (m + 1) / med * 1e3, 1)
        for m in range(k)
    } if med == med else {}
    report = {
        "device": str(jax.devices()[0]),
        "config": {
            "slots": B,
            "cache_len": args.cache_len,
            "speculation_k": k,
            "dtype": f"int{args.quant_bits}" if args.quant_bits else "bf16",
            "target": {kk: target[kk] for kk in (
                "hidden_size", "num_hidden_layers", "vocab_size")},
            "draft": {kk: draft[kk] for kk in (
                "hidden_size", "num_hidden_layers", "vocab_size")},
            "init_s": round(init_s, 1),
        },
        "spec_pool": spec,
        "plain_pool_baseline": base,
        # the random-init draft accepts ~0: the measured point is the
        # WORST case; a trained draft moves along this curve
        "tokens_per_s_vs_acceptance_analytic": curve,
    }
    if args.cpu:
        report["platform"] = "CPU BACKEND (wall numbers are NOT chip numbers)"
    args.out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
