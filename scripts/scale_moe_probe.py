#!/usr/bin/env python
"""Mixtral-8x7B-shaped synthetic rehearsal: MoE naming, expert counts, and
an irregular base shard layout at multi-GB shard sizes.

VERDICT r2 #2 / SURVEY.md:422-424: Mixtral's shard layout is irregular —
shard boundaries cut through a layer's expert list, so the writer's
mirror-the-base-index behavior (io/writer.py) and the weight ordering
(io/index.py ordered_weights) must cope with expert-suffixed tensor names
spread across multi-GB shards. This probe builds base + 2 finetunes with
REAL Mixtral tensor names and expert shapes for ``--layers`` decoder layers
(default 2: ~5.8 GiB per model, 8 experts x 3 matrices each), merges with
the production CLI, gates with verify-safetensors, and oracle-spot-checks
one expert tensor and one shared (attention) tensor.

Reference scale point: BASELINE.md config 4 (zefiro-mixtral, 8x7b).

Usage: python scripts/scale_moe_probe.py --out-dir /tmp/scalemoe
           [--layers 2] [--skip-oracle] [--keep]
Run ALONE (one-core host; see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from scale_rehearsal import (  # noqa: E402  (sibling script)
    cleanup_inputs,
    oracle_agreement,
    per_tensor_ms,
    run_merge_cli,
    synth_trio,
    verify_gate,
    write_std_config,
)

# Mixtral-8x7B geometry (config.json of mistralai/Mixtral-8x7B-v0.1)
HIDDEN, FFN, VOCAB = 4096, 14336, 32000
N_EXPERTS = 8
KV = 8 * 128  # 32 heads, 8 kv heads, head_dim 128


def mixtral_shapes(layers: int) -> dict:
    shapes = {"model.embed_tokens.weight": (VOCAB, HIDDEN)}
    for li in range(layers):
        pre = f"model.layers.{li}."
        shapes[pre + "self_attn.q_proj.weight"] = (HIDDEN, HIDDEN)
        shapes[pre + "self_attn.k_proj.weight"] = (KV, HIDDEN)
        shapes[pre + "self_attn.v_proj.weight"] = (KV, HIDDEN)
        shapes[pre + "self_attn.o_proj.weight"] = (HIDDEN, HIDDEN)
        shapes[pre + "block_sparse_moe.gate.weight"] = (N_EXPERTS, HIDDEN)
        for e in range(N_EXPERTS):
            epre = pre + f"block_sparse_moe.experts.{e}."
            shapes[epre + "w1.weight"] = (FFN, HIDDEN)  # gate-proj analogue
            shapes[epre + "w2.weight"] = (HIDDEN, FFN)  # down-proj analogue
            shapes[epre + "w3.weight"] = (FFN, HIDDEN)  # up-proj analogue
        shapes[pre + "input_layernorm.weight"] = (HIDDEN,)
        shapes[pre + "post_attention_layernorm.weight"] = (HIDDEN,)
    shapes["model.norm.weight"] = (HIDDEN,)
    shapes["lm_head.weight"] = (VOCAB, HIDDEN)
    return shapes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", type=Path, default=Path("/tmp/scalemoe"))
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    out = args.out_dir
    out.mkdir(parents=True, exist_ok=True)
    shapes = mixtral_shapes(args.layers)
    report = {
        "geometry": f"mixtral-8x7b ({args.layers} layers, {N_EXPERTS} experts)",
        "n_tensors": len(shapes),
    }

    t0 = time.time()
    # ~1.9 GiB shard cuts land mid-expert-list: the irregular layout this
    # probe exists to exercise
    sizes = synth_trio(out, shapes=shapes, shard_bytes=(15 << 27))
    report["synthesis_s"] = round(time.time() - t0, 1)
    report["input_bytes"] = sum(sizes.values())

    # record the irregularity actually achieved: experts per shard file
    base_map = json.load(
        open(out / "base" / "model.safetensors.index.json")
    )["weight_map"]
    by_shard: dict = {}
    for k, v in base_map.items():
        by_shard.setdefault(v, []).append(k)
    report["base_shards"] = {
        s: len(names) for s, names in sorted(by_shard.items())
    }
    split_experts = sum(
        1
        for s, names in by_shard.items()
        if any("experts" in n for n in names)
        and not all("experts" in n for n in names)
    )
    report["shards_mixing_expert_and_shared"] = split_experts

    cfg = write_std_config(out)
    merge_wall, log, rc = run_merge_cli(cfg, out / "merge.log")
    if rc != 0:
        report["merge_failed"] = True
        json.dump(report, open(out / "report.json", "w"), indent=2)
        sys.exit(1)
    report["merge_wall_s"] = round(merge_wall, 1)

    per_tensor = per_tensor_ms(log, collapse=(
        (r"layers\.\d+\.", "layers.N."),
        (r"experts\.\d+\.", "experts.E."),
    ))
    report["per_tensor_ms_median"] = {
        k: round(float(np.median(v)), 1)
        for k, v in sorted(per_tensor.items())
    }

    report["verify_ok"] = verify_gate(out / "merged")
    print("verify:", report["verify_ok"], flush=True)

    # the output index must MIRROR the base index (irregular cuts included)
    out_map = json.load(
        open(out / "merged" / "model.safetensors.index.json")
    )["weight_map"]
    report["index_mirrors_base"] = out_map == base_map
    print("index mirrors base:", report["index_mirrors_base"], flush=True)

    if not args.skip_oracle:
        # one expert tensor + one shared tensor (k_proj-sized, tractable
        # for the torch oracle on this one-core host)
        for label, name in [
            ("expert_w2", "model.layers.0.block_sparse_moe.experts.3.w2.weight"),
            ("shared_k_proj", "model.layers.0.self_attn.k_proj.weight"),
        ]:
            agree = oracle_agreement(out, name)
            report[f"oracle_agreement_{label}"] = round(agree, 4)
            print(f"oracle agreement ({label}):", agree, flush=True)

    report["total_wall_s"] = round(time.time() - t0, 1)
    json.dump(report, open(out / "report.json", "w"), indent=2)
    print(json.dumps(report, indent=2))

    cleanup_inputs(out, args.keep)


if __name__ == "__main__":
    main()
