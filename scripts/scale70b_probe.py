#!/usr/bin/env python
"""70B-scale probe: merge REAL Llama-3.1-70B tensor shapes on the TPU.

VERDICT r2 #1: the <10-min 70B claim rested on projections from 8B shapes;
nothing above 32M elements had ever touched the chip, and the HBM spill
path had never run at a size where it matters (SURVEY.md:420-421 names
complex64 intermediates of 70B tensors as the hard part). This probe pushes
the actual 70B shapes through the production merge CLI — one full decoder
layer (8192-hidden geometry incl. the 8192x28672 MLP pair) plus the
128256x8192 embed/lm_head — with ``hbm_budget_gb`` set so the delta stack
spills to host RAM at true scale. Reference scale point:
/root/reference/README.md:33-44 (the reference's own 70B demo config).

Writes <out-dir>/report.json: per-tensor first/steady ms, spill events,
verify gate, oracle agreement on a k_proj-sized tensor, peak RSS.

~18 GiB of synthetic bf16 inputs + ~6 GiB output. Run ALONE (one-core
host; see CLAUDE.md).

Usage: python scripts/scale70b_probe.py --out-dir /tmp/scale70b
           [--hbm-budget-gb 6] [--skip-oracle] [--keep] [--skip-embed]
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

from scale_rehearsal import (  # noqa: E402  (sibling script)
    cleanup_inputs,
    oracle_agreement,
    per_tensor_ms,
    run_merge_cli,
    synth_trio,
    verify_gate,
    write_std_config,
)

# Llama-3.1-70B geometry (config.json of meta-llama/Llama-3.1-70B):
# hidden 8192, intermediate 28672, 64 heads / 8 kv heads (head_dim 128),
# vocab 128256, 80 layers.
H, I, VOCAB = 8192, 28672, 128256
KV = 8 * 128
L70 = 80


def probe_shapes(with_embed: bool = True) -> dict:
    shapes = {}
    if with_embed:
        shapes["model.embed_tokens.weight"] = (VOCAB, H)
    shapes.update(
        {
            "model.layers.0.self_attn.q_proj.weight": (H, H),
            "model.layers.0.self_attn.k_proj.weight": (KV, H),
            "model.layers.0.self_attn.v_proj.weight": (KV, H),
            "model.layers.0.self_attn.o_proj.weight": (H, H),
            "model.layers.0.mlp.gate_proj.weight": (I, H),
            "model.layers.0.mlp.up_proj.weight": (I, H),
            "model.layers.0.mlp.down_proj.weight": (H, I),
            "model.layers.0.input_layernorm.weight": (H,),
            "model.layers.0.post_attention_layernorm.weight": (H,),
            "model.norm.weight": (H,),
        }
    )
    if with_embed:
        shapes["lm_head.weight"] = (VOCAB, H)
    return shapes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", type=Path, default=Path("/tmp/scale70b"))
    ap.add_argument("--hbm-budget-gb", type=float, default=6.0)
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--skip-embed", action="store_true",
                    help="layer tensors only (skips the 128256-row pair)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    out = args.out_dir
    out.mkdir(parents=True, exist_ok=True)
    shapes = probe_shapes(with_embed=not args.skip_embed)
    report = {
        "geometry": "llama-3.1-70b (1 layer + embed/lm_head)",
        "hbm_budget_gb": args.hbm_budget_gb,
        "tensors": {k: list(v) for k, v in shapes.items()},
    }

    t0 = time.time()
    sizes = synth_trio(out, shapes=shapes)
    report["synthesis_s"] = round(time.time() - t0, 1)
    report["input_bytes"] = sum(sizes.values())

    cfg = write_std_config(out, extra=f"hbm_budget_gb: {args.hbm_budget_gb}\n")
    merge_wall, log, rc = run_merge_cli(cfg, out / "merge.log")
    if rc != 0:
        report["merge_failed"] = True
        json.dump(report, open(out / "report.json", "w"), indent=2)
        sys.exit(1)
    report["merge_wall_s"] = round(merge_wall, 1)

    report["per_tensor_ms"] = {
        k: [round(x, 1) for x in v]
        for k, v in sorted(per_tensor_ms(log).items())
    }
    report["spill_events"] = log.count("spill")

    report["verify_ok"] = verify_gate(out / "merged")
    print("verify:", report["verify_ok"], flush=True)

    if not args.skip_oracle:
        # k_proj (1024x8192, 8M elements): the largest tensor the torch-CPU
        # oracle finishes in minutes on this one-core host
        agree = oracle_agreement(
            out, "model.layers.0.self_attn.k_proj.weight"
        )
        report["oracle_agreement_k_proj"] = round(agree, 4)
        print("oracle agreement (k_proj):", agree, flush=True)

    report["total_wall_s"] = round(time.time() - t0, 1)
    json.dump(report, open(out / "report.json", "w"), indent=2)
    print(json.dumps(report, indent=2))

    cleanup_inputs(out, args.keep)


if __name__ == "__main__":
    main()
