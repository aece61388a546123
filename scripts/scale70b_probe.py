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
import os
import re
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from scale_rehearsal import write_model  # noqa: E402  (sibling script)

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

    def synth(name, seed, base):
        idx = out / name / "model.safetensors.index.json"
        if idx.exists():
            print(f"{name}: reusing existing synthesis", flush=True)
            return json.load(open(idx))["metadata"]["total_size"]
        t = time.time()
        n = write_model(out / name, seed, 0, base, shapes=shapes)
        print(f"{name}: {n/2**30:.1f} GiB in {time.time()-t:.0f}s", flush=True)
        return n

    sizes = {"base": synth("base", 1, None)}
    for i, name in enumerate(["ft1", "ft2"]):
        sizes[name] = synth(name, 2 + i, out / "base")
    report["synthesis_s"] = round(time.time() - t0, 1)
    report["input_bytes"] = sum(sizes.values())

    cfg = out / "config.yaml"
    cfg.write_text(
        f"""output_base_model: "{out}/base"
finetune_merge:
  - {{model: "{out}/ft1", base: "{out}/base", alpha: 0.8}}
  - {{model: "{out}/ft2", base: "{out}/base", alpha: 0.4}}
output_dir: "{out}/merged"
cache_dir: "{out}/cache"
storage_dir: "{out}/storage"
hbm_budget_gb: {args.hbm_budget_gb}
"""
    )

    env = dict(os.environ, SHARDMERGE_PROFILE="1")
    t1 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "shardmerge_tpu", "merge", str(cfg)],
        cwd=str(REPO), env=env, capture_output=True, text=True,
    )
    merge_wall = time.time() - t1
    log = proc.stdout + proc.stderr
    (out / "merge.log").write_text(log)
    if proc.returncode != 0:
        print(log[-4000:])
        report["merge_failed"] = True
        json.dump(report, open(out / "report.json", "w"), indent=2)
        sys.exit(1)
    report["merge_wall_s"] = round(merge_wall, 1)

    per_tensor = {}
    for m in re.finditer(r"\[profile\] merge ([\w.]+): ([\d.]+) ms", log):
        per_tensor.setdefault(m.group(1), []).append(float(m.group(2)))
    report["per_tensor_ms"] = {
        k: [round(x, 1) for x in v] for k, v in sorted(per_tensor.items())
    }
    report["spill_events"] = log.count("spill")

    v = subprocess.run(
        [sys.executable, "-m", "shardmerge_tpu", "verify-safetensors",
         "--model_dir", str(out / "merged")],
        cwd=str(REPO), capture_output=True, text=True,
    )
    report["verify_ok"] = v.returncode == 0 and "align perfectly" in v.stdout
    print("verify:", report["verify_ok"], flush=True)

    if not args.skip_oracle:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from shardmerge_tpu.io import safetensors_io as stio
        from tests.test_merge_engine import _oracle_fourier_pair

        def load(d, n):
            idx = json.load(open(Path(d) / "model.safetensors.index.json"))
            with stio.SafeTensorsReader(Path(d) / idx["weight_map"][n]) as r:
                return r.get_tensor(n, copy=True).astype(np.float32)

        # k_proj (1024x8192, 8M elements): the largest tensor the torch-CPU
        # oracle finishes in minutes on this one-core host
        name = "model.layers.0.self_attn.k_proj.weight"
        got = load(out / "merged", name)
        expect = np.asarray(_oracle_fourier_pair(
            load(out / "base", name), load(out / "ft1", name),
            load(out / "ft2", name), 0.8, 0.4,
        ))
        scale = max(np.abs(expect).max(), 1e-6)
        agree = float(np.isclose(got, expect, rtol=2e-2,
                                 atol=2e-2 * scale).mean())
        report["oracle_agreement_k_proj"] = round(agree, 4)
        print("oracle agreement (k_proj):", agree, flush=True)

    report["total_wall_s"] = round(time.time() - t0, 1)
    json.dump(report, open(out / "report.json", "w"), indent=2)
    print(json.dumps(report, indent=2))

    if not args.keep:
        for d in ["base", "ft1", "ft2", "cache", "storage"]:
            shutil.rmtree(out / d, ignore_errors=True)


if __name__ == "__main__":
    main()
