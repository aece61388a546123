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

    def synth(name, seed, base):
        idx = out / name / "model.safetensors.index.json"
        if idx.exists():
            print(f"{name}: reusing existing synthesis", flush=True)
            return json.load(open(idx))["metadata"]["total_size"]
        t = time.time()
        # ~1.9 GiB shard cuts land mid-expert-list: the irregular layout
        # this probe exists to exercise
        n = write_model(out / name, seed, 0, base, shapes=shapes,
                        shard_bytes=(15 << 27))
        print(f"{name}: {n/2**30:.1f} GiB in {time.time()-t:.0f}s", flush=True)
        return n

    sizes = {"base": synth("base", 1, None)}
    for i, name in enumerate(["ft1", "ft2"]):
        sizes[name] = synth(name, 2 + i, out / "base")
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

    cfg = out / "config.yaml"
    cfg.write_text(
        f"""output_base_model: "{out}/base"
finetune_merge:
  - {{model: "{out}/ft1", base: "{out}/base", alpha: 0.8}}
  - {{model: "{out}/ft2", base: "{out}/base", alpha: 0.4}}
output_dir: "{out}/merged"
cache_dir: "{out}/cache"
storage_dir: "{out}/storage"
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
        key = re.sub(r"layers\.\d+\.", "layers.N.", m.group(1))
        key = re.sub(r"experts\.\d+\.", "experts.E.", key)
        per_tensor.setdefault(key, []).append(float(m.group(2)))
    report["per_tensor_ms_median"] = {
        k: round(float(np.median(v)), 1)
        for k, v in sorted(per_tensor.items())
    }

    v = subprocess.run(
        [sys.executable, "-m", "shardmerge_tpu", "verify-safetensors",
         "--model_dir", str(out / "merged")],
        cwd=str(REPO), capture_output=True, text=True,
    )
    report["verify_ok"] = v.returncode == 0 and "align perfectly" in v.stdout
    print("verify:", report["verify_ok"], flush=True)

    # the output index must MIRROR the base index (irregular cuts included)
    out_map = json.load(
        open(out / "merged" / "model.safetensors.index.json")
    )["weight_map"]
    report["index_mirrors_base"] = out_map == base_map
    print("index mirrors base:", report["index_mirrors_base"], flush=True)

    if not args.skip_oracle:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from shardmerge_tpu.io import safetensors_io as stio
        from tests.test_merge_engine import _oracle_fourier_pair

        def load(d, n):
            idx = json.load(open(Path(d) / "model.safetensors.index.json"))
            with stio.SafeTensorsReader(Path(d) / idx["weight_map"][n]) as r:
                return r.get_tensor(n, copy=True).astype(np.float32)

        # one expert tensor + one shared tensor (k_proj-sized, tractable
        # for the torch oracle on this one-core host)
        for label, name in [
            ("expert_w2", "model.layers.0.block_sparse_moe.experts.3.w2.weight"),
            ("shared_k_proj", "model.layers.0.self_attn.k_proj.weight"),
        ]:
            got = load(out / "merged", name)
            expect = np.asarray(_oracle_fourier_pair(
                load(out / "base", name), load(out / "ft1", name),
                load(out / "ft2", name), 0.8, 0.4,
            ))
            scale = max(np.abs(expect).max(), 1e-6)
            agree = float(np.isclose(got, expect, rtol=2e-2,
                                     atol=2e-2 * scale).mean())
            report[f"oracle_agreement_{label}"] = round(agree, 4)
            print(f"oracle agreement ({label}):", agree, flush=True)

    report["total_wall_s"] = round(time.time() - t0, 1)
    json.dump(report, open(out / "report.json", "w"), indent=2)
    print(json.dumps(report, indent=2))

    if not args.keep:
        for d in ["base", "ft1", "ft2", "cache", "storage"]:
            shutil.rmtree(out / d, ignore_errors=True)


if __name__ == "__main__":
    main()
