#!/usr/bin/env python
"""A/B the host-pipeline prefetch on the real device path (VERDICT r2 #3).

Builds base + 2 finetunes of N identical (4096, 8192) bf16 tensors (the
bench shape — big enough that host reads and host->device transfers
dominate on this relay), then runs the production merge CLI twice:
SHARDMERGE_PREFETCH_DEPTH=0 (serial reads) vs 2 (reads k layers ahead in
worker threads). Reports each run's wall clock and span breakdown; the
prefetch run's `fetch` span collapsing while wall shrinks IS the overlap
fraction moving.

The depth-0 run goes FIRST so the depth-2 run cannot win via XLA compile
caching (axon does not cache; each subprocess recompiles the same single
shape once — comparable across runs).

Usage: python scripts/overlap_ab.py [--out-dir /tmp/overlap_ab]
           [--tensors 10] [--keep]
Run ALONE (one-core host; see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import re
import shutil
import sys
import time
from pathlib import Path


REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from scale_rehearsal import (  # noqa: E402  (sibling script)
    cleanup_inputs,
    run_merge_cli,
    synth_trio,
    write_std_config,
)

SHAPE = (4096, 8192)


def ab_shapes(n: int) -> dict:
    # llama-style names so the writer/index are exercised normally; all
    # mid-layer so every tensor takes the full merge path
    shapes = {"model.embed_tokens.weight": (64, 64)}
    for i in range(n):
        shapes[f"model.layers.{i}.mlp.gate_proj.weight"] = SHAPE
        shapes[f"model.layers.{i}.input_layernorm.weight"] = (64,)
    shapes["model.norm.weight"] = (64,)
    shapes["lm_head.weight"] = (64, 64)
    return shapes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", type=Path, default=Path("/tmp/overlap_ab"))
    ap.add_argument("--tensors", type=int, default=10)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    out = args.out_dir
    out.mkdir(parents=True, exist_ok=True)
    shapes = ab_shapes(args.tensors)
    report = {"shape": SHAPE, "n_big_tensors": args.tensors}

    t0 = time.time()
    synth_trio(out, shapes=shapes)
    report["synthesis_s"] = round(time.time() - t0, 1)

    span_re = re.compile(
        r"spans fetch=([\d.]+)s h2d=([\d.]+)s merge=([\d.]+)s flush=([\d.]+)s"
    )
    h2d_re = re.compile(r"h2d ([\d.]+) GiB \((\d+) deduped puts\)")

    def run(depth: int) -> dict:
        merged = f"merged_d{depth}"
        shutil.rmtree(out / merged, ignore_errors=True)
        cfg = write_std_config(out, merged=merged)
        wall, log, rc = run_merge_cli(
            cfg, out / f"merge_d{depth}.log",
            env_extra={"SHARDMERGE_PREFETCH_DEPTH": str(depth)},
        )
        if rc != 0:
            sys.exit(1)
        m = span_re.search(log)
        entry = {"wall_s": round(wall, 1)}
        if m:
            entry.update(
                fetch_s=float(m.group(1)), h2d_s=float(m.group(2)),
                merge_s=float(m.group(3)), flush_s=float(m.group(4)),
            )
        b = h2d_re.search(log)
        if b:
            entry.update(
                h2d_gib=float(b.group(1)), h2d_dedup_hits=int(b.group(2))
            )
        return entry

    report["depth_0"] = run(0)
    print("depth 0:", json.dumps(report["depth_0"]), flush=True)
    report["depth_2"] = run(2)
    print("depth 2:", json.dumps(report["depth_2"]), flush=True)

    f0 = report["depth_0"].get("fetch_s")
    f2 = report["depth_2"].get("fetch_s")
    if f0 and f2 is not None:
        report["fetch_hidden_fraction"] = round(1.0 - f2 / f0, 3)
    json.dump(report, open(out / "report.json", "w"), indent=2)
    print(json.dumps(report, indent=2))

    cleanup_inputs(out, args.keep)


if __name__ == "__main__":
    main()
