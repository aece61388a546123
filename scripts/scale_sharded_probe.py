#!/usr/bin/env python
"""Production-size mesh-sharded merge probe (round-4 item 1).

Proves the GSPMD row-sharded FFT merge at >=1 GiB tensor scale on the
8-virtual-device CPU mesh, via the PRODUCTION merge CLI with the auto-mesh
default (no ``shard_tensors`` key in the config): the big tensors place
row-sharded over the mesh, merge with the distributed kernels
(parallel/merge.py), and the output matches a ``shard_tensors: false``
single-device run of the same config on the bf16 output grid.

Tensors (written bf16, like real checkpoints):
- ``model.layers.0.mlp.down_proj.weight``  (65536, 8192) = 1.00 GiB.
  65536*8192 == 2**29 elements == the huge-tensor working-set bound
  (merge/base.py): BOTH sharding triggers fire, and the single-device run
  takes the documented host-CPU huge-tensor fallback — so this probe also
  pins sharded-vs-host-fallback equality at the size the routing exists for.
- ``model.layers.1.mlp.down_proj.weight``  (32769, 8192) = 0.50 GiB, odd
  rows: the mesh pads rows to a multiple of 8 and slices the pad back off
  (probe config sets ``shard_min_bytes: 512 MiB`` so it shards too).

Usage:
    python scripts/scale_sharded_probe.py [--out-dir /tmp/scale_sharded]
        [--keep]

Writes <out-dir>/report.json (mirror it to docs/SCALE_SHARDED.json).
Run it ALONE on this one-core host (see CLAUDE.md contention notes).
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# CPU + 8 virtual devices, forced via the config API (env alone cannot
# override the harness sitecustomize; see tests/conftest.py)
from shardmerge_tpu.utils import host_device_count_flags  # noqa: E402

os.environ["XLA_FLAGS"] = host_device_count_flags(
    os.environ.get("XLA_FLAGS", ""), 8
)
os.environ["SHARDMERGE_PROFILE"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from scripts.scale_rehearsal import (  # noqa: E402
    ALPHAS,
    load_tensor_f32,
    synth_trio,
    verify_gate,
    write_std_config,
)

BIG = "model.layers.0.mlp.down_proj.weight"  # (65536, 8192) bf16 = 1 GiB
ODD = "model.layers.1.mlp.down_proj.weight"  # (32769, 8192) bf16, odd rows
# --smoke divides rows by 64 (shape-class dress rehearsal; odd rows stay odd)
SHAPES = {
    BIG: (65536, 8192),
    ODD: (32769, 8192),
    "model.norm.weight": (8192,),
}


def run_cli_inproc(cfg: Path, log_path: Path) -> float:
    """Run the production merge CLI in-process (the CPU platform forcing
    above applies); returns wall seconds and saves the full log."""
    from click.testing import CliRunner

    from shardmerge_tpu.cli import cli

    buf = io.StringIO()
    handler = logging.StreamHandler(buf)
    handler.setLevel(logging.INFO)
    root = logging.getLogger()
    prev_level = root.level
    root.addHandler(handler)
    root.setLevel(logging.INFO)
    t0 = time.time()
    try:
        result = CliRunner().invoke(cli, ["merge", str(cfg)])
    finally:
        root.removeHandler(handler)
        root.setLevel(prev_level)
    wall = time.time() - t0
    log = buf.getvalue() + (result.output or "")
    log_path.write_text(log)
    if result.exit_code != 0:
        print(log[-4000:])
        raise SystemExit(f"merge CLI failed: {cfg}")
    return wall, log


def stats_line(log: str) -> str:
    for line in log.splitlines():
        if "Merge stats:" in line:
            return line.split("Merge stats:", 1)[1].strip()
    return ""


def compare(out: Path, name: str) -> dict:
    a = load_tensor_f32(out / "merged_sharded", name)
    b = load_tensor_f32(out / "merged_plain", name)
    diff = a - b
    rel_l2 = float(np.linalg.norm(diff) / max(np.linalg.norm(b), 1e-12))
    return {
        "shape": list(a.shape),
        "bitexact_frac": float((a == b).mean()),
        "rel_l2": rel_l2,
        "max_abs_diff": float(np.abs(diff).max()),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", type=Path, default=Path("/tmp/scale_sharded"))
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        for k, v in list(SHAPES.items()):
            if len(v) == 2:
                SHAPES[k] = (v[0] // 64 + (v[0] % 2), v[1])
    out = args.out_dir
    out.mkdir(parents=True, exist_ok=True)

    report = {
        "devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
        "shapes": {k: list(v) for k, v in SHAPES.items()},
        "alphas": list(ALPHAS),
    }
    assert report["devices"] == 8 and report["platform"] == "cpu"

    t0 = time.time()
    sizes = synth_trio(out, shapes=SHAPES)
    report["synthesis_s"] = round(time.time() - t0, 1)
    report["input_bytes"] = sizes

    # Run A: auto-mesh default — NO shard_tensors key. shard_min_bytes at
    # 512 MiB so the odd-row 0.5 GiB tensor shards too (the 1 GiB tensor
    # shards under the default threshold AND the huge-numel trigger).
    shard_min = (1 << 20) if args.smoke else (512 << 20)
    cfg_sharded = write_std_config(
        out, extra=f"shard_min_bytes: {shard_min}\n", merged="merged_sharded"
    )
    wall_a, log_a = run_cli_inproc(cfg_sharded, out / "sharded.log")
    report["sharded"] = {
        "wall_s": round(wall_a, 1),
        "stats": stats_line(log_a),
        "auto_mesh_logged": "Sharding tensors >=" in log_a,
    }
    # 3 models x 2 big tensors place sharded (+base re-fetch dedupes)
    import re

    m = re.search(r"mesh-sharded (\d+) input tensors", log_a)
    report["sharded"]["tensors_sharded"] = int(m.group(1)) if m else 0

    # Run B: single device, explicit opt-out. The 2**29-element tensor
    # takes the host-CPU huge-tensor fallback (same backend on this host).
    cfg_plain = write_std_config(
        out, extra="shard_tensors: false\n", merged="merged_plain"
    )
    wall_b, log_b = run_cli_inproc(cfg_plain, out / "plain.log")
    report["plain"] = {"wall_s": round(wall_b, 1), "stats": stats_line(log_b)}

    report["verify_sharded"] = verify_gate(out / "merged_sharded")
    report["equality"] = {n: compare(out, n) for n in (BIG, ODD)}

    ok = (
        report["verify_sharded"]
        and report["sharded"]["tensors_sharded"] >= 6
        and all(
            e["rel_l2"] < 1e-3 and e["bitexact_frac"] > 0.98
            for e in report["equality"].values()
        )
    )
    report["ok"] = bool(ok)
    (out / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    if not args.keep:
        for sub in ("base", "ft1", "ft2", "merged_sharded", "merged_plain",
                    "cache", "storage"):
            shutil.rmtree(out / sub, ignore_errors=True)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
