#!/usr/bin/env python
"""Synthetic scale rehearsal: a full Llama-8B-shaped merge on real hardware.

Builds base + 2 finetunes with REAL Llama-3.1-8B tensor shapes (random
weights — this container is zero-egress, BASELINE.md configs 1-5 cannot be
fetched), runs the production `merge` CLI with profiling, gates the output
with verify-safetensors, spot-checks one tensor against the torch oracle,
and writes a JSON report with the per-phase breakdown and a measured
projection to the 70B target (BASELINE.md).

Usage:
    python scripts/scale_rehearsal.py --out-dir /tmp/scale8b [--layers 32]
        [--skip-oracle] [--keep]

The driver-facing numbers land in <out-dir>/report.json.
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

# Llama-3.1-8B geometry (config.json of meta-llama/Llama-3.1-8B)
HIDDEN = 4096
INTER = 14336
VOCAB = 128256
N_KV = 8
N_HEADS = 32
HEAD_DIM = HIDDEN // N_HEADS

# Llama-3.1-70B geometry for the projection
H70, I70, L70 = 8192, 28672, 80


def layer_shapes(hidden=HIDDEN, inter=INTER):
    kv = N_KV * HEAD_DIM * hidden // HIDDEN  # kv width scales with hidden
    return {
        "self_attn.q_proj.weight": (hidden, hidden),
        "self_attn.k_proj.weight": (kv, hidden),
        "self_attn.v_proj.weight": (kv, hidden),
        "self_attn.o_proj.weight": (hidden, hidden),
        "mlp.gate_proj.weight": (inter, hidden),
        "mlp.up_proj.weight": (inter, hidden),
        "mlp.down_proj.weight": (hidden, inter),
        "input_layernorm.weight": (hidden,),
        "post_attention_layernorm.weight": (hidden,),
    }


def model_shapes(layers: int):
    shapes = {"model.embed_tokens.weight": (VOCAB, HIDDEN)}
    for i in range(layers):
        for k, shp in layer_shapes().items():
            shapes[f"model.layers.{i}.{k}"] = shp
    shapes["model.norm.weight"] = (HIDDEN,)
    shapes["lm_head.weight"] = (VOCAB, HIDDEN)
    return shapes


_POOL_BUF = None  # one big gaussian buffer shared by all models


class Pool:
    """Cheap deterministic tensor source: one shared random buffer sized to
    the largest tensor, sliced at per-model/per-tensor offsets.

    Generating 24B independent gaussians on one core would dominate the
    rehearsal; the merge math only needs nonzero, model-distinct deltas.
    """

    def __init__(self, seed: int, min_elems: int = 0):
        global _POOL_BUF
        n = max(VOCAB * HIDDEN, min_elems) + (1 << 17)
        if _POOL_BUF is None or _POOL_BUF.size < n:
            # uniform is ~10x faster to generate than gaussian on this host
            # and serves the same purpose here
            _POOL_BUF = np.random.default_rng(0).random(n, dtype=np.float32)
            _POOL_BUF -= 0.5
        self.off = seed * 51_511_229

    def take(self, shape):
        n = int(np.prod(shape))
        start = self.off % (_POOL_BUF.size - n)
        self.off += 1_000_003  # co-prime-ish walk so tensors differ
        return _POOL_BUF[start:start + n].reshape(shape).copy()


def write_model(path: Path, seed: int, layers: int, base_dir: Path | None,
                delta_scale: float = 2e-3, shard_bytes: int = 4 << 30,
                shapes: dict | None = None):
    """Write a sharded bf16 safetensors model; if base_dir is given, tensors
    are base + delta_scale * noise (a finetune)."""
    from shardmerge_tpu.io import native
    from shardmerge_tpu.io import safetensors_io as stio

    path.mkdir(parents=True, exist_ok=True)
    if shapes is None:
        shapes = model_shapes(layers)
    pool = Pool(seed, max(int(np.prod(s)) for s in shapes.values()))
    if base_dir is not None:
        base_idx = json.load(open(base_dir / "model.safetensors.index.json"))
        base_map = base_idx["weight_map"]

    weight_map, shard, shard_size, shard_id = {}, {}, 0, 1
    names = list(shapes)
    total = 0

    def flush(shard, shard_id, n_shards_guess=99):
        fname = f"model-{shard_id:05d}-of-{n_shards_guess:05d}.safetensors"
        stio.save_file(shard, path / fname, metadata={"format": "pt"})
        return fname

    pending = []  # (fname, names)
    for name in names:
        shp = shapes[name]
        t = pool.take(shp)
        if base_dir is not None:
            with stio.SafeTensorsReader(base_dir / base_map[name]) as r:
                # ml_dtypes .astype on an mmap view runs ~25x slower than on
                # RAM; copy first, then widen with the native converter
                bt = native.bf16_to_f32(r.get_tensor(name, copy=True))
            t = bt + delta_scale * t
        bf = native.f32_to_bf16(np.ascontiguousarray(t))
        shard[name] = bf
        shard_size += bf.nbytes
        total += bf.nbytes
        if shard_size >= shard_bytes:
            pending.append((flush(shard, shard_id), list(shard)))
            shard, shard_size, shard_id = {}, 0, shard_id + 1
    if shard:
        pending.append((flush(shard, shard_id), list(shard)))

    n_shards = len(pending)
    for fname, members in pending:
        final = fname.replace("-of-00099", f"-of-{n_shards:05d}")
        os.rename(path / fname, path / final)
        for m in members:
            weight_map[m] = final
    index = {"metadata": {"total_size": total}, "weight_map": weight_map}
    json.dump(index, open(path / "model.safetensors.index.json", "w"), indent=2)
    return total


# ---- shared probe harness (used by the sibling scale/MoE/overlap probes;
# keep gate strings / tolerances / cleanup in ONE place) ----

def synth_or_reuse(out: Path, name: str, seed: int, base: Path | None,
                   layers: int = 0, shapes: dict | None = None,
                   shard_bytes: int = 4 << 30) -> int:
    """Write a synthetic model dir under ``out/name``, or reuse one already
    on disk (index-presence check); returns total bytes."""
    idx = out / name / "model.safetensors.index.json"
    if idx.exists():
        print(f"{name}: reusing existing synthesis", flush=True)
        return json.load(open(idx))["metadata"]["total_size"]
    t = time.time()
    n = write_model(out / name, seed, layers, base, shapes=shapes,
                    shard_bytes=shard_bytes)
    print(f"{name}: {n/2**30:.1f} GiB in {time.time()-t:.0f}s", flush=True)
    return n


def synth_trio(out: Path, layers: int = 0, shapes: dict | None = None,
               shard_bytes: int = 4 << 30) -> dict:
    """base + ft1 + ft2 with the standard seeds; returns name->bytes."""
    sizes = {"base": synth_or_reuse(out, "base", 1, None, layers, shapes,
                                    shard_bytes)}
    for i, name in enumerate(["ft1", "ft2"]):
        sizes[name] = synth_or_reuse(out, name, 2 + i, out / "base", layers,
                                     shapes, shard_bytes)
    return sizes


ALPHAS = (0.8, 0.4)


def write_std_config(out: Path, extra: str = "",
                     merged: str = "merged") -> Path:
    """The standard base+2-finetune config; ``extra`` appends raw YAML."""
    cfg = out / f"config_{merged}.yaml" if merged != "merged" else (
        out / "config.yaml"
    )
    cfg.write_text(
        f"""output_base_model: "{out}/base"
finetune_merge:
  - {{model: "{out}/ft1", base: "{out}/base", alpha: {ALPHAS[0]}}}
  - {{model: "{out}/ft2", base: "{out}/base", alpha: {ALPHAS[1]}}}
output_dir: "{out}/{merged}"
cache_dir: "{out}/cache"
storage_dir: "{out}/storage"
{extra}"""
    )
    return cfg


def run_merge_cli(cfg: Path, log_path: Path, env_extra: dict | None = None):
    """Run the production merge CLI; returns (wall_s, log, returncode)."""
    env = dict(os.environ, SHARDMERGE_PROFILE="1", **(env_extra or {}))
    t1 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "shardmerge_tpu", "merge", str(cfg)],
        cwd=str(REPO), env=env, capture_output=True, text=True,
    )
    wall = time.time() - t1
    log = proc.stdout + proc.stderr
    log_path.write_text(log)
    if proc.returncode != 0:
        print(log[-4000:])
    return wall, log, proc.returncode


def verify_gate(model_dir: Path) -> bool:
    """verify-safetensors CLI gate (index/offset alignment)."""
    v = subprocess.run(
        [sys.executable, "-m", "shardmerge_tpu", "verify-safetensors",
         "--model_dir", str(model_dir)],
        cwd=str(REPO), capture_output=True, text=True,
    )
    return v.returncode == 0 and "agree" in v.stdout


def load_tensor_f32(d: Path, n: str) -> np.ndarray:
    from shardmerge_tpu.io import safetensors_io as stio

    idx = json.load(open(Path(d) / "model.safetensors.index.json"))
    with stio.SafeTensorsReader(Path(d) / idx["weight_map"][n]) as r:
        return r.get_tensor(n, copy=True).astype(np.float32)


def oracle_agreement(out: Path, name: str, merged: str = "merged") -> float:
    """Elementwise agreement of a merged tensor vs the independent torch
    oracle of the full layer algorithm (rtol/atol 2e-2: bf16 output + FFT
    library rounding; see tests/oracle_torch.py)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tests.test_merge_engine import _oracle_fourier_pair

    got = load_tensor_f32(out / merged, name)
    expect = np.asarray(_oracle_fourier_pair(
        load_tensor_f32(out / "base", name), load_tensor_f32(out / "ft1", name),
        load_tensor_f32(out / "ft2", name), *ALPHAS,
    ))
    scale = max(np.abs(expect).max(), 1e-6)
    return float(np.isclose(got, expect, rtol=2e-2, atol=2e-2 * scale).mean())


def per_tensor_ms(log: str, collapse: tuple = ()) -> dict:
    """[profile] lines -> name -> [ms, ...]; ``collapse`` regexes rewrite
    names (e.g. layer/expert indices) onto shared keys first."""
    phases: dict = {}
    for m in re.finditer(r"\[profile\] merge ([\w.]+): ([\d.]+) ms", log):
        key = m.group(1)
        for pat, rep in collapse:
            key = re.sub(pat, rep, key)
        phases.setdefault(key, []).append(float(m.group(2)))
    return phases


def cleanup_inputs(out: Path, keep: bool):
    if not keep:
        for d in ["base", "ft1", "ft2", "cache", "storage"]:
            shutil.rmtree(out / d, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", type=Path, default=Path("/tmp/scale8b"))
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--keep", action="store_true", help="keep model dirs")
    args = ap.parse_args()

    out = args.out_dir
    out.mkdir(parents=True, exist_ok=True)
    report = {"layers": args.layers, "shapes": "llama-3.1-8b"}

    t0 = time.time()
    sizes = synth_trio(out, layers=args.layers)
    report["synthesis_s"] = round(time.time() - t0, 1)
    report["input_bytes"] = sum(sizes.values())
    print(f"synthesized {report['input_bytes']/2**30:.1f} GiB in "
          f"{report['synthesis_s']}s", flush=True)

    cfg = write_std_config(out)
    merge_wall, log, rc = run_merge_cli(cfg, out / "merge.log")
    if rc != 0:
        sys.exit(1)
    report["merge_wall_s"] = round(merge_wall, 1)

    # host-pipeline spans (merge/base.py instrumentation): fetch = time the
    # engine actually WAITED for host reads (prefetch-absorbed reads don't
    # show), h2d = device_put walls, merge = _merge_layer walls, flush =
    # D2H wait + shard write. overlap_fraction estimates how much of the
    # fetch+flush IO ran under the merge wall instead of adding to it.
    m = re.search(
        r"spans fetch=([\d.]+)s h2d=([\d.]+)s merge=([\d.]+)s "
        r"flush=([\d.]+)s",
        log,
    )
    if m:
        fetch_s, h2d_s, span_merge_s, flush_s = map(float, m.groups())
        report["spans_s"] = {
            "fetch_wait": fetch_s,
            "h2d": h2d_s,
            "merge": span_merge_s,
            "flush": flush_s,
        }
        # the prefetch signal: reads the pipeline HID under compute never
        # appear in fetch_wait, so (bytes_read/disk_rate - fetch_wait) is
        # hidden IO. Report the raw ratio; BASELINE.md interprets it
        # against a prefetch_depth=0 control.
        report["fetch_wait_frac_of_merge_wall"] = (
            round(fetch_s / merge_wall, 4) if merge_wall else None
        )

    # phase breakdown from the profiler lines; median = steady state, the
    # first occurrence of each shape carries the XLA compile
    phases = per_tensor_ms(log, collapse=((r"layers\.\d+\.", "layers.N."),))
    report["per_tensor_ms_median"] = {
        k: round(float(np.median(v)), 1) for k, v in sorted(phases.items())
    }
    report["per_tensor_ms_first_incl_compile"] = {
        k: round(v[0], 1) for k, v in sorted(phases.items())
    }

    report["verify_ok"] = verify_gate(out / "merged")
    print("verify:", report["verify_ok"], flush=True)

    # oracle spot-check (one q_proj tensor, reference-semantics torch path)
    if not args.skip_oracle:
        agree = oracle_agreement(out, "model.layers.0.self_attn.q_proj.weight")
        report["oracle_agreement"] = round(agree, 4)
        print("oracle agreement:", agree, flush=True)

    # projection: per-layer cost scales with tensor elements; 70B has 80
    # layers of (H70, I70) geometry
    med = report["per_tensor_ms_median"]
    layer_keys = [k for k in med if "layers.N" in k]
    per_layer_ms = sum(med[k] for k in layer_keys)
    el_8b = sum(int(np.prod(s)) for s in layer_shapes().values())
    el_70b = sum(int(np.prod(s)) for s in layer_shapes(H70, I70).values())
    embed_ms = med.get("model.embed_tokens.weight", 0)
    head_ms = med.get("lm_head.weight", 0)
    proj_s = (L70 * per_layer_ms * el_70b / el_8b + embed_ms * 2 + head_ms) / 1e3
    report["measured_per_layer_ms"] = round(per_layer_ms, 1)
    # This host routes every host<->device byte through a loopback TCP relay
    # (~85 MB/s observed): the steady-state tensor time is TRANSFER-bound,
    # so this projection is an upper bound specific to the tunnel. A real
    # TPU host moves the same bytes over PCIe/DMA; the kernel-bound
    # projection below uses the bench-measured merge kernel rate instead.
    report["projected_70b_s_on_this_tunnel"] = round(proj_s, 1)
    kernel_ms_per_melem = 24.2 / 32.0  # bench.py: 24.2 ms / 32M elements
    layer_melem_70b = el_70b / 1e6
    report["projected_70b_kernel_compute_s"] = round(
        L70 * layer_melem_70b * kernel_ms_per_melem / 1e3, 1
    )
    report["total_wall_s"] = round(time.time() - t0, 1)

    json.dump(report, open(out / "report.json", "w"), indent=2)
    print(json.dumps(report, indent=2))

    cleanup_inputs(out, args.keep)


if __name__ == "__main__":
    main()
