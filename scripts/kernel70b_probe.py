#!/usr/bin/env python
"""Kernel-only 70B-shape probe: can the production pair-merge kernel run at
each Llama-70B tensor shape on one chip, and at what ms / peak HBM?

Inputs are generated ON-device (jax.random) so the ~85 MB/s host relay
does not gate iteration; this isolates kernel feasibility (HBM head-room,
XLA FFT behavior at 128256 = 2^7*3*167 rows) from the IO pipeline, which
scripts/scale70b_probe.py measures end-to-end. VERDICT r2 #1.

Usage: python scripts/kernel70b_probe.py [--shapes mlp,embed,...]
Prints one JSON line per shape; writes /tmp/kernel70b_report.json.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SHAPES = {
    "attn_q": (8192, 8192),
    "attn_kv": (1024, 8192),
    "mlp_up": (28672, 8192),
    "mlp_down": (8192, 28672),
    "embed": (128256, 8192),
}


def _mem_analysis(compiled):
    """Flatten ``compiled.memory_analysis()`` into plain ints.

    XLA computes these client-side from the executable, so they are
    available even when the relay backend reports no allocator stats.
    ``peak_estimate_bytes`` = arguments + outputs + temps − aliased: the
    HBM high-water mark the executable needs (excludes anything else
    resident on the chip at launch)."""
    try:
        ma = compiled.memory_analysis()
        if ma is None:
            return None
        fields = (
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "temp_size_in_bytes",
            "alias_size_in_bytes",
            "generated_code_size_in_bytes",
        )
        d = {f: int(getattr(ma, f)) for f in fields if hasattr(ma, f)}
        need = {
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "temp_size_in_bytes",
        }
        if need <= d.keys():
            d["peak_estimate_bytes"] = (
                d["argument_size_in_bytes"]
                + d["output_size_in_bytes"]
                + d["temp_size_in_bytes"]
                - d.get("alias_size_in_bytes", 0)
            )
        return d
    except Exception as e:  # noqa: BLE001 — evidence, not control flow
        return {"error": f"{type(e).__name__}: {str(e)[:300]}"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default=",".join(SHAPES))
    ap.add_argument("--out", type=Path, default=Path("/tmp/kernel70b_report.json"))
    args = ap.parse_args()

    from bench import _probe_device

    _probe_device()

    import jax
    import jax.numpy as jnp

    cache = Path("/tmp/shardmerge_xla_cache")
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from shardmerge_tpu.merge.fourier import _pair_slerp_rfft
    from shardmerge_tpu.ops import blend
    from shardmerge_tpu.ops.profiling import device_memory_stats

    report = {}
    for name in args.shapes.split(","):
        shape = SHAPES[name]
        numel = shape[0] * shape[1]
        entry = {"shape": list(shape), "gib_fp32": round(numel * 4 / 2**30, 2)}
        print(f"--- {name} {shape} ({entry['gib_fp32']} GiB fp32)",
              file=sys.stderr, flush=True)
        try:
            key = jax.random.PRNGKey(0)
            ka, kb = jax.random.split(key)
            # bf16 like real checkpoints, widened on device like the engine
            a = jax.random.normal(ka, shape, jnp.bfloat16).astype(jnp.float32)
            b = jax.random.normal(kb, shape, jnp.bfloat16).astype(jnp.float32)
            jax.block_until_ready((a, b))
            norm_a = jnp.linalg.norm(a.ravel())
            norm_b = jnp.linalg.norm(b.ravel())
            jax.block_until_ready((norm_a, norm_b))

            merge_args = (
                a, b, norm_a, norm_b, jnp.float32(0.6),
                jnp.int32(blend.cutoff_rank(numel, 0.08)),
                jnp.int32(blend.cull_rank(numel, 0.2)),
                jnp.int32(blend.cull_limit(numel, 0.2)),
                jnp.float32(1.0),
            )
            # AOT: lower+compile ONCE, execute the compiled object. This
            # yields XLA's own memory_analysis() for the shape — the peak
            # HBM evidence the relay's empty allocator stats can't give
            # (VERDICT r3 #7) — and if the shape genuinely exceeds the
            # chip, the compile/alloc error lands here in entry["error"]
            # with the allocator's message.
            t0 = time.perf_counter()
            compiled = _pair_slerp_rfft.lower(
                *merge_args, use_cutoff=True, use_cull=True
            ).compile()
            entry["compile_s"] = round(time.perf_counter() - t0, 1)
            entry["xla_memory_analysis"] = _mem_analysis(compiled)

            def run():
                out, nan_count, has_inf = compiled(*merge_args)
                # force a scalar fetch (block_until_ready under-measures on
                # the relay; CLAUDE.md)
                return float(jnp.sum(out[:1, :8]))

            t0 = time.perf_counter()
            run()
            entry["first_run_s"] = round(time.perf_counter() - t0, 1)
            best = float("inf")
            for _ in range(3):
                t = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t)
            entry["steady_ms"] = round(best * 1e3, 1)
            entry["ms_per_melem"] = round(best * 1e3 / (numel / 1e6), 3)
            stats = device_memory_stats()
            entry["peak_bytes_in_use"] = stats.get("peak_bytes_in_use")
            entry["live_bytes_client"] = stats.get("live_bytes_client")
            del a, b
        except Exception as e:  # noqa: BLE001 — record and continue
            entry["error"] = f"{type(e).__name__}: {str(e)[:500]}"
        report[name] = entry
        print(json.dumps({name: entry}), flush=True)

    json.dump(report, open(args.out, "w"), indent=2)


if __name__ == "__main__":
    main()
