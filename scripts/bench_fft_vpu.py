"""Measure ops/fft_vpu (Pallas Stockham) vs XLA's fft on the TPU.

Times a chained rfft2->irfft2 roundtrip at the bench shape (4096, 8192)
with slope timing ((t_K2 - t_K1)/(K2 - K1)) so the ~24 ms relay dispatch
latency cancels, for both the VPU Stockham kernels and jnp.fft. Prints a
JSON report; exits nonzero on parity failure.

Run ALONE (one-core host; see CLAUDE.md).
"""

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SHAPE = (4096, 8192)


def main():
    from bench import _probe_device

    _probe_device()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = Path("/tmp/shardmerge_xla_cache")
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from shardmerge_tpu.ops import fft_vpu

    rng = np.random.default_rng(7)
    x_np = rng.standard_normal(SHAPE).astype(np.float32)
    x = jnp.asarray(x_np)

    def vpu_round(x):
        return fft_vpu.irfft2_vpu(fft_vpu.rfft2_vpu(x), SHAPE)

    def xla_round(x):
        return jnp.fft.irfftn(
            jnp.fft.rfftn(x, axes=(-2, -1)), s=SHAPE, axes=(-2, -1)
        )

    def chain(fn, x, K):
        for _ in range(K):
            x = fn(x) * jnp.float32(1.0)  # defeat any fwd/inv fusion/cse
        return x

    import functools

    def timed(fn, K, reps=6):
        jfn = jax.jit(functools.partial(chain, fn, K=K))

        def run():
            # CLAUDE.md: block_until_ready alone can under-measure through
            # the relay; force a scalar fetch to pin true completion
            out = jfn(x)
            float(jnp.sum(out[:1, :8]))
            return out

        t0 = time.perf_counter()
        out = run()
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(reps):
            start = time.perf_counter()
            out = run()
            best = min(best, time.perf_counter() - start)
        return best, compile_s, out

    report = {"shape": SHAPE}

    # parity first (cheap K=1 calls)
    print("compiling vpu K=1 ...", file=sys.stderr, flush=True)
    t_v1, c_v1, out_v = timed(vpu_round, 1)
    print(f"vpu K=1 {t_v1*1e3:.1f} ms (compile {c_v1:.0f}s)", file=sys.stderr)
    print("compiling xla K=1 ...", file=sys.stderr, flush=True)
    t_x1, c_x1, out_x = timed(xla_round, 1)
    print(f"xla K=1 {t_x1*1e3:.1f} ms (compile {c_x1:.0f}s)", file=sys.stderr)
    v_np = np.asarray(out_v)
    xla_np = np.asarray(out_x)
    rel_vs_xla = float(
        np.linalg.norm(v_np - xla_np) / np.linalg.norm(xla_np)
    )
    rel_vs_in = float(np.linalg.norm(v_np - x_np) / np.linalg.norm(x_np))
    report["roundtrip_rel_vs_input"] = rel_vs_in
    report["rel_vs_xla"] = rel_vs_xla
    if rel_vs_in > 1e-5:
        print(json.dumps({**report, "fail": "parity"}))
        sys.exit(1)

    print("compiling vpu K=3 ...", file=sys.stderr, flush=True)
    t_v3, c_v3, _ = timed(vpu_round, 3)
    print(f"vpu K=3 {t_v3*1e3:.1f} ms (compile {c_v3:.0f}s)", file=sys.stderr)
    print("compiling xla K=3 ...", file=sys.stderr, flush=True)
    t_x3, c_x3, _ = timed(xla_round, 3)
    print(f"xla K=3 {t_x3*1e3:.1f} ms (compile {c_x3:.0f}s)", file=sys.stderr)

    vpu_ms = (t_v3 - t_v1) / 2 * 1e3
    xla_ms = (t_x3 - t_x1) / 2 * 1e3
    report["vpu_roundtrip_ms"] = vpu_ms
    report["xla_roundtrip_ms"] = xla_ms
    report["speedup_vs_xla"] = xla_ms / vpu_ms if vpu_ms > 0 else None
    print(json.dumps(report))


if __name__ == "__main__":
    main()
