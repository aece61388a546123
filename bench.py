"""Benchmark: FFT-blend pair merge throughput (the merge hot loop).

Measures the full regime-(c) pair merge (normalize -> 2-D FFT x2 -> masked
SLERP/sum/pick blend with exact cutoff+cull order statistics -> double-FFT
imaginary recursion -> inverse FFT -> rescale) on a Llama-8B-shaped MLP
weight matrix, end to end on the default JAX device (TPU under the driver).

vs_baseline: speedup over the reference algorithm's own runnable path here —
the torch-CPU implementation of the identical math (the reference does
per-op .to(device) CPU round-trips; its CUDA path does not exist on this
host, and its published device for the merge example is a single device).

Prints ONE JSON line: {"metric", "value" (GB/s), "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SHAPE = (4096, 8192)  # Llama-8B-scale 2-D weight (32M elements, 128 MiB fp32)
T = 0.6
CUTOFF_PCT = 0.08
CULL_PCT = 0.2
TARGET_NORM = 1.0


def bench_jax(a_np, b_np, iters=5):
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeated bench runs skip the TPU compile
    cache = Path("/tmp/shardmerge_xla_cache")
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from shardmerge_tpu.merge.fourier import _pair_slerp_rfft
    from shardmerge_tpu.ops import blend

    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)
    numel = a.size
    norm_a = float(jnp.linalg.norm(a))
    norm_b = float(jnp.linalg.norm(b))

    def chain(a, b, K):
        """K serially-dependent pair merges in ONE dispatch: isolates the
        per-merge device time from host/relay dispatch latency."""
        x = a
        out = None
        for _ in range(K):
            out, _, _ = _pair_slerp_rfft(
                x,
                b,
                jnp.float32(norm_a),
                jnp.float32(norm_b),
                jnp.float32(T),
                jnp.int32(blend.cutoff_rank(numel, CUTOFF_PCT)),
                jnp.int32(blend.cull_rank(numel, CULL_PCT)),
                jnp.int32(blend.cull_limit(numel, CULL_PCT)),
                jnp.float32(TARGET_NORM),
                use_cutoff=True,
                use_cull=True,
            )
            x = out
        return out

    import functools

    def timed(K, reps=6):
        # min-of-N: the relay's per-dispatch latency jitter (tens of ms) is
        # the same order as one merge, so an average over few reps can even
        # make the K=2 chain 'faster' than K=1 — the minimum is stable.
        fn = jax.jit(functools.partial(chain, K=K))
        out = fn(a, b)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            start = time.perf_counter()
            out = fn(a, b)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - start)
        return best, out

    t1, _ = timed(1)
    t2, _ = timed(2)
    per_merge = t2 - t1  # slope: dispatch overhead cancels
    if per_merge <= 0:
        # jitter still swamped the slope; the K=2 chain alone bounds it
        print(
            f"WARNING: non-positive slope (t1={t1*1e3:.1f} ms, "
            f"t2={t2*1e3:.1f} ms); using t2/2",
            file=sys.stderr,
        )
        per_merge = t2 / 2

    # --- fast-imag identity, pinned ON-DEVICE (VERDICT r2 #7) -------------
    # The rfft fast path rests on the analytic double-FFT identity
    # (merge/fourier.py module comment); its conformance is asserted on CPU
    # in the suite, but the TPU FFT is a different library path. Compare
    # _pair_slerp_rfft against the exact full-complex _pair_slerp on the
    # device each bench run so the identity's deviation class (2e-7 identity
    # + 2.6e-4 rfft symmetrization, NUMERICS.md §3) is driver-recorded.
    from shardmerge_tpu.merge.fourier import _pair_slerp

    common = (
        a,
        b,
        jnp.float32(norm_a),
        jnp.float32(norm_b),
        jnp.float32(T),
        jnp.int32(blend.cutoff_rank(numel, CUTOFF_PCT)),
        jnp.int32(blend.cull_rank(numel, CULL_PCT)),
        jnp.int32(blend.cull_limit(numel, CULL_PCT)),
        jnp.float32(TARGET_NORM),
    )
    fast_out, _, _ = _pair_slerp_rfft(*common, use_cutoff=True, use_cull=True)
    exact_out, _, _ = _pair_slerp(
        *common, use_cutoff=True, use_cull=True, fast_imag=False
    )
    import numpy as _np

    fast_np = _np.asarray(fast_out)
    exact_np = _np.asarray(exact_out)
    denom = max(float(_np.linalg.norm(exact_np)), 1e-12)
    fi_rel = float(_np.linalg.norm(fast_np - exact_np)) / denom
    # Bound: the two documented deviation classes plus threshold-flip
    # headroom at 32M elements (mask flips near the cutoff rank move single
    # elements; NUMERICS.md §4 measures the combined class at ~2.6e-4).
    if fi_rel > 2e-3:
        print(
            f"FAIL: fast-imag identity off-class on this device "
            f"(relL2 {fi_rel:.3e} > 2e-3 vs exact path)",
            file=sys.stderr,
        )
        sys.exit(1)
    print(
        f"fast-imag identity OK on-device: relL2 {fi_rel:.3e} vs exact "
        f"full-complex path (bound 2e-3)",
        file=sys.stderr,
    )
    # chain feeds x back in, so out4 != single-merge output; redo one clean
    single, _, _ = _pair_slerp_rfft(
        a,
        b,
        jnp.float32(norm_a),
        jnp.float32(norm_b),
        jnp.float32(T),
        jnp.int32(blend.cutoff_rank(numel, CUTOFF_PCT)),
        jnp.int32(blend.cull_rank(numel, CULL_PCT)),
        jnp.int32(blend.cull_limit(numel, CULL_PCT)),
        jnp.float32(TARGET_NORM),
        use_cutoff=True,
        use_cull=True,
    )
    return per_merge, single


def bench_torch_reference(a_np, b_np):
    """Reference-semantics pair merge on torch CPU (tests/oracle_torch).

    Methodology (VERDICT r2 #8): min-of-N, same as the JAX side. A single
    run on this one-core host swings ~2x with background load (r1 recorded
    vs_baseline 4422, r2 2534 from the same code); take the minimum of two
    runs and a third only if the first two disagree by >30%, so the
    driver-recorded ratio tracks the code, not the host. The remaining
    caveat is inherent: the reference's runnable path here is torch CPU on
    one core (its CUDA path does not exist on this host)."""
    import torch

    from tests import oracle_torch as oracle

    a = torch.from_numpy(a_np)
    b = torch.from_numpy(b_np)

    def one_run():
        start = time.perf_counter()
        merged, _, _ = oracle.merge_tensors_fft2_slerp(
            a, b, t=T, cutoff_pct=CUTOFF_PCT, cull_pct=CULL_PCT
        )
        return time.perf_counter() - start, merged * TARGET_NORM

    t_a, merged = one_run()
    t_b, _ = one_run()
    best = min(t_a, t_b)
    if abs(t_a - t_b) > 0.3 * best:
        t_c, _ = one_run()
        best = min(best, t_c)
    return best, merged


def _probe_device(
    timeout_s: float | None = None, attempts: int = 3, fallback_cpu: bool = False
) -> str:
    """Fail FAST (with retries) if the device backend is unreachable.

    The tunneled TPU's relay can die silently — jax.devices() or the first
    dispatch then blocks forever with no diagnostic — and it is FLAKY: it
    has been observed answering one probe and hanging the next. Probing in
    a subprocess with a deadline converts a hang (driver timeout-kill, no
    evidence) into an explicit failure; a few attempts ride out transient
    relay stalls.

    ``fallback_cpu=True`` (the bench's own mode): instead of exiting when
    every probe fails, force the CPU backend via the config API (env vars
    cannot override the host sitecustomize) and return "cpu_fallback" —
    a parity-checked bench labeled as non-TPU beats a round with no bench
    artifact at all. Returns "device" on a healthy probe.

    The probe itself is the ONE shared implementation in
    shardmerge_tpu/backend.py (the CLI's dead-backend defense uses it
    too); only the fallback/exit policy lives here."""
    from shardmerge_tpu.backend import _probe_default_backend

    if timeout_s is None:
        # Same knob resolve_backend honors: the relay's COLD compile of
        # even the tiny probe program is nonstationary (observed >180 s
        # on a live relay), so a fixed deadline misdiagnoses slow as dead.
        timeout_s = float(
            os.environ.get("SHARDMERGE_BACKEND_PROBE_TIMEOUT", "180")
        )
    platform = _probe_default_backend(timeout_s, attempts)
    if platform is not None:
        print(f"probe ok: {platform}", file=sys.stderr)
        return "device"
    if fallback_cpu:
        print(
            "WARN: TPU relay unreachable after "
            f"{attempts} probe attempts; falling back to the CPU backend. "
            "The reported value is NOT a TPU number (see 'platform' in the "
            "JSON).",
            file=sys.stderr,
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        return "cpu_fallback"
    print(
        f"FAIL: device backend unreachable after {attempts} probe attempts; "
        "refusing to hang",
        file=sys.stderr,
    )
    sys.exit(2)


def main():
    import numpy as np

    platform = _probe_device(fallback_cpu=True)
    rng = np.random.default_rng(0)
    a_np = rng.standard_normal(SHAPE).astype(np.float32)
    b_np = rng.standard_normal(SHAPE).astype(np.float32)

    jax_time, jax_out = bench_jax(a_np, b_np)
    torch_time, torch_out = bench_torch_reference(a_np, b_np)

    # Acceptance (NUMERICS.md §4, measured at this exact shape on CPU XLA):
    # the deviation from the torch oracle is dominated by fp32 global
    # reduction order + FFT-library rounding — relL2 2.7e-3 with thresholds
    # on, 2.2e-3 with them off (i.e. NOT threshold flips); the fast-imag
    # identity itself contributes 2e-7 and the rfft symmetrization 2.6e-4.
    # Assert that class with headroom for the TPU FFT differing from CPU
    # XLA's; anything structurally wrong (flipped masks, wrong thresholds,
    # missing rescale) lands orders of magnitude above these bounds.
    ours = np.asarray(jax_out)
    theirs = torch_out.numpy()
    out_norm = float(np.linalg.norm(theirs))
    rel_l2 = float(np.linalg.norm(ours - theirs)) / max(out_norm, 1e-12)
    rms = out_norm / np.sqrt(theirs.size)
    max_abs = float(np.abs(ours - theirs).max())
    if rel_l2 > 6e-3 or max_abs > 0.2 * rms:
        print(
            f"FAIL: parity outside the documented rounding class "
            f"(relL2 {rel_l2:.3e} > 6e-3 or maxabs {max_abs:.3e} > "
            f"{0.2 * rms:.3e})",
            file=sys.stderr,
        )
        sys.exit(1)
    print(
        f"parity OK: relL2 {rel_l2:.3e}, maxabs {max_abs:.3e} "
        f"(bounds 6e-3, {0.2 * rms:.3e})",
        file=sys.stderr,
    )

    # effective merge bandwidth: two fp32 inputs read + one written
    bytes_moved = 3 * a_np.nbytes
    gbps = bytes_moved / jax_time / 1e9
    vs_baseline = torch_time / jax_time

    line = {
        "metric": "fft_blend_pair_merge_gbps",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(vs_baseline, 2),
    }
    if platform != "device":
        # relay outage: this run measured the CPU backend, not the chip
        line["platform"] = platform
    print(json.dumps(line))


if __name__ == "__main__":
    main()
