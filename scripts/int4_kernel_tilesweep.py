"""Tile sweep for the fused int4 GEMV kernel (models/quant_kernels.py).

Motivation: at the default (512, 1024) tiles the kernel runs ~1.1 us per
grid step against a ~0.64 us HBM-ideal for the 512 KB q tile — per-step
overhead, not bandwidth, limits it to ~437-479 GB/s effective
(docs/QUANT_MATMUL.json int4_pallas). Larger tiles amortize that
overhead; this sweeps (TN, TKH) at the Llama-8B decode shapes with the
probe's min-of-reps slope methodology and prints one line per config.

Usage: python scripts/int4_kernel_tilesweep.py [--shape mlp_up]
       [--reps 5] [--scan-k 256]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from shardmerge_tpu.models import quant_kernels as qk

SHAPES = {
    "qkv": (4096, 4096),
    "mlp_up": (14336, 4096),
    "mlp_down": (4096, 14336),
    "lm_head": (128256, 4096),
}

TILES = [
    (512, 1024),  # current default
    (512, 2048),
    (1024, 1024),
    (1024, 2048),
    (2048, 512),
    (2048, 1024),
    (256, 2048),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="mlp_up")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scan-k", type=int, default=256)
    ap.add_argument(
        "--tiles",
        default=None,
        help="comma-separated TNxTKH list, e.g. 1024x1024,512x2048 "
        "(default: the built-in sweep list)",
    )
    ap.add_argument(
        "--check-agreement",
        action="store_true",
        help="also compute the kernel's relative L2 error vs the XLA "
        "split-half path at each tile (value-agreement pin)",
    )
    args = ap.parse_args()
    tiles = TILES
    if args.tiles:
        tiles = [
            tuple(int(v) for v in spec.split("x"))
            for spec in args.tiles.split(",")
        ]
    n, k = SHAPES[args.shape]
    kh = k // 2
    key = jax.random.PRNGKey(0)
    q = jax.jit(
        lambda: jax.random.randint(key, (n, kh), 0, 255, jnp.int32).astype(
            jnp.uint8
        )
    )()
    scale = jax.jit(lambda: jnp.full((n, 1), 0.01, jnp.float32))()
    x = jax.jit(lambda: jax.random.normal(key, (1, k), jnp.bfloat16))()
    print(f"shape {args.shape} N={n} K={k}", flush=True)

    orig_tiles = qk._tiles
    for tn, tkh in tiles:
        if n % tn or kh % tkh:
            print(f"TN={tn} TKH={tkh}: skip (indivisible)", flush=True)
            continue
        qk._tiles = lambda _n, _kh, _t=(tn, tkh): _t

        sk = args.scan_k

        @jax.jit
        def run_k(x, q, scale):
            def body(c, _):
                y = qk.int4_matmul(c, q, scale)
                bump = (jnp.sum(y[:1, :1]) * 0).astype(c.dtype)
                return c + bump, None

            o, _ = jax.lax.scan(body, x, None, length=sk)
            return jnp.sum(o)

        @jax.jit
        def run_1(x, q, scale):
            return jnp.sum(qk.int4_matmul(x, q, scale))

        try:
            float(run_k(x, q, scale))
            float(run_1(x, q, scale))

            def best(fn):
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    float(fn(x, q, scale))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            ms = (best(run_k) - best(run_1)) / (sk - 1) * 1e3
            gbps = (n * kh) / ms / 1e6
            agree = ""
            if args.check_agreement:
                import numpy as np

                from shardmerge_tpu.models import quant

                wq = {"q": q, "scale": scale}
                y_kernel = np.asarray(
                    jax.jit(qk.int4_matmul)(x, q, scale), np.float64
                )
                with quant.suppress_int4_kernel():
                    y_xla = np.asarray(
                        jax.jit(quant.dequant_matmul)(x, wq), np.float64
                    )
                rel = np.linalg.norm(y_kernel - y_xla) / (
                    np.linalg.norm(y_xla) + 1e-30
                )
                agree = f"  relL2 {rel:.3e}"
            print(
                f"TN={tn} TKH={tkh}: {ms:.4f} ms  {gbps:.0f} GB/s{agree}",
                flush=True,
            )
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"[:140].replace("\n", " ")
            print(f"TN={tn} TKH={tkh}: FAIL {msg}", flush=True)
        finally:
            qk._tiles = orig_tiles


if __name__ == "__main__":
    main()
