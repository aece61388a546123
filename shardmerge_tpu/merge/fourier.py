"""Fast Fourier merge engine — the default merger (CLI `merge`).

Parity surface: reference shard/merge/fast_fourier.py:79-276 (the module the
reference CLI imports, __main__.py:22). Behavior reproduced:

- input/output passthrough with base-model fallback (:104-130)
- per-layer model gating via use_layer_index (:135)
- deltas computed WITHOUT alpha; alphas only weight the pair interpolation
  (:147-158, base.py get_delta apply_alpha=False)
- target_norm = mean(delta norms) + offset (:165)
- pairwise reduction pairing by the norm-product pseudo-correlation built
  from the ORIGINAL delta norms indexed by current stack position — the
  norms list is never updated across rounds (REF-QUIRK :178-186)
- three merge regimes per pair (:223-244) with the pair ordered by fresh
  norms (:209-215), cutoff_pct=0.08 hardcoded at the call site (:239),
  cull_pct halving per round (:254)
- merged stack entries named name_hash(a_b) (:36-41,246), weight = mean (:248)
- final: base + delta, NaN->0, Inf raises, hardcoded bfloat16 (:269-276)

TPU redesign (same numbers, different machinery):
- stack entries stay resident in HBM instead of a disk cache
  (TensorDiskCache, :46-77, cleared per layer :132): the working set of a
  70B layer (N deltas + complex64 intermediates) fits v5e-class HBM
- one host sync per reduction round (batched stack norms) instead of two
  device round-trips per pair; Inf checks are accumulated as device flags
  and raised once per tensor
- the spectral kernels are the jitted ops in shardmerge_tpu.ops.blend
"""

from __future__ import annotations

import asyncio
import hashlib
import logging
from functools import lru_cache, partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MergeConfig
from ..constants import INPUT_LAYER, OUTPUT_LAYER
from ..io.writer import ShardLayer
from ..ops import blend
from ..ops.pairing import correlated_pairs, norm_product_matrix
from .base import MergeTensorsBase

logger = logging.getLogger(__name__)


def name_hash(name: str) -> str:
    """Parity: fast_fourier.py:36-41."""
    subnames = [n[:4] for n in name.split("_")]
    return "_".join(subnames) + "::" + hashlib.sha256(name.encode()).hexdigest()[:8]


def clamp(value: float, min_value: float, max_value: float) -> float:
    """Parity: fast_fourier.py:43-44."""
    return max(min_value, min(value, max_value))


# --- jitted pair kernels ----------------------------------------------------

@jax.jit
def _pair_add(a, b):
    """Regime (a): cnorm_a < 1e-6 -> plain sum (fast_fourier.py:223-225)."""
    return a + b


# --- the analytic double-FFT identity ("fast imag") -------------------------
#
# For real spatial input x with F = FFT2(x):  FFT2(Im F) = i*(MN/2)*(x[m] -
# x[-m]) — PURELY imaginary. The reference's imaginary recursion
# (functions.py:152-158) therefore blends real parts that are only FFT
# rounding noise, passes the meaningful data through inner.imag =
# Im(FFT2(Im F0)), and analytically its output reduces to res_imag == Im F0
# exactly (IFFT2(i*(MN/2)*odd(x)).real == Im F0). Setting interp_imag=False
# computes exactly that passthrough, eliminating 3 of the 6 FFTs per pair
# merge. For large 2-D tensors the deviation from the reference is the noise
# term, ~1e-6 relative — far below the bf16 output quantization.
#
# CAVEAT (why this is gated by _FAST_IMAG_MIN_NUMEL and ndim>=2): when the
# imag-plane values round to EXACT zeros (deterministically for inputs whose
# FFT is purely real, e.g. even-symmetric signals; library-dependently for
# random small/1-D tensors — measured: XLA's 1-D fft cascades a random (16,)
# pair, pocketfft does not) the reference's inner slerp divides 0/0, the NaN
# spreads through the inverse FFT, and functions.py:211-213 scrubs MOST of
# the merged tensor to zero (14/16 lanes in the pinned case,
# tests/test_ops_blend.py::test_nan_cascade_quirk_pinned, bit-identical
# between the torch oracle and our exact path). The fast path would instead
# produce the clean result, so it is only used where rounding noise is
# guaranteed nonzero and negligible. ``exact_imag=True`` forces the literal
# noise-reproducing path everywhere.

_FAST_IMAG_MIN_NUMEL = 1 << 20


def _use_fast_imag(exact_imag: bool, arr) -> bool:
    return (not exact_imag) and arr.ndim >= 2 and arr.size >= _FAST_IMAG_MIN_NUMEL

@partial(jax.jit, static_argnames=("fast_imag",))
def _pair_arith(a, b, norm_scale, weight_scale, *, fast_imag=False):
    """Regime (b): rescale a to target_norm, scale b by the weight ratio,
    sign-agreement FFT arithmetic with t=1 (fast_fourier.py:226-232)."""
    scaled_a = a * norm_scale
    scaled_b = b * weight_scale * norm_scale
    fft_v0 = blend.fft2(scaled_a)
    fft_v1 = blend.fft2(scaled_b)
    out = blend.arithmetic_fft_components(
        fft_v0, fft_v1, jnp.float32(1.0), agreement=True, do_imag=not fast_imag
    )
    return blend.ifft2_real(out)


@partial(jax.jit, static_argnames=("use_cutoff", "use_cull", "fast_imag"))
def _pair_slerp(
    a,
    b,
    norm_a,
    norm_b,
    t,
    cutoff_k,
    cull_k,
    cull_count_limit,
    target_norm,
    *,
    use_cutoff,
    use_cull,
    fast_imag=False,
):
    """Regime (c): normalized SLERP-FFT blend, rescaled to target_norm
    (fast_fourier.py:233-244 -> functions.py:164-221). NaNs are scrubbed
    before rescale exactly as the reference does; Inf is reported as a flag
    (the engine raises once per tensor). ``fast_imag`` applies the analytic
    double-FFT identity (see module comment above _pair_arith)."""
    v0n = a / norm_a
    v1n = b / norm_b
    fft_v0 = blend.fft2(v0n)
    fft_v1 = blend.fft2(v1n)
    result_fft = blend.interpolate_fft_components(
        fft_v0,
        fft_v1,
        t,
        jnp.float32(1.0),  # t_sum=1.0 (fast_fourier.py:238)
        cutoff_k,
        cull_k,
        cull_count_limit,
        use_cutoff=use_cutoff,
        use_cull=use_cull,
        interp_imag=not fast_imag,
    )
    merged = blend.ifft2_real(result_fft)
    nan_count = jnp.sum(jnp.isnan(merged).astype(jnp.int32))
    merged = jnp.where(jnp.isnan(merged), 0.0, merged)
    has_inf = jnp.any(jnp.isinf(merged))
    return merged * target_norm, nan_count, has_inf


# --- rfft fast path ----------------------------------------------------------
#
# With fast-imag active, every FFT input is real and the blended spectrum is
# Hermitian, so the whole pair merge runs on the rfft half spectrum: half
# the FFT work, half the blend/select memory traffic. Reductions weight each
# column by its Hermitian multiplicity (ops/blend.py interpolate_half_spectrum),
# reproducing the full-spectrum numbers exactly (up to the same symmetrized
# rounding class as the fast-imag identity itself).

@partial(jax.jit, static_argnames=("use_cutoff", "use_cull"))
def _pair_slerp_rfft(
    a,
    b,
    norm_a,
    norm_b,
    t,
    cutoff_k,
    cull_k,
    cull_count_limit,
    target_norm,
    *,
    use_cutoff,
    use_cull,
):
    # Normalize in the SPECTRAL domain (FFT linearity): the 1/norm scale
    # fuses into the blend's first read instead of costing a full pre-FFT
    # memory pass per input. Scaling after vs before the FFT differs only in
    # rounding order — the same class as the fast-imag identity this kernel
    # already assumes. Forward variants measured end-to-end on v5e and
    # REJECTED: a stacked batched rfftn over both inputs (33.8 ms/merge vs
    # 24.2 — XLA's batched FFT path degrades) and a packed complex FFT
    # (z = a+ib) with Hermitian unpack (28.6 ms/merge — the full-spectrum
    # flip/roll gather of the unpack costs more than the saved transform;
    # an isolated probe of it looked 15% faster only because XLA dead-code
    # eliminated the unpack when just one element was consumed).
    h0 = jnp.fft.rfftn(a, axes=(-2, -1)) * (1.0 / norm_a)
    h1 = jnp.fft.rfftn(b, axes=(-2, -1)) * (1.0 / norm_b)
    col_w = jnp.asarray(blend.hermitian_col_weights(a.shape[-1]))
    result = blend.interpolate_half_spectrum(
        h0,
        h1,
        t,
        jnp.float32(1.0),
        cutoff_k,
        cull_k,
        cull_count_limit,
        col_w,
        use_cutoff=use_cutoff,
        use_cull=use_cull,
    )
    merged = jnp.fft.irfftn(result, s=a.shape[-2:], axes=(-2, -1))
    nan_count = jnp.sum(jnp.isnan(merged).astype(jnp.int32))
    merged = jnp.where(jnp.isnan(merged), 0.0, merged)
    has_inf = jnp.any(jnp.isinf(merged))
    return merged * target_norm, nan_count, has_inf


@jax.jit
def _pair_lowratio_rfft(a, b, norm_a, norm_b, t, target_norm):
    h = jnp.fft.rfftn(a / norm_a, axes=(-2, -1)) + t * jnp.fft.rfftn(
        b / norm_b, axes=(-2, -1)
    )
    merged = jnp.fft.irfftn(h, s=a.shape[-2:], axes=(-2, -1))
    nan_count = jnp.sum(jnp.isnan(merged).astype(jnp.int32))
    merged = jnp.where(jnp.isnan(merged), 0.0, merged)
    has_inf = jnp.any(jnp.isinf(merged))
    return merged * target_norm, nan_count, has_inf


@jax.jit
def _pair_arith_rfft(a, b, norm_scale, weight_scale):
    h0 = jnp.fft.rfftn(a * norm_scale, axes=(-2, -1))
    h1 = jnp.fft.rfftn(b * weight_scale * norm_scale, axes=(-2, -1))
    r0, r1 = h0.real, h1.real
    sign_mask = jnp.sign(r0) == jnp.sign(r1)
    # REF-QUIRK functions.py:282-284: disagreement lanes take v1
    res_real = jnp.where(sign_mask, r0 + r1, r1)  # t=1
    out = jax.lax.complex(res_real, h0.imag)
    return jnp.fft.irfftn(out, s=a.shape[-2:], axes=(-2, -1))


@jax.jit
def _pair_lowratio(a, b, norm_a, norm_b, t, target_norm):
    """Regime (c) when norm ratio < b=0.1 inside merge_tensors_fft2_slerp
    (functions.py:199-202): additive FFT path."""
    merged = blend.ifft2_real(blend.fft2(a / norm_a) + t * blend.fft2(b / norm_b))
    nan_count = jnp.sum(jnp.isnan(merged).astype(jnp.int32))
    merged = jnp.where(jnp.isnan(merged), 0.0, merged)
    has_inf = jnp.any(jnp.isinf(merged))
    return merged * target_norm, nan_count, has_inf


# --- fully fused per-tensor merges -------------------------------------------
#
# For the dominant configs (base + 1 or 2 finetunes, single device) the whole
# tensor merge runs as ONE dispatch: deltas, norms, target norm, the
# reference's regime selection (in-graph via lax.switch on traced scalars),
# the spectral blend, and the final base+delta/NaN/bf16 step. No host syncs
# inside a tensor, a single compile per shape, and the device queue streams
# across tensors. The engine falls back to the stepwise path for >2 models,
# meshes, and spill mode.

@jax.jit
def _fused_single(out_base, ft_base, ft):
    """One finetune: delta reduction degenerates to
    out_base + (ft - ft_base). The delta is computed against the MODEL's own
    base (reference base.py:121-137) and applied onto the output base; alpha
    is NOT applied (reference apply_alpha=False)."""
    out32 = out_base.astype(jnp.float32)
    delta = ft.astype(jnp.float32) - ft_base.astype(jnp.float32)
    return _finalize(out32, delta)


@partial(jax.jit, static_argnames=("use_cull", "fast_imag"))
def _fused_pair(
    base,
    ft1_base,
    ft1,
    ft2_base,
    ft2,
    alpha1,
    alpha2,
    target_norm_offset,
    cutoff_k,
    cull_k,
    cull_count_limit,
    *,
    use_cull,
    fast_imag,
):
    """Two finetunes: the full fast_fourier._merge_layer reduction for a
    2-entry stack (one pairing round), in-graph. Each delta is computed
    against its model's own base (reference base.py:121-137); the blended
    delta lands on the output base.

    Returns (bf16 result, nan_count, has_inf flag, regime index) — regime for
    stats: 0=add, 1=arith, 2=slerp-early-return, 3=slerp-lowratio,
    4=slerp-full. nan_count is the number of NaNs scrubbed from the pair
    merge's ifft output (reference functions.py:211-213 logs it).
    """
    base32 = base.astype(jnp.float32)
    d1 = ft1.astype(jnp.float32) - ft1_base.astype(jnp.float32)
    d2 = ft2.astype(jnp.float32) - ft2_base.astype(jnp.float32)
    n1 = jnp.linalg.norm(d1.ravel())
    n2 = jnp.linalg.norm(d2.ravel())
    # target_norm = fp32 mean of delta norms + offset (fast_fourier.py:165)
    target_norm = (n1 + n2) / 2.0 + target_norm_offset

    # order the pair by norm; weights stay positional (REF-QUIRK: the
    # reference never swaps a_weight/b_weight with the tensors)
    swap = jnp.abs(n1) < jnp.abs(n2)
    a = jnp.where(swap, d2, d1)
    b = jnp.where(swap, d1, d2)
    norm_a = jnp.where(swap, n2, n1)
    norm_b = jnp.where(swap, n1, n2)
    a_weight, b_weight = alpha1, alpha2

    cnorm_a = jnp.abs(norm_a / target_norm)
    cnorm_b = jnp.abs(norm_b / target_norm)
    n_ratio = cnorm_b / (cnorm_a + 1e-10)
    ratio = norm_b / (norm_a + 1e-10)
    a_prop = a_weight / (a_weight + b_weight)

    regime = jnp.where(
        cnorm_a < 1e-6,
        0,
        jnp.where(
            (cnorm_b < 1e-6) | (n_ratio < 0.1),
            1,
            jnp.where(
                (norm_b < 1e-4) | (norm_a < 1e-4),
                2,
                jnp.where(ratio < 0.1, 3, 4),
            ),
        ),
    )

    zero = jnp.int32(0)

    def br_add(a, b):
        return a + b, zero, jnp.asarray(False)

    def br_arith(a, b):
        norm_scale = target_norm / norm_a
        weight_scale = b_weight / (a_weight + 1e-10)
        if fast_imag:
            out = _pair_arith_rfft.__wrapped__(a, b, norm_scale, weight_scale)
        else:
            out = _pair_arith.__wrapped__(
                a, b, norm_scale, weight_scale, fast_imag=False
            )
        return out, zero, jnp.asarray(False)

    def br_early(a, b):
        del b
        return (a / norm_a) * target_norm, zero, jnp.asarray(False)

    def br_lowratio(a, b):
        fn = _pair_lowratio_rfft if fast_imag else _pair_lowratio
        return fn.__wrapped__(a, b, norm_a, norm_b, a_prop, target_norm)

    def br_slerp(a, b):
        if fast_imag:
            return _pair_slerp_rfft.__wrapped__(
                a, b, norm_a, norm_b, a_prop,
                cutoff_k, cull_k, cull_count_limit, target_norm,
                use_cutoff=True, use_cull=use_cull,
            )
        return _pair_slerp.__wrapped__(
            a, b, norm_a, norm_b, a_prop,
            cutoff_k, cull_k, cull_count_limit, target_norm,
            use_cutoff=True, use_cull=use_cull, fast_imag=False,
        )

    merged, nan_count, pair_inf = jax.lax.switch(
        regime, [br_add, br_arith, br_early, br_lowratio, br_slerp], a, b
    )
    out, final_inf = _finalize.__wrapped__(base32, merged)
    return out, nan_count, pair_inf | final_inf, regime


# --- batched round kernels ----------------------------------------------------
#
# For >2-model merges, every reduction round's pairs are independent and share
# a shape, so each regime group dispatches as ONE vmapped kernel over a
# leading pair axis (one XLA program per round per regime instead of one per
# pair). The kernels also return each merged entry's norm, so the next
# round's regime selection costs a single batched host fetch instead of one
# sync per merged entry.

@lru_cache(maxsize=None)
def _batched_kernel(regime: str, use_cull: bool = True, fast_imag: bool = True):
    def with_norm3(fn):
        def one(a, b, *scalars):
            m, nan, inf = fn(a, b, *scalars)
            return m, jnp.linalg.norm(m.ravel()), nan, inf

        return one

    if regime == "slerp":
        if fast_imag:
            base = partial(
                _pair_slerp_rfft.__wrapped__, use_cutoff=True, use_cull=use_cull
            )
        else:
            base = partial(
                _pair_slerp.__wrapped__,
                use_cutoff=True,
                use_cull=use_cull,
                fast_imag=False,
            )
        # (a, b, norm_a, norm_b, t) vary per pair; ranks/target_norm shared
        return jax.jit(
            jax.vmap(with_norm3(base), in_axes=(0, 0, 0, 0, 0, None, None, None, None))
        )
    if regime == "lowratio":
        base = (_pair_lowratio_rfft if fast_imag else _pair_lowratio).__wrapped__
        return jax.jit(jax.vmap(with_norm3(base), in_axes=(0, 0, 0, 0, 0, None)))
    if regime == "arith":
        if fast_imag:
            def one(a, b, norm_scale, weight_scale):
                m = _pair_arith_rfft.__wrapped__(a, b, norm_scale, weight_scale)
                return m, jnp.linalg.norm(m.ravel())
        else:
            def one(a, b, norm_scale, weight_scale):
                m = _pair_arith.__wrapped__(
                    a, b, norm_scale, weight_scale, fast_imag=False
                )
                return m, jnp.linalg.norm(m.ravel())
        return jax.jit(jax.vmap(one))
    if regime == "add":
        def one(a, b):
            m = a + b
            return m, jnp.linalg.norm(m.ravel())
        return jax.jit(jax.vmap(one))
    raise ValueError(regime)


@jax.jit
def _finalize(base_fp32, delta):
    """base + delta, NaN->0, Inf flag, bfloat16 (fast_fourier.py:269-276)."""
    result = base_fp32 + delta
    result = jnp.where(jnp.isnan(result), 0.0, result)
    has_inf = jnp.any(jnp.isinf(result))
    return result.astype(jnp.bfloat16), has_inf


def _batched_norms(arrays: List[jnp.ndarray]) -> List[float]:
    """Norms of a list of same-shaped arrays with a single host sync."""
    norms = jax.jit(lambda xs: [jnp.linalg.norm(x.ravel()) for x in xs])(arrays)
    return [float(n) for n in norms]


class FourierMerge(MergeTensorsBase):
    def __init__(
        self,
        config: MergeConfig,
        task_add_models: Optional[List[str]] = None,
        target_norm_offset: float = 1e-10,
        cull_start_pct: float = 0.20,
        index_manager=None,
        exact_imag: bool = False,
        mesh=None,
        shard_min_bytes: int = 1 << 30,
        **kwargs,
    ):
        super().__init__(config, index_manager, **kwargs)
        self.task_add_models = task_add_models or []
        self.target_norm_offset = target_norm_offset
        self.cull_start_pct = cull_start_pct
        # exact_imag=True reproduces the reference's literal double-FFT noise
        # path (6 FFTs/pair) instead of the analytic identity (3 FFTs/pair,
        # ~1e-6 relative deviation; see _pair_arith module comment).
        self.exact_imag = exact_imag
        # With a mesh, 2-D tensors of >= shard_min_bytes are row-sharded over
        # it and merged with the distributed-FFT kernels (parallel/merge.py):
        # a 70B layer's working set (fp32 delta stack + complex64 FFT
        # intermediates) need not fit one chip's HBM.
        self.mesh = mesh
        self.shard_min_bytes = shard_min_bytes
        self._deferred_checks = []
        # Optional HBM budget for the delta stack: above it, stack entries
        # spill to host RAM between pair merges (the reference spills every
        # entry to a DISK cache, fast_fourier.py:46-77; host RAM is the TPU
        # analogue — one device_put per reuse instead of a file read).
        self.hbm_budget_bytes = kwargs.get("hbm_budget_bytes")
        # One vmapped dispatch per regime per reduction round (>2-model
        # merges). Default OFF: measured on v5e, a k=2 vmapped slerp batch
        # runs 134.7 ms vs 95.7 ms for two sequential dispatches — XLA's
        # TPU FFT degrades under a batch dimension (same pathology as the
        # stacked-rfftn probe, BASELINE.md), and dispatches are async so
        # relay latency pipelines anyway. The <=1-host-sync-per-round norm
        # batching is independent and always on. batch_rounds=True remains
        # available (bit-identical outputs; tests assert it).
        self.batch_rounds = kwargs.get("batch_rounds", False)

    def _sharding_for(self, host):
        if self.mesh is None or host.ndim < 2:
            return None
        # Two triggers: the opt-in byte threshold, OR the huge-tensor
        # working-set bound (base._device_for) — a tensor too big to merge
        # on one chip must shard over the mesh, not fall back to host CPU.
        if (
            host.nbytes < self.shard_min_bytes
            and host.size < self.huge_tensor_numel
        ):
            return None
        if host.ndim >= 3:
            # ndim>=3 (fused MoE expert stacks — Llama-4's gate_up is
            # (E, hidden, 2I), multi-GB at Scout scale): the FFT runs over
            # the LAST TWO dims per leading slice (reference fftn
            # dim=(-2,-1)), so sharding the LEADING dim makes every FFT
            # device-local — no all-to-all at all; only the global
            # reductions (norms, dots, order-statistic counts) become
            # all-reduces, which GSPMD inserts from the sharding on the
            # ordinary single-device kernels (_dispatch_pair's unsharded
            # branch — the SPMD partitioner computes identical math).
            # Leading dims that do not divide the mesh fall back: zero-pad
            # slices would enter the GLOBAL percentile ranks, unlike the
            # 2-D row pad whose rows are excluded spectrally.
            if host.shape[0] % self.mesh.devices.size != 0:
                logger.info(
                    "3-D tensor leading dim %d does not divide the %d-device "
                    "mesh; not sharding",
                    host.shape[0],
                    self.mesh.devices.size,
                )
                return None
            from jax.sharding import NamedSharding, PartitionSpec

            return NamedSharding(
                self.mesh,
                PartitionSpec("x", *([None] * (host.ndim - 1))),
            )
        # the all-to-all transpose splits the LAST dim over the mesh:
        # columns must divide it (rows may be zero-padded, see
        # _pad_rows_for) — otherwise fall back to a single device
        if host.shape[-1] % self.mesh.devices.size != 0:
            return None
        from ..parallel.merge import row_sharding

        return row_sharding(self.mesh)

    def _pad_rows_for(self, host, sharding) -> int:
        # Row counts that do not divide the mesh are zero-padded up to the
        # next multiple; the distributed-FFT kernels slice the padding off
        # after the all-to-all so every spectral op sees the true tensor
        # (parallel/fft2d.py), and _merge_layer slices the final rows.
        # ndim>=3 tensors never pad (divisibility enforced in _sharding_for).
        if host.ndim != 2:
            return 0
        n_dev = self.mesh.devices.size
        rem = host.shape[0] % n_dev
        return n_dev - rem if rem else 0

    def _is_sharded(self, arr) -> bool:
        return (
            self.mesh is not None
            and arr.ndim == 2
            and not arr.sharding.is_fully_replicated
            and len(arr.sharding.device_set) > 1
        )

    def get_readme(self) -> str:
        models = "\n".join(
            f"- {m.model} (vs {m.base})" for m in self.config.finetune_merge
        )
        return f"""# SLERP-FFT Merged Model
Base: {self.config.output_base_model}
Models merged:
{models}
"""

    # input/output passthrough (fast_fourier.py:104-130) is inherited from
    # MergeTensorsBase._passthrough

    async def _merge_layer(self, shard_layer: ShardLayer) -> np.ndarray:
        if shard_layer.layer_number == INPUT_LAYER:
            self.stats.tensors_passthrough += 1
            return await self._passthrough(shard_layer, "input")
        if shard_layer.layer_number == OUTPUT_LAYER:
            self.stats.tensors_passthrough += 1
            return await self._passthrough(shard_layer, "output")

        models = [
            m
            for m in self.config.finetune_merge
            if m.use_layer_index(shard_layer.layer_number)
        ]

        # Warm all shards concurrently (fast_fourier.py:143-145).
        await asyncio.gather(
            *[
                self.index_manager.preload_tensor(m.model, shard_layer.layer_name)
                for m in models
            ]
        )

        # Fast path: base + 1/2 finetunes on a single device fuses the whole
        # tensor merge into one dispatch (see _fused_pair).
        if (
            0 < len(models) <= 2
            and self.mesh is None
            and self.hbm_budget_bytes is None
        ):
            return await self._merge_layer_fused(shard_layer, models)

        # Build the HBM-resident delta stack.
        cache: Dict[str, jnp.ndarray] = {}
        layer_stack: List[str] = []
        stack_weights: List[float] = []
        deltas: List[jnp.ndarray] = []
        for model in models:
            delta_list = await self.get_delta_for_models(
                [model], shard_layer, apply_alpha=False
            )
            if not delta_list:
                continue
            cache[model.model] = delta_list[0]
            deltas.append(delta_list[0])
            layer_stack.append(model.model)
            stack_weights.append(model.alpha)

        if not layer_stack:
            # The reference crashes here (fast_fourier.py:256 IndexError when
            # every model is layer-gated out); passing the base through is the
            # only sensible semantic. Documented deviation.
            logger.warning(
                "No models cover layer %s; passing base through",
                shard_layer.layer_name,
            )
            base = await self.get_base_output_tensor(shard_layer)
            return np.asarray(base.astype(jnp.bfloat16))

        layer_norms = _batched_norms(deltas)  # one host sync
        del deltas
        logger.debug("Loaded %d layers", len(layer_stack))

        # Per-entry norms tracked incrementally: initial delta norms are host
        # floats; merged entries get a lazy device scalar computed while the
        # result is still resident (no stack re-read per round).
        norms_by_name: Dict[str, object] = dict(zip(layer_stack, layer_norms))

        def _in_hbm(v) -> bool:
            """True for device arrays on the accelerator (CPU-backend
            arrays — small/huge-tensor routing — are already host RAM)."""
            if isinstance(v, np.ndarray):
                return False
            try:
                return all(d.platform != "cpu" for d in v.devices())
            except Exception:
                return True

        def cache_put(name: str, value, norm=None):
            norms_by_name[name] = (
                norm if norm is not None else jnp.linalg.norm(value.ravel())
            )
            cache[name] = value
            if self.hbm_budget_bytes is not None:
                resident = {n: v for n, v in cache.items() if _in_hbm(v)}
                if sum(v.nbytes for v in resident.values()) > self.hbm_budget_bytes:
                    for n, v in resident.items():
                        cache[n] = np.asarray(v)  # spill to host RAM
                    self.stats.hbm_spills += len(resident)
                    logger.info(
                        "HBM budget exceeded: spilled %d stack entries "
                        "(%.2f GiB) to host RAM",
                        len(resident),
                        sum(v.nbytes for v in resident.values()) / 2**30,
                    )

        def cache_get(name: str):
            value = cache[name]
            if isinstance(value, np.ndarray):
                sharding = self._sharding_for(value)
                if sharding:
                    value = jax.device_put(value, sharding)
                else:
                    # honor the size-based placement policy on re-upload:
                    # huge spilled tensors must come back to the CPU
                    # backend, not the accelerator they cannot fit on
                    device = self._device_for(value)
                    value = (
                        jax.device_put(value, device)
                        if device
                        else jax.device_put(value)
                    )
            return value

        if self.hbm_budget_bytes is not None:
            for n in list(cache):
                cache_put(n, cache[n])

        # target_norm = mean of ORIGINAL delta norms + offset (:165)
        target_norm = (
            float(np.mean(np.asarray(layer_norms, dtype=np.float32)))
            + self.target_norm_offset
        )
        cull_pct = self.cull_start_pct
        inf_flags = []
        nan_counts = []

        # Batched rounds engage off-mesh with no host-RAM spill: every
        # entry is a resident device array of identical shape.
        can_batch = (
            self.batch_rounds
            and self.mesh is None
            and self.hbm_budget_bytes is None
        )
        fast_imag = _use_fast_imag(self.exact_imag, next(iter(cache.values())))

        while len(layer_stack) > 1:
            layer_names = list(layer_stack)
            next_stack: List[str] = []
            next_weights: List[float] = []
            logger.info(
                "Processing %d layers : %s", len(layer_stack), ", ".join(layer_names)
            )

            # REF-QUIRK fast_fourier.py:178-186: the pairing matrix uses the
            # ORIGINAL first-round delta norms indexed by the *current* stack
            # position — it is never recomputed from the merged tensors.
            correlation = norm_product_matrix(layer_norms[: len(layer_stack)])

            # Fresh norms of the current stack (regime selection): floats for
            # first-round deltas; merged entries' device-scalar norms are
            # fetched in ONE batched sync per round (VERDICT r1 #4 — the
            # per-entry float(v) serialized the device queue at ~24 ms relay
            # latency per sync on the axon host).
            pending_norms = [
                n for n in layer_stack if not isinstance(norms_by_name[n], float)
            ]
            if pending_norms:
                fetched = np.asarray(
                    jnp.stack([norms_by_name[n] for n in pending_norms])
                )
                for n, v in zip(pending_norms, fetched):
                    norms_by_name[n] = float(v)
                self.stats.host_syncs += 1
            current_norms = [norms_by_name[n] for n in layer_stack]

            # --- Phase 1 (host): plan the round — pair, order, regime ------
            jobs = []  # (regime, a_model, b_model, out_name, params, log_args)
            for x, y, _corr in correlated_pairs(correlation, way="least"):
                if y < 0:
                    next_stack.append(layer_stack[x])
                    next_weights.append(stack_weights[x])
                    continue

                a_model, b_model = layer_stack[x], layer_stack[y]
                a_weight, b_weight = stack_weights[x], stack_weights[y]
                norm_a, norm_b = current_norms[x], current_norms[y]

                # order the pair by norm (fast_fourier.py:212-215); weights
                # stay positional (REF-QUIRK: never swapped with the tensors)
                if abs(norm_a) < abs(norm_b):
                    a_model, b_model = b_model, a_model
                    norm_a, norm_b = norm_b, norm_a

                cnorm_a = abs(norm_a / target_norm)
                cnorm_b = abs(norm_b / target_norm)
                n_ratio = cnorm_b / (cnorm_a + 1e-10)

                if cnorm_a < 1e-6:
                    regime, params = "add", ()
                elif cnorm_b < 1e-6 or n_ratio < 0.1:
                    regime = "arith"
                    params = (target_norm / norm_a, b_weight / (a_weight + 1e-10))
                else:
                    a_prop = a_weight / (a_weight + b_weight)
                    # merge_tensors_fft2_slerp with cutoff_pct=0.08,
                    # t_sum=1.0 (:233-244); norms >= 1e-6*target_norm here so
                    # the <1e-4 early-returns of functions.py:184-190 can
                    # still fire for tiny target_norm — honor them.
                    if norm_b < 1e-4 or norm_a < 1e-4:
                        regime, params = "early", (norm_a,)
                    elif norm_b / (norm_a + 1e-10) < 0.1:
                        regime, params = "lowratio", (norm_a, norm_b, a_prop)
                    else:
                        regime, params = "slerp", (norm_a, norm_b, a_prop)

                name = name_hash(f"{a_model}_{b_model}")
                next_stack.append(name)
                next_weights.append((a_weight + b_weight) / 2.0)
                jobs.append((regime, a_model, b_model, name, params))

            # --- Phase 2: dispatch ------------------------------------------
            groups: Dict[str, list] = {}
            for job in jobs:
                groups.setdefault(job[0], []).append(job)

            for regime, group in groups.items():
                if can_batch and len(group) >= 2 and regime != "early":
                    self._dispatch_round_batch(
                        regime, group, cache, cache_put, target_norm, cull_pct,
                        fast_imag, inf_flags, nan_counts,
                    )
                else:
                    for job in group:
                        self._dispatch_pair(
                            job, cache_get, cache_put, target_norm, cull_pct,
                            inf_flags, nan_counts,
                            true_m=self._true_rows.get(shard_layer.layer_name),
                        )
                for _, a_model, b_model, _, _ in group:
                    self.stats.record_pair(
                        "arith" if regime == "arith"
                        else "add" if regime == "add"
                        else "slerp"
                    )
                    logger.info(
                        "%s merged %s and %s",
                        regime.upper(),
                        a_model,
                        b_model,
                    )

            # free consumed operands (keeps HBM bounded by stack width)
            consumed = {m for _, a, b, _, _ in jobs for m in (a, b)}
            for name in consumed:
                cache.pop(name, None)
                norms_by_name.pop(name, None)

            layer_stack = next_stack
            stack_weights = next_weights
            cull_pct = cull_pct / 2.0  # reduce cull as we merge deeper (:254)

        result_tensor = cache_get(layer_stack[0])
        base = await self.get_base_output_tensor(shard_layer)
        out, final_inf = _finalize(base, result_tensor)
        true_rows = self._true_rows.get(shard_layer.layer_name)
        if true_rows is not None and out.shape[0] != true_rows:
            out = out[:true_rows]  # drop the sharding pad rows (all zeros)

        # Defer the Inf/NaN checks to write-back time (base._process_layers
        # flush): syncing here would stall the host behind the device queue
        # and kill the one-layer-deep pipeline. The run still aborts before
        # the offending tensor is written.
        self._defer_check(
            shard_layer.layer_name, inf_flags, final_inf, nan_counts=nan_counts
        )
        return out

    def _dispatch_pair(
        self, job, cache_get, cache_put, target_norm, cull_pct,
        inf_flags, nan_counts, true_m=None,
    ):
        """Dispatch one pair merge (sharded / spilled / singleton path).
        ``true_m``: true row count when the stack rides a padded sharding."""
        regime, a_model, b_model, out_name, params = job
        a, b = cache_get(a_model), cache_get(b_model)
        sharded = self._is_sharded(a)
        fast = _use_fast_imag(self.exact_imag, a)
        if not sharded:
            true_m = None

        if regime == "add":
            merged = _pair_add(a, b)
        elif regime == "arith":
            norm_scale, weight_scale = params
            if sharded:
                from ..parallel.merge import sharded_pair_arith

                merged = sharded_pair_arith(
                    self.mesh, a, b, norm_scale, weight_scale,
                    fast_imag=fast,
                    true_m=true_m,
                )
            elif fast:
                merged = _pair_arith_rfft(
                    a, b, jnp.float32(norm_scale), jnp.float32(weight_scale)
                )
            else:
                merged = _pair_arith(
                    a,
                    b,
                    jnp.float32(norm_scale),
                    jnp.float32(weight_scale),
                    fast_imag=False,
                )
        elif regime == "early":
            (norm_a,) = params
            merged = (a / norm_a) * target_norm
        elif regime == "lowratio":
            norm_a, norm_b, a_prop = params
            if sharded:
                from ..parallel.merge import sharded_pair_lowratio

                merged, nan_count, has_inf = sharded_pair_lowratio(
                    self.mesh, a, b, norm_a, norm_b, a_prop, target_norm,
                    fast_imag=fast,
                    true_m=true_m,
                )
            else:
                fn = _pair_lowratio_rfft if fast else _pair_lowratio
                merged, nan_count, has_inf = fn(
                    a,
                    b,
                    jnp.float32(norm_a),
                    jnp.float32(norm_b),
                    jnp.float32(a_prop),
                    jnp.float32(target_norm),
                )
            inf_flags.append(has_inf)
            nan_counts.append(nan_count)
        else:  # slerp
            norm_a, norm_b, a_prop = params
            # exact order statistics rank over the TRUE element count (the
            # padded rows never enter the spectrum)
            numel = (true_m or a.shape[0]) * int(np.prod(a.shape[1:]))
            if sharded:
                from ..parallel.merge import sharded_pair_slerp

                merged, nan_count, has_inf = sharded_pair_slerp(
                    self.mesh,
                    a,
                    b,
                    norm_a,
                    norm_b,
                    a_prop,
                    blend.cutoff_rank(numel, 0.08),
                    blend.cull_rank(numel, cull_pct),
                    blend.cull_limit(numel, cull_pct),
                    target_norm,
                    use_cull=cull_pct > 0,
                    fast_imag=fast,
                    true_m=true_m,
                )
            else:
                fn = _pair_slerp_rfft if fast else partial(
                    _pair_slerp, fast_imag=False
                )
                merged, nan_count, has_inf = fn(
                    a,
                    b,
                    jnp.float32(norm_a),
                    jnp.float32(norm_b),
                    jnp.float32(a_prop),
                    jnp.int32(blend.cutoff_rank(numel, 0.08)),
                    jnp.int32(blend.cull_rank(numel, cull_pct)),
                    jnp.int32(blend.cull_limit(numel, cull_pct)),
                    jnp.float32(target_norm),
                    use_cutoff=True,
                    use_cull=cull_pct > 0,
                )
            inf_flags.append(has_inf)
            nan_counts.append(nan_count)
        cache_put(out_name, merged)

    # Pairs per vmapped dispatch: bounds the stacked-operand footprint (the
    # stack is a copy; with the originals it peaks at ~2x the group's delta
    # bytes until XLA frees the inputs after the stack op runs).
    _BATCH_CHUNK = 4

    def _dispatch_round_batch(
        self, regime, group, cache, cache_put, target_norm, cull_pct,
        fast_imag, inf_flags, nan_counts,
    ):
        """Dispatch a round's same-regime pairs as vmapped XLA calls (one
        per _BATCH_CHUNK pairs)."""
        for i in range(0, len(group), self._BATCH_CHUNK):
            self._dispatch_batch_chunk(
                regime, group[i : i + self._BATCH_CHUNK], cache, cache_put,
                target_norm, cull_pct, fast_imag, inf_flags, nan_counts,
            )

    def _dispatch_batch_chunk(
        self, regime, group, cache, cache_put, target_norm, cull_pct,
        fast_imag, inf_flags, nan_counts,
    ):
        A = jnp.stack([cache[j[1]] for j in group])
        B = jnp.stack([cache[j[2]] for j in group])
        # free the operand originals as soon as the stack consumes them (the
        # engine's round-end pop would otherwise keep them alive through the
        # FFTs); each model is consumed by exactly one pair per round
        for j in group:
            cache.pop(j[1], None)
            cache.pop(j[2], None)
        if regime == "add":
            merged, norms = _batched_kernel("add")(A, B)
        elif regime == "arith":
            ns = jnp.asarray([j[4][0] for j in group], jnp.float32)
            ws = jnp.asarray([j[4][1] for j in group], jnp.float32)
            merged, norms = _batched_kernel("arith", fast_imag=fast_imag)(
                A, B, ns, ws
            )
        elif regime == "lowratio":
            na = jnp.asarray([j[4][0] for j in group], jnp.float32)
            nb = jnp.asarray([j[4][1] for j in group], jnp.float32)
            ts = jnp.asarray([j[4][2] for j in group], jnp.float32)
            merged, norms, nans, infs = _batched_kernel(
                "lowratio", fast_imag=fast_imag
            )(A, B, na, nb, ts, jnp.float32(target_norm))
            inf_flags.append(jnp.any(infs))
            nan_counts.append(jnp.sum(nans))
        else:  # slerp
            na = jnp.asarray([j[4][0] for j in group], jnp.float32)
            nb = jnp.asarray([j[4][1] for j in group], jnp.float32)
            ts = jnp.asarray([j[4][2] for j in group], jnp.float32)
            numel = int(np.prod(A.shape[1:]))
            merged, norms, nans, infs = _batched_kernel(
                "slerp", use_cull=cull_pct > 0, fast_imag=fast_imag
            )(
                A,
                B,
                na,
                nb,
                ts,
                jnp.int32(blend.cutoff_rank(numel, 0.08)),
                jnp.int32(blend.cull_rank(numel, cull_pct)),
                jnp.int32(blend.cull_limit(numel, cull_pct)),
                jnp.float32(target_norm),
            )
            inf_flags.append(jnp.any(infs))
            nan_counts.append(jnp.sum(nans))
        for i, job in enumerate(group):
            cache_put(job[3], merged[i], norm=norms[i])

    async def _merge_layer_fused(self, shard_layer: ShardLayer, models):
        name = shard_layer.layer_name
        base_t = await self._fetch(self.config.output_base_model, name)
        fts = [await self._fetch(m.model, name) for m in models]
        # per-model delta bases (reference base.py:121-137); reuse the output
        # base tensor when the uris match to avoid a duplicate HBM copy
        ft_bases = []
        for m in models:
            if m.base == self.config.output_base_model:
                ft_bases.append(base_t)
            else:
                ft_bases.append(await self._fetch(m.base, name))

        nan_counts = []
        if len(models) == 1:
            out, has_inf = _fused_single(base_t, ft_bases[0], fts[0])
            self.stats.record_pair("fused1")
            regime = None
        else:
            numel = base_t.size
            cull_pct = self.cull_start_pct
            out, nan_count, has_inf, regime = _fused_pair(
                base_t,
                ft_bases[0],
                fts[0],
                ft_bases[1],
                fts[1],
                jnp.float32(models[0].alpha),
                jnp.float32(models[1].alpha),
                jnp.float32(self.target_norm_offset),
                jnp.int32(blend.cutoff_rank(numel, 0.08)),
                jnp.int32(blend.cull_rank(numel, cull_pct)),
                jnp.int32(blend.cull_limit(numel, cull_pct)),
                use_cull=cull_pct > 0,
                fast_imag=_use_fast_imag(self.exact_imag, base_t),
            )
            nan_counts.append(nan_count)
        self._defer_check(
            name, [has_inf], jnp.asarray(False), regime, nan_counts=nan_counts
        )
        return out

    _FUSED_REGIMES = ("add", "arith", "slerp-early", "lowratio", "slerp")

    def _defer_check(
        self, layer_name, inf_flags, final_inf, regime=None, nan_counts=()
    ):
        self._deferred_checks.append(
            (layer_name, inf_flags, final_inf, regime, list(nan_counts))
        )

    def _check_deferred(self, layer_name: str):
        remaining = []
        for name, inf_flags, final_inf, regime, nan_counts in self._deferred_checks:
            if name != layer_name:
                remaining.append((name, inf_flags, final_inf, regime, nan_counts))
                continue
            if nan_counts:
                scrubbed = int(sum(int(c) for c in nan_counts))
                if scrubbed:
                    # Parity of observable behavior: the reference logs per
                    # pair-merge when it scrubs NaNs from the ifft output
                    # (functions.py:211-213 — its logged count is taken AFTER
                    # the scrub, i.e. always 0; we report the real count).
                    logger.info("Warning: NaN in ifft output: %d", scrubbed)
                    self.stats.nans_scrubbed += scrubbed
            if inf_flags and bool(jnp.any(jnp.stack(inf_flags))):
                raise ValueError("Inf in ifft output")
            if bool(final_inf):
                raise ValueError(f"Inf in merged tensor for {name}")
            if regime is not None:
                self.stats.record_pair(self._FUSED_REGIMES[int(regime)])
        self._deferred_checks = remaining
