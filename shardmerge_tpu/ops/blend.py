"""Spectral merge numerics (JAX, jitted, TPU-first).

Reproduces the numerical contract of the reference tensor ops
(shard/tensor/functions.py) as pure jitted functions:

- ``fft2`` / ``ifft2_real``       — functions.py:45-73 (1-D fft, >=2-D fftn
  over the last two axes, fp32 -> complex64).
- ``interpolate_fft_components``  — functions.py:90-162 (masked SLERP /
  sign-agreement sum / magnitude pick on FFT real parts, exact
  order-statistic cutoff & cull thresholds, double-FFT imaginary recursion).
- ``arithmetic_fft_components`` / ``task_arithmetic_fft2`` — functions.py:224-302.
- ``merge_tensors_fft2_slerp``    — functions.py:164-221 (host wrapper; the
  norm-dependent branches are data-dependent and live on the host).
- ``normalize_tensor`` / ``slerp`` — functions.py:24-43, 75-88.

Known reference quirks are reproduced bit-for-bit by default (they define the
output of the published tool); each is marked with a REF-QUIRK comment:

- cutoff "small value" masks test ``|Re v1|`` twice, never v0
  (functions.py:125-126).
- ``arithmetic_fft_components`` disagreement lanes always take v1 because the
  reference's larger-magnitude mask compares v0 with itself
  (functions.py:282-284).

Design notes (TPU):
- All data-dependent *scalars* (t, t_sum, threshold ranks) are dynamic jit
  arguments so each tensor shape compiles exactly once per code path.
- The reference gathers masked subsets and SLERPs the gathered vector; we
  compute identical values with masked reductions (no dynamic shapes).
- Percentile thresholds use exact bit-bisection selection
  (ops/select.py) instead of a full sort.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .select import kth_smallest_nonneg, kth_smallest_nonneg2

__all__ = [
    "fft2",
    "ifft2_real",
    "normalize_tensor",
    "slerp",
    "interpolate_fft_components",
    "arithmetic_fft_components",
    "task_arithmetic_fft2",
    "merge_tensors_fft2_slerp",
    "cutoff_rank",
    "cull_rank",
    "cull_limit",
]


# ---------------------------------------------------------------------------
# FFT wrappers — reference functions.py:45-73
# ---------------------------------------------------------------------------

def fft2(x: jnp.ndarray) -> jnp.ndarray:
    """fp32 -> complex64 FFT; 1-D uses fft, >=2-D uses fftn over (-2, -1)."""
    x = x.astype(jnp.float32)
    if x.ndim == 1:
        return jnp.fft.fft(x)
    return jnp.fft.fftn(x, axes=(-2, -1))


def ifft2_real(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`fft2`, returning the real part."""
    if x.ndim == 1:
        return jnp.fft.ifft(x).real
    return jnp.fft.ifftn(x, axes=(-2, -1)).real


# ---------------------------------------------------------------------------
# Host-side rank helpers: the reference indexes a sorted array at
# int(len * pct) (functions.py:115, :140); int() truncates toward zero.
# ---------------------------------------------------------------------------

def cutoff_rank(numel_each: int, cutoff_pct: float) -> int:
    """Rank into sorted concat(|Re v0|, |Re v1|); clamped to the max element
    like functions.py:116-119."""
    total = 2 * numel_each
    idx = int(total * cutoff_pct)
    return min(idx, total - 1)


def cull_rank(numel: int, cull_pct: float) -> int:
    return int(numel * cull_pct)


def cull_limit(numel: int, cull_pct: float) -> int:
    """Integer count limit reproducing functions.py:143:
    ``count > len * (cull_pct * 2)`` == ``count > floor(len * cull_pct * 2)``
    for integer counts."""
    return int(math.floor(numel * (cull_pct * 2)))


# ---------------------------------------------------------------------------
# Norms / SLERP
# ---------------------------------------------------------------------------

def normalize_tensor(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Divide by the global L2 norm (no-op if norm == 0).

    Parity: functions.py:75-88. Returns (normalized, norm) with norm a
    device scalar.
    """
    norm = jnp.linalg.norm(x.ravel())
    normalized = jnp.where(norm != 0, x / norm, x)
    return normalized, norm


def slerp(v0: jnp.ndarray, v1: jnp.ndarray, t) -> jnp.ndarray:
    """Global-dot spherical interpolation. Parity: functions.py:24-43."""
    return _masked_slerp(v0, v1, t, jnp.ones(v0.shape, dtype=bool))


def _gsum(x, axis_name: Optional[str], col_weights=None):
    """Global sum: local sum, plus a psum across the mesh axis when the
    array is one shard of a distributed tensor. ``col_weights`` weights each
    column of a 2-D half-spectrum array by its Hermitian multiplicity."""
    if col_weights is not None:
        x = x * col_weights
    s = jnp.sum(x)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return s


def _masked_slerp(
    v0, v1, t, mask, axis_name: Optional[str] = None, col_weights=None
):
    """SLERP over the masked element subset.

    The reference gathers ``v0[mask]`` into a 1-D vector and applies
    functions.py:24-43; all its reductions (dot, norms, the dim=-1 normalize
    of a 1-D vector) are global over that subset, so masked reductions give
    the same values without dynamic shapes. ``torch.nn.functional.normalize``
    clamps the denominator at eps=1e-12. With ``axis_name`` the reductions
    become single all-reduces over the mesh (SURVEY.md §5: slerp's global dot
    is one psum).
    """
    zero = jnp.float32(0.0)
    dot_num = _gsum(jnp.where(mask, v0 * v1, zero), axis_name, col_weights)
    n0 = jnp.sqrt(_gsum(jnp.where(mask, v0 * v0, zero), axis_name, col_weights))
    n1 = jnp.sqrt(_gsum(jnp.where(mask, v1 * v1, zero), axis_name, col_weights))
    dot = jnp.clip(dot_num / (n0 * n1), -1.0, 1.0)
    theta = jnp.arccos(dot) * t
    rel = v1 - v0 * dot
    rel_norm = jnp.sqrt(
        _gsum(jnp.where(mask, rel * rel, zero), axis_name, col_weights)
    )
    rel = rel / jnp.maximum(rel_norm, 1e-12)
    return v0 * jnp.cos(theta) + rel * jnp.sin(theta)


# ---------------------------------------------------------------------------
# FFT-component blends
# ---------------------------------------------------------------------------

def interpolate_fft_components_impl(
    v0_fft: jnp.ndarray,
    v1_fft: jnp.ndarray,
    t,
    t_sum,
    cutoff_k,
    cull_k,
    cull_count_limit,
    *,
    use_cutoff: bool,
    use_cull: bool,
    interp_imag: bool = True,
    axis_name: Optional[str] = None,
    fft_fn=None,
    ifft_fn=None,
) -> jnp.ndarray:
    """Masked spectral blend of two complex FFTs. Parity: functions.py:90-162.

    ``cutoff_k``/``cull_k`` are GLOBAL ranks precomputed on the host with
    :func:`cutoff_rank`/:func:`cull_rank`; ``cull_count_limit`` with
    :func:`cull_limit`. ``use_cutoff``/``use_cull`` are the static
    ``pct > 0`` branches of the reference.

    Distributed mode: ``axis_name`` makes every reduction (order-statistic
    counts, cull count, slerp dot/norms) a psum over that mesh axis, and
    ``fft_fn``/``ifft_fn`` supply the sharded FFT used for the imaginary
    double-FFT recursion (parallel/fft2d.py).
    """
    fft_fn = fft_fn or fft2
    ifft_fn = ifft_fn or ifft2_real

    r0 = v0_fft.real
    r1 = v1_fft.real
    a0 = jnp.abs(r0)
    a1 = jnp.abs(r1)

    if use_cutoff:
        # rank over the multiset union of |Re v0| and |Re v1| without
        # materializing the reference's torch.cat (functions.py:114)
        cutoff_thr = kth_smallest_nonneg2(a0, a1, cutoff_k, axis_name=axis_name)
    else:
        cutoff_thr = jnp.float32(0.0)

    sign_mask = jnp.sign(r0) == jnp.sign(r1)
    # REF-QUIRK functions.py:125-126: both "small value" masks test |Re v1|;
    # v0's magnitude never participates in the cutoff decision.
    small = a1 < cutoff_thr
    slerp_mask = sign_mask & ~small
    sum_mask = sign_mask & small  # == sign_mask & ~slerp_mask
    larger = a0 > a1  # disagreement lanes pick by |Re v0| > |Re v1|

    slerp_vals = _masked_slerp(r0, r1, t, slerp_mask, axis_name=axis_name)
    res_real = jnp.where(
        slerp_mask,
        slerp_vals,
        jnp.where(sum_mask, r0 + t_sum * r1, jnp.where(larger, r0, r1)),
    )

    if use_cull:
        abs_res = jnp.abs(res_real)
        cull_thr = kth_smallest_nonneg(
            abs_res.ravel(), cull_k, axis_name=axis_name
        )
        below = _gsum((abs_res < cull_thr).astype(jnp.int32), axis_name)
        # functions.py:143 overflow guard: skip the cull entirely if it would
        # zero more than 2x the expected count (mass ties at the threshold).
        overflow = below > cull_count_limit
        res_real = jnp.where(
            overflow, res_real, jnp.where(abs_res < cull_thr, 0.0, res_real)
        )

    if interp_imag:
        # Double-FFT imaginary handling (functions.py:152-158): FFT the two
        # imaginary planes, blend their REAL parts with cutoff=cull=0 and no
        # deeper recursion, inverse-FFT back.
        i0_fft = fft_fn(v0_fft.imag)
        i1_fft = fft_fn(v1_fft.imag)
        inner = interpolate_fft_components_impl(
            i0_fft,
            i1_fft,
            t,
            t_sum,
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            use_cutoff=False,
            use_cull=False,
            interp_imag=False,
            axis_name=axis_name,
        )
        res_imag = ifft_fn(inner)
    else:
        res_imag = v0_fft.imag

    return jax.lax.complex(res_real, res_imag)


def hermitian_col_weights(n_cols_full: int) -> np.ndarray:
    """Multiplicity of each rfft half-spectrum column in the full spectrum:
    interior columns mirror to a second column (weight 2), the DC column and
    (for even N) the Nyquist column are self-paired (weight 1)."""
    c = n_cols_full // 2 + 1
    w = np.full((c,), 2.0, np.float32)
    w[0] = 1.0
    if n_cols_full % 2 == 0:
        w[-1] = 1.0
    return w


def interpolate_half_spectrum(
    h0: jnp.ndarray,
    h1: jnp.ndarray,
    t,
    t_sum,
    cutoff_k,
    cull_k,
    cull_count_limit,
    col_weights: jnp.ndarray,
    *,
    use_cutoff: bool,
    use_cull: bool,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Hermitian half-spectrum version of the fast-imag blend.

    ``h0``/``h1`` are rfft2 outputs (M, N//2+1). All elementwise operations
    of the full-spectrum blend are mirror-symmetric, so computing them on
    the half spectrum is lossless; the reductions (slerp dot/norms, exact
    cutoff/cull ranks, cull count) weight each column by its Hermitian
    multiplicity, reproducing the full-spectrum values exactly (ranks are
    the same ``cutoff_rank``/``cull_rank`` full-spectrum ranks). The
    imaginary part passes through from h0 (the analytic fast-imag identity;
    see merge/fourier.py).
    """
    from .select import kth_smallest_weighted

    r0 = h0.real
    r1 = h1.real
    a0 = jnp.abs(r0)
    a1 = jnp.abs(r1)
    wrow = col_weights[None, :]

    if use_cutoff:
        cutoff_thr = kth_smallest_weighted(
            a0, cutoff_k, col_weights, y=a1, axis_name=axis_name
        )
    else:
        cutoff_thr = jnp.float32(0.0)

    sign_mask = jnp.sign(r0) == jnp.sign(r1)
    small = a1 < cutoff_thr  # REF-QUIRK: |Re v1| on both masks
    slerp_mask = sign_mask & ~small
    sum_mask = sign_mask & small
    larger = a0 > a1

    slerp_vals = _masked_slerp(
        r0, r1, t, slerp_mask, axis_name=axis_name, col_weights=wrow
    )
    res_real = jnp.where(
        slerp_mask,
        slerp_vals,
        jnp.where(sum_mask, r0 + t_sum * r1, jnp.where(larger, r0, r1)),
    )

    if use_cull:
        abs_res = jnp.abs(res_real)
        cull_thr = kth_smallest_weighted(
            abs_res, cull_k, col_weights, axis_name=axis_name
        )
        # integer-weighted count: float accumulation would lose exactness
        # beyond 2^24 elements
        below = jnp.sum(
            (abs_res < cull_thr).astype(jnp.int32)
            * col_weights.astype(jnp.int32)[None, :]
        )
        if axis_name is not None:
            below = jax.lax.psum(below, axis_name)
        overflow = below > cull_count_limit
        res_real = jnp.where(
            overflow, res_real, jnp.where(abs_res < cull_thr, 0.0, res_real)
        )

    return jax.lax.complex(res_real, h0.imag)


@partial(jax.jit, static_argnames=("use_cutoff", "use_cull", "interp_imag"))
def interpolate_fft_components(
    v0_fft: jnp.ndarray,
    v1_fft: jnp.ndarray,
    t,
    t_sum,
    cutoff_k,
    cull_k,
    cull_count_limit,
    *,
    use_cutoff: bool,
    use_cull: bool,
    interp_imag: bool = True,
) -> jnp.ndarray:
    """Single-device jitted wrapper of
    :func:`interpolate_fft_components_impl` (see it for semantics)."""
    return interpolate_fft_components_impl(
        v0_fft,
        v1_fft,
        t,
        t_sum,
        cutoff_k,
        cull_k,
        cull_count_limit,
        use_cutoff=use_cutoff,
        use_cull=use_cull,
        interp_imag=interp_imag,
    )


def arithmetic_fft_components_impl(
    v0_fft: jnp.ndarray,
    v1_fft: jnp.ndarray,
    t,
    *,
    agreement: bool,
    do_imag: bool = True,
    fft_fn=None,
    ifft_fn=None,
) -> jnp.ndarray:
    """Sign-agreement arithmetic on FFT components. Parity: functions.py:256-302.

    Purely elementwise, so it is layout-agnostic; ``fft_fn``/``ifft_fn``
    supply the (possibly sharded) FFT for the imaginary recursion.
    """
    fft_fn = fft_fn or fft2
    ifft_fn = ifft_fn or ifft2_real

    r0 = v0_fft.real
    r1 = v1_fft.real
    if agreement:
        sign_mask = jnp.sign(r0) == jnp.sign(r1)
    else:
        sign_mask = jnp.ones(r0.shape, dtype=bool)
    # REF-QUIRK functions.py:282-284: the disagreement branch's
    # larger-magnitude mask compares v0 with itself (always False), so
    # disagreeing lanes always take v1.
    res_real = jnp.where(sign_mask, r0 + t * r1, r1)

    if do_imag:
        i0_fft = fft_fn(v0_fft.imag)
        i1_fft = fft_fn(v1_fft.imag)
        inner = arithmetic_fft_components_impl(
            i0_fft, i1_fft, t, agreement=agreement, do_imag=False
        )
        res_imag = ifft_fn(inner)
    else:
        res_imag = v0_fft.imag

    return jax.lax.complex(res_real, res_imag)


@partial(jax.jit, static_argnames=("agreement", "do_imag"))
def arithmetic_fft_components(
    v0_fft: jnp.ndarray,
    v1_fft: jnp.ndarray,
    t,
    *,
    agreement: bool,
    do_imag: bool = True,
) -> jnp.ndarray:
    """Single-device jitted wrapper of
    :func:`arithmetic_fft_components_impl`."""
    return arithmetic_fft_components_impl(
        v0_fft, v1_fft, t, agreement=agreement, do_imag=do_imag
    )


@partial(jax.jit, static_argnames=("agreement",))
def task_arithmetic_fft2(v0, v1, t, *, agreement: bool = True) -> jnp.ndarray:
    """FFT both, arithmetic components, inverse FFT. Parity: functions.py:224-254."""
    fft_v0 = fft2(v0)
    fft_v1 = fft2(v1)
    result_fft = arithmetic_fft_components(fft_v0, fft_v1, t, agreement=agreement)
    return ifft2_real(result_fft)


# ---------------------------------------------------------------------------
# Full pair merge — jitted spectral path + host wrapper with the
# norm-dependent control flow.
# ---------------------------------------------------------------------------

@jax.jit
def _norms2(v0, v1):
    return jnp.linalg.norm(v0.ravel()), jnp.linalg.norm(v1.ravel())


@partial(jax.jit, static_argnames=("use_cutoff", "use_cull"))
def _slerp_merge_body(
    v0n, v1n, t, t_sum, cutoff_k, cull_k, cull_count_limit, *, use_cutoff, use_cull
):
    fft_v0 = fft2(v0n)
    fft_v1 = fft2(v1n)
    result_fft = interpolate_fft_components(
        fft_v0,
        fft_v1,
        t,
        t_sum,
        cutoff_k,
        cull_k,
        cull_count_limit,
        use_cutoff=use_cutoff,
        use_cull=use_cull,
    )
    merged = ifft2_real(result_fft)
    nan_count = jnp.sum(jnp.isnan(merged).astype(jnp.int32))
    merged = jnp.where(jnp.isnan(merged), 0.0, merged)
    has_inf = jnp.any(jnp.isinf(merged))
    return merged, nan_count, has_inf


@jax.jit
def _lowrank_add_body(v0n, v1n, t):
    # ratio < b branch (functions.py:199-202): fft_v0 + t * fft_v1.
    merged = ifft2_real(fft2(v0n) + t * fft2(v1n))
    nan_count = jnp.sum(jnp.isnan(merged).astype(jnp.int32))
    merged = jnp.where(jnp.isnan(merged), 0.0, merged)
    has_inf = jnp.any(jnp.isinf(merged))
    return merged, nan_count, has_inf


def merge_tensors_fft2_slerp(
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    t: float,
    b: float = 0.1,
    t_sum: float = 1.0,
    cutoff_pct: float = 0.0,
    cull_pct: float = 0.0,
    norms: Optional[Tuple[float, float]] = None,
):
    """Full pair merge. Parity: functions.py:164-221.

    Returns (merged, norm_v0, norm_v1); the caller rescales, as in the
    reference. The norm-dependent branches (early returns for tiny norms,
    the ratio<b additive path) are host control flow; pass ``norms`` if the
    caller already knows them to avoid a device round-trip.
    """
    if norms is None:
        n0_dev, n1_dev = _norms2(v0, v1)
        norm_v0, norm_v1 = float(n0_dev), float(n1_dev)
    else:
        norm_v0, norm_v1 = float(norms[0]), float(norms[1])

    v0n = v0 / norm_v0 if norm_v0 != 0 else v0
    v1n = v1 / norm_v1 if norm_v1 != 0 else v1

    # Early returns (functions.py:184-190): the *normalized* v0 is returned.
    if norm_v1 < 1e-4 or norm_v0 < 1e-4:
        return v0n, norm_v0, norm_v1

    ratio = norm_v1 / (norm_v0 + 1e-10)
    if ratio < b:
        merged, _, has_inf = _lowrank_add_body(v0n, v1n, jnp.float32(t))
    else:
        numel = v0.size
        merged, _, has_inf = _slerp_merge_body(
            v0n,
            v1n,
            jnp.float32(t),
            jnp.float32(t_sum),
            jnp.int32(cutoff_rank(numel, cutoff_pct)),
            jnp.int32(cull_rank(numel, cull_pct)),
            jnp.int32(cull_limit(numel, cull_pct)),
            use_cutoff=cutoff_pct > 0,
            use_cull=cull_pct > 0,
        )

    if bool(has_inf):
        # functions.py:215-217
        raise ValueError("Inf in ifft output")

    return merged, norm_v0, norm_v1
