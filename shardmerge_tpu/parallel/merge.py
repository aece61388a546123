"""Distributed pair-merge kernels: the FourierMerge regimes over a mesh.

For tensors whose working set (fp32 delta + complex64 FFT intermediates,
~12 bytes/element live at peak) exceeds one chip's HBM, the engine shards
the pair row-wise over mesh axis "x" and runs the identical blend math with
distributed FFTs (parallel/fft2d.py) and psum reductions (ops/blend.py
axis_name support). Numerics match the single-chip path: the order-statistic
thresholds are exact global ranks via bit-bisection + psum counts.

The slerp kernel runs on the rfft half spectrum when fast_imag is on and
N % 2P == 0 (the ragged Nyquist column rides replicated with a
device-0-only reduction weight; fft2d.rfft2_rs_half); otherwise it falls
back to the full complex spectrum. Sharding is a capacity feature — it
engages only for tensors that cannot fit one chip.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import blend
from ..ops.blend import (
    arithmetic_fft_components_impl,
    interpolate_fft_components_impl,
)
from .fft2d import (
    fft2_cs,
    fft2_rs,
    half_col_weights,
    ifft2_cs,
    ifft2_rs,
    irfft2_half_rs,
    rfft2_rs_half,
)

__all__ = ["sharded_pair_slerp", "sharded_pair_arith", "sharded_pair_lowratio", "row_sharding"]

_AXIS = "x"

# jit(shard_map(...)) closures cached per (mesh, kernel, static flags) so
# repeated pair merges of the same shape hit the XLA compile cache.
_KERNEL_CACHE: dict = {}


def _cached_kernel(mesh: Mesh, name: str, build, *static):
    key = (id(mesh), name, static)
    fn = _KERNEL_CACHE.get(key)
    if fn is None:
        fn = build()
        _KERNEL_CACHE[key] = fn
    return fn


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Row-wise sharding of a 2-D tensor over the merge axis."""
    return NamedSharding(mesh, P(_AXIS, None))


def _slerp_body(a, b, norm_a, norm_b, t, cutoff_k, cull_k, cull_count_limit,
                target_norm, use_cull, fast_imag=True, true_m=None, pad_m=None):
    """shard_map body: blocks are row shards of the full tensors.

    ``fast_imag`` applies the analytic double-FFT identity (see
    merge/fourier.py) — on a mesh it saves 3 distributed FFTs (and their
    all-to-all transposes) per pair."""
    v0n = a / norm_a
    v1n = b / norm_b
    fft_v0 = fft2_rs(v0n, _AXIS, true_m=true_m)  # -> CS layout
    fft_v1 = fft2_rs(v1n, _AXIS, true_m=true_m)
    result_fft = interpolate_fft_components_impl(
        fft_v0,
        fft_v1,
        t,
        jnp.float32(1.0),
        cutoff_k,
        cull_k,
        cull_count_limit,
        use_cutoff=True,
        use_cull=use_cull,
        interp_imag=not fast_imag,
        axis_name=_AXIS,
        # imag planes: CS -> RS (padding rows ride through as zeros)
        fft_fn=partial(fft2_cs, axis_name=_AXIS, pad_m=pad_m),
        ifft_fn=partial(ifft2_rs, axis_name=_AXIS, true_m=true_m),  # RS -> CS
    )
    merged = ifft2_cs(result_fft, _AXIS, pad_m=pad_m)  # -> RS real
    nan_count = jax.lax.psum(
        jnp.sum(jnp.isnan(merged).astype(jnp.int32)), _AXIS
    )
    merged = jnp.where(jnp.isnan(merged), 0.0, merged)
    has_inf = jax.lax.pmax(
        jnp.any(jnp.isinf(merged)).astype(jnp.int32), _AXIS
    ).astype(bool)
    return merged * target_norm, nan_count, has_inf


def _slerp_body_rfft(
    a, b, norm_a, norm_b, t, cutoff_k, cull_k, cull_count_limit, target_norm,
    use_cull, true_m=None, pad_m=None,
):
    """Half-spectrum (rfft) fast-imag variant of _slerp_body: half the FFT
    work and blend traffic on the mesh. Requires N % 2P == 0 (gated by the
    caller); the ragged Nyquist column rides replicated with device-0-only
    reduction weight (fft2d.half_col_weights)."""
    n = a.shape[-1]
    h0 = rfft2_rs_half(a / norm_a, _AXIS, true_m=true_m)
    h1 = rfft2_rs_half(b / norm_b, _AXIS, true_m=true_m)
    col_w = half_col_weights(n, h0.shape[1] - 1, _AXIS)
    from ..ops.blend import interpolate_half_spectrum

    result = interpolate_half_spectrum(
        h0,
        h1,
        t,
        jnp.float32(1.0),
        cutoff_k,
        cull_k,
        cull_count_limit,
        col_w,
        use_cutoff=True,
        use_cull=use_cull,
        axis_name=_AXIS,
    )
    merged = irfft2_half_rs(result, _AXIS, n, pad_m=pad_m)
    nan_count = jax.lax.psum(
        jnp.sum(jnp.isnan(merged).astype(jnp.int32)), _AXIS
    )
    merged = jnp.where(jnp.isnan(merged), 0.0, merged)
    has_inf = jax.lax.pmax(
        jnp.any(jnp.isinf(merged)).astype(jnp.int32), _AXIS
    ).astype(bool)
    return merged * target_norm, nan_count, has_inf


def sharded_pair_slerp(
    mesh: Mesh,
    a: jnp.ndarray,
    b: jnp.ndarray,
    norm_a: float,
    norm_b: float,
    t: float,
    cutoff_k: int,
    cull_k: int,
    cull_count_limit: int,
    target_norm: float,
    use_cull: bool,
    fast_imag: bool = True,
    true_m: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Regime (c) full SLERP-FFT path over the mesh. Same contract as
    merge.fourier._pair_slerp, for row-shardable 2-D tensors. With
    fast_imag and N divisible by 2P, the whole blend runs on the rfft
    half spectrum. ``true_m``: true global row count when the caller
    zero-padded rows to divide the mesh (merged rows beyond true_m are
    zeros; the engine slices them off)."""
    spec = P(_AXIS, None)
    n_dev = mesh.devices.size
    use_rfft = fast_imag and a.shape[-1] % (2 * n_dev) == 0
    pad_m = a.shape[0] if true_m is not None else None

    def build():
        if use_rfft:
            body = partial(
                _slerp_body_rfft, use_cull=use_cull, true_m=true_m, pad_m=pad_m
            )
        else:
            body = partial(
                _slerp_body, use_cull=use_cull, fast_imag=fast_imag,
                true_m=true_m, pad_m=pad_m,
            )
        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(spec, spec, P(), P(), P(), P(), P(), P(), P()),
                out_specs=(spec, P(), P()),
            )
        )

    fn = _cached_kernel(
        mesh, "slerp", build, use_cull, fast_imag, use_rfft, true_m, pad_m
    )
    return fn(
        a,
        b,
        jnp.float32(norm_a),
        jnp.float32(norm_b),
        jnp.float32(t),
        jnp.int32(cutoff_k),
        jnp.int32(cull_k),
        jnp.int32(cull_count_limit),
        jnp.float32(target_norm),
    )


def _arith_body(a, b, norm_scale, weight_scale, true_m=None, pad_m=None):
    scaled_a = a * norm_scale
    scaled_b = b * weight_scale * norm_scale
    fft_v0 = fft2_rs(scaled_a, _AXIS, true_m=true_m)
    fft_v1 = fft2_rs(scaled_b, _AXIS, true_m=true_m)
    out = arithmetic_fft_components_impl(
        fft_v0,
        fft_v1,
        jnp.float32(1.0),
        agreement=True,
        fft_fn=partial(fft2_cs, axis_name=_AXIS, pad_m=pad_m),
        ifft_fn=partial(ifft2_rs, axis_name=_AXIS, true_m=true_m),
    )
    return ifft2_cs(out, _AXIS, pad_m=pad_m)


def _arith_body_rfft(a, b, norm_scale, weight_scale, true_m=None, pad_m=None):
    """Half-spectrum fast-imag arithmetic (elementwise; no weights needed)."""
    n = a.shape[-1]
    h0 = rfft2_rs_half(a * norm_scale, _AXIS, true_m=true_m)
    h1 = rfft2_rs_half(b * weight_scale * norm_scale, _AXIS, true_m=true_m)
    r0, r1 = h0.real, h1.real
    sign_mask = jnp.sign(r0) == jnp.sign(r1)
    # REF-QUIRK functions.py:282-284: disagreement lanes take v1
    res_real = jnp.where(sign_mask, r0 + r1, r1)  # t=1
    return irfft2_half_rs(
        jax.lax.complex(res_real, h0.imag), _AXIS, n, pad_m=pad_m
    )


def sharded_pair_arith(
    mesh: Mesh, a, b, norm_scale: float, weight_scale: float,
    fast_imag: bool = True,
    true_m: int | None = None,
):
    """Regime (b) sign-agreement arithmetic over the mesh."""
    spec = P(_AXIS, None)
    use_rfft = fast_imag and a.shape[-1] % (2 * mesh.devices.size) == 0
    pad_m = a.shape[0] if true_m is not None else None

    def build():
        body = partial(
            _arith_body_rfft if use_rfft else _arith_body,
            true_m=true_m, pad_m=pad_m,
        )
        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(spec, spec, P(), P()),
                out_specs=spec,
            )
        )

    fn = _cached_kernel(mesh, "arith", build, use_rfft, true_m, pad_m)
    return fn(a, b, jnp.float32(norm_scale), jnp.float32(weight_scale))


def _lowratio_body(a, b, norm_a, norm_b, t, target_norm, true_m=None, pad_m=None):
    merged = ifft2_cs(
        fft2_rs(a / norm_a, _AXIS, true_m=true_m)
        + t * fft2_rs(b / norm_b, _AXIS, true_m=true_m),
        _AXIS,
        pad_m=pad_m,
    )
    nan_count = jax.lax.psum(
        jnp.sum(jnp.isnan(merged).astype(jnp.int32)), _AXIS
    )
    merged = jnp.where(jnp.isnan(merged), 0.0, merged)
    has_inf = jax.lax.pmax(
        jnp.any(jnp.isinf(merged)).astype(jnp.int32), _AXIS
    ).astype(bool)
    return merged * target_norm, nan_count, has_inf


def _lowratio_body_rfft(
    a, b, norm_a, norm_b, t, target_norm, true_m=None, pad_m=None
):
    n = a.shape[-1]
    h = rfft2_rs_half(a / norm_a, _AXIS, true_m=true_m) + t * rfft2_rs_half(
        b / norm_b, _AXIS, true_m=true_m
    )
    merged = irfft2_half_rs(h, _AXIS, n, pad_m=pad_m)
    nan_count = jax.lax.psum(
        jnp.sum(jnp.isnan(merged).astype(jnp.int32)), _AXIS
    )
    merged = jnp.where(jnp.isnan(merged), 0.0, merged)
    has_inf = jax.lax.pmax(
        jnp.any(jnp.isinf(merged)).astype(jnp.int32), _AXIS
    ).astype(bool)
    return merged * target_norm, nan_count, has_inf


def sharded_pair_lowratio(
    mesh: Mesh, a, b, norm_a, norm_b, t, target_norm, fast_imag: bool = True,
    true_m: int | None = None,
):
    spec = P(_AXIS, None)
    use_rfft = fast_imag and a.shape[-1] % (2 * mesh.devices.size) == 0
    pad_m = a.shape[0] if true_m is not None else None

    def build():
        body = partial(
            _lowratio_body_rfft if use_rfft else _lowratio_body,
            true_m=true_m, pad_m=pad_m,
        )
        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(spec, spec, P(), P(), P(), P()),
                out_specs=(spec, P(), P()),
            )
        )

    fn = _cached_kernel(mesh, "lowratio", build, use_rfft, true_m, pad_m)
    return fn(
        a,
        b,
        jnp.float32(norm_a),
        jnp.float32(norm_b),
        jnp.float32(t),
        jnp.float32(target_norm),
    )
