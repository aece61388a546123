"""Numerics-core tests: JAX blend ops vs the independent torch oracle, plus
property tests mirroring reference tests/tensor/test_functions.py."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from shardmerge_tpu.ops import blend
from shardmerge_tpu.ops.select import kth_smallest_nonneg

from . import oracle_torch as oracle


def _rand(rng, shape, scale=1.0):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


# ---------------------------------------------------------------------------
# select
# ---------------------------------------------------------------------------

def test_kth_smallest_matches_sort(rng):
    x = np.abs(_rand(rng, (513,)))
    xs = np.sort(x)
    for k in [0, 1, 100, 256, 512]:
        assert float(kth_smallest_nonneg(jnp.asarray(x), k)) == xs[k]


def test_kth_smallest_with_duplicates():
    x = np.array([0.0, 0.0, 1.0, 1.0, 1.0, 2.5], np.float32)
    for k in range(6):
        assert float(kth_smallest_nonneg(jnp.asarray(x), k)) == np.sort(x)[k]


# ---------------------------------------------------------------------------
# fft / slerp / normalize
# ---------------------------------------------------------------------------

def test_fft_roundtrip(rng):
    for shape in [(64,), (16, 24), (3, 8, 12)]:
        x = _rand(rng, shape)
        back = np.asarray(blend.ifft2_real(blend.fft2(jnp.asarray(x))))
        np.testing.assert_allclose(back, x, atol=1e-4)


def test_fft_matches_torch(rng):
    for shape in [(128,), (24, 36)]:
        x = _rand(rng, shape)
        ours = np.asarray(blend.fft2(jnp.asarray(x)))
        theirs = oracle.fft_transform(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_slerp_endpoints(rng):
    v0 = _rand(rng, (64,))
    v1 = _rand(rng, (64,))
    at0 = np.asarray(blend.slerp(jnp.asarray(v0), jnp.asarray(v1), 0.0))
    np.testing.assert_allclose(at0, v0, rtol=1e-5, atol=1e-6)
    expect = oracle.slerp(torch.from_numpy(v0), torch.from_numpy(v1), 0.7).numpy()
    got = np.asarray(blend.slerp(jnp.asarray(v0), jnp.asarray(v1), 0.7))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_normalize_tensor(rng):
    x = _rand(rng, (32, 8))
    normed, norm = blend.normalize_tensor(jnp.asarray(x))
    assert np.isclose(float(jnp.linalg.norm(normed)), 1.0, rtol=1e-5)
    assert np.isclose(float(norm), np.linalg.norm(x), rtol=1e-5)
    z = jnp.zeros((4, 4), jnp.float32)
    normed_z, norm_z = blend.normalize_tensor(z)
    assert float(norm_z) == 0.0
    np.testing.assert_array_equal(np.asarray(normed_z), np.zeros((4, 4)))


# ---------------------------------------------------------------------------
# interpolate_fft_components vs oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(64,), (16, 24), (32, 48)])
@pytest.mark.parametrize("cutoff_pct,cull_pct", [(0.0, 0.0), (0.08, 0.2), (0.08, 0.0)])
def test_interpolate_matches_oracle(rng, shape, cutoff_pct, cull_pct):
    # Feed BOTH implementations identical complex inputs so the exact
    # order-statistic thresholds and masks must agree bit-for-bit; only
    # reduction rounding (slerp dot/norms) may differ.
    c0 = (_rand(rng, shape) + 1j * _rand(rng, shape)).astype(np.complex64)
    c1 = (_rand(rng, shape) + 1j * _rand(rng, shape)).astype(np.complex64)
    numel = int(np.prod(shape))
    ours = np.asarray(
        blend.interpolate_fft_components(
            jnp.asarray(c0),
            jnp.asarray(c1),
            jnp.float32(0.4),
            jnp.float32(1.0),
            jnp.int32(blend.cutoff_rank(numel, cutoff_pct)),
            jnp.int32(blend.cull_rank(numel, cull_pct)),
            jnp.int32(blend.cull_limit(numel, cull_pct)),
            use_cutoff=cutoff_pct > 0,
            use_cull=cull_pct > 0,
        )
    )
    theirs = oracle.interpolate_fft_components(
        torch.from_numpy(c0),
        torch.from_numpy(c1),
        t=0.4,
        t_sum=1.0,
        cutoff_pct=cutoff_pct,
        cull_pct=cull_pct,
    ).numpy()
    scale = max(np.abs(theirs).max(), 1.0)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-5 * scale)


def _assert_mostly_close(ours, theirs, rtol, atol, max_flip_frac=0.02):
    """Allclose allowing a small fraction of boundary mask flips: torch and
    XLA FFTs differ by ~1e-7, so elements exactly at a threshold/sign
    boundary legitimately land in different blend regimes."""
    ours = np.asarray(ours)
    close = np.isclose(ours, theirs, rtol=rtol, atol=atol)
    frac = 1.0 - close.mean()
    assert frac <= max_flip_frac, f"{frac:.3%} of elements mismatched"
    # flipped elements must still be magnitude-bounded (no garbage values)
    bound = 4.0 * max(np.abs(theirs).max(), atol)
    assert np.all(np.abs(ours[~close]) <= bound)


def test_arithmetic_matches_oracle(rng):
    for agreement in [True, False]:
        v0 = _rand(rng, (24, 16))
        v1 = _rand(rng, (24, 16))
        ours = np.asarray(
            blend.task_arithmetic_fft2(
                jnp.asarray(v0), jnp.asarray(v1), jnp.float32(1.0), agreement=agreement
            )
        )
        theirs = oracle.task_arithmetic_fft2(
            torch.from_numpy(v0), torch.from_numpy(v1), t=1.0, agreement=agreement
        ).numpy()
        scale = max(np.abs(theirs).max(), 1.0)
        np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4 * scale)


@pytest.mark.parametrize("shape", [(64,), (24, 36)])
def test_merge_slerp_matches_oracle(rng, shape):
    v0 = _rand(rng, shape)
    v1 = _rand(rng, shape, scale=0.8)
    ours, n0, n1 = blend.merge_tensors_fft2_slerp(
        jnp.asarray(v0), jnp.asarray(v1), t=0.6, cutoff_pct=0.08, cull_pct=0.2
    )
    theirs, tn0, tn1 = oracle.merge_tensors_fft2_slerp(
        torch.from_numpy(v0), torch.from_numpy(v1), t=0.6, cutoff_pct=0.08, cull_pct=0.2
    )
    assert np.isclose(n0, tn0, rtol=1e-5)
    assert np.isclose(n1, tn1, rtol=1e-5)
    scale = max(np.abs(theirs.numpy()).max(), 1e-3)
    _assert_mostly_close(ours, theirs.numpy(), rtol=2e-3, atol=2e-4 * scale)


def test_fuzz_kernels_match_oracle_random_shapes():
    """Randomized-shape sweep of both blend kernels against the torch
    oracle: odd sizes, 1-D, skinny and fat matrices, varied t/cutoff/cull
    — the parity contract must hold off the convenient power-of-two grid.

    Tolerances are the engine-level acceptance class (rtol 2e-2), not the
    kernel-level 2e-3: when the imag-plane spectra happen to be nearly
    aligned, the inner slerp amplifies the ~1e-7 XLA-vs-torch FFT rounding
    to ~1e-3 outputs (sin(theta) in the denominator; the (3,128) case here
    measured 4e-3 relative with BIT-TIGHT agreement when both sides are
    fed identical spectra — library rounding, not a semantic gap)."""
    gen = np.random.default_rng(777)
    shapes = [(17,), (5, 7), (3, 128), (129, 4), (31, 33), (8, 200)]
    for i, shape in enumerate(shapes):
        v0 = gen.standard_normal(shape).astype(np.float32)
        v1 = (gen.standard_normal(shape) * (0.3 + 0.4 * (i % 3))).astype(
            np.float32
        )
        t = float(0.1 + 0.15 * i)
        cutoff = float(0.02 + 0.03 * (i % 4))
        cull = float(0.05 * (i % 5))

        ours, n0, n1 = blend.merge_tensors_fft2_slerp(
            jnp.asarray(v0), jnp.asarray(v1), t=t,
            cutoff_pct=cutoff, cull_pct=cull,
        )
        theirs, tn0, tn1 = oracle.merge_tensors_fft2_slerp(
            torch.from_numpy(v0), torch.from_numpy(v1), t=t,
            cutoff_pct=cutoff, cull_pct=cull,
        )
        assert np.isclose(n0, tn0, rtol=1e-5), shape
        assert np.isclose(n1, tn1, rtol=1e-5), shape
        scale = max(np.abs(theirs.numpy()).max(), 1e-3)
        _assert_mostly_close(
            ours, theirs.numpy(), rtol=2e-2, atol=2e-3 * scale,
            max_flip_frac=0.03,
        )

        for agreement in (True, False):
            a_ours = np.asarray(
                blend.task_arithmetic_fft2(
                    jnp.asarray(v0), jnp.asarray(v1), jnp.float32(t),
                    agreement=agreement,
                )
            )
            a_theirs = oracle.task_arithmetic_fft2(
                torch.from_numpy(v0), torch.from_numpy(v1), t=t,
                agreement=agreement,
            ).numpy()
            a_scale = max(np.abs(a_theirs).max(), 1.0)
            _assert_mostly_close(
                a_ours, a_theirs, rtol=2e-2, atol=2e-3 * a_scale,
                max_flip_frac=0.02,
            )


def test_merge_slerp_small_norm_early_return(rng):
    v0 = _rand(rng, (16, 16))
    v1 = np.zeros((16, 16), np.float32)
    merged, n0, n1 = blend.merge_tensors_fft2_slerp(jnp.asarray(v0), jnp.asarray(v1), t=0.5)
    assert n1 == 0.0
    np.testing.assert_allclose(
        np.asarray(merged), v0 / np.linalg.norm(v0), rtol=1e-5
    )


def test_merge_slerp_lowrank_branch(rng):
    v0 = _rand(rng, (16, 16))
    v1 = _rand(rng, (16, 16)) * 0.01  # ratio < b=0.1 additive branch
    ours, _, _ = blend.merge_tensors_fft2_slerp(jnp.asarray(v0), jnp.asarray(v1), t=0.5)
    theirs, _, _ = oracle.merge_tensors_fft2_slerp(
        torch.from_numpy(v0), torch.from_numpy(v1), t=0.5
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=2e-3, atol=1e-5)


def test_merge_output_has_no_nan(rng):
    v0 = _rand(rng, (32, 32))
    v1 = _rand(rng, (32, 32))
    merged, _, _ = blend.merge_tensors_fft2_slerp(
        jnp.asarray(v0), jnp.asarray(v1), t=0.5, cutoff_pct=0.08, cull_pct=0.2
    )
    assert not np.any(np.isnan(np.asarray(merged)))


def test_cull_zeroes_small_components(rng):
    # with cull_pct=0.5 and no imag recursion, half the real components go to 0
    v0 = np.abs(_rand(rng, (32, 32))) + 0.1  # same sign everywhere
    v1 = np.abs(_rand(rng, (32, 32))) + 0.1
    f0 = blend.fft2(jnp.asarray(v0))
    f1 = blend.fft2(jnp.asarray(v1))
    numel = 32 * 32
    out = blend.interpolate_fft_components(
        f0,
        f1,
        jnp.float32(0.5),
        jnp.float32(1.0),
        jnp.int32(0),
        jnp.int32(blend.cull_rank(numel, 0.5)),
        jnp.int32(blend.cull_limit(numel, 0.5)),
        use_cutoff=False,
        use_cull=True,
        interp_imag=False,
    )
    zeros = np.sum(np.asarray(out.real) == 0.0)
    assert zeros >= numel * 0.45


def test_double_fft_identity(rng):
    """FFT2(Im FFT2(x)) is purely imaginary for real x: the analytic
    identity behind the engine's fast-imag mode (merge/fourier.py)."""
    x = _rand(rng, (16, 24))
    F = np.fft.fft2(x)
    inner = np.fft.fft2(F.imag)
    scale = np.abs(inner).max()
    assert np.abs(inner.real).max() <= 1e-6 * scale  # rounding noise only
    # and the recursion's output (imag passthrough + inverse FFT) reduces to
    # Im F exactly: IFFT2(i * Im(FFT2(Im F))).real == Im F
    back = np.fft.ifft2(1j * inner.imag).real
    np.testing.assert_allclose(back, F.imag, rtol=1e-6, atol=1e-8 * scale)
    # odd-part form: Im(FFT2(Im F)) == (MN/2) * (x[m] - x[-m mod shape])
    M, N = x.shape
    x_rev = x[(-np.arange(M)) % M][:, (-np.arange(N)) % N]
    odd = (M * N / 2) * (x - x_rev)
    np.testing.assert_allclose(inner.imag, odd, rtol=1e-5, atol=1e-6 * scale)


def test_fast_imag_mode_close_to_exact(rng):
    from shardmerge_tpu.merge.fourier import _pair_slerp

    a = _rand(rng, (32, 48))
    b = _rand(rng, (32, 48))
    numel = a.size
    common = (
        jnp.asarray(a),
        jnp.asarray(b),
        jnp.float32(np.linalg.norm(a)),
        jnp.float32(np.linalg.norm(b)),
        jnp.float32(0.6),
        jnp.int32(blend.cutoff_rank(numel, 0.08)),
        jnp.int32(blend.cull_rank(numel, 0.2)),
        jnp.int32(blend.cull_limit(numel, 0.2)),
        jnp.float32(1.7),
    )
    exact, _, _ = _pair_slerp(*common, use_cutoff=True, use_cull=True, fast_imag=False)
    fast, _, _ = _pair_slerp(*common, use_cutoff=True, use_cull=True, fast_imag=True)
    scale = float(jnp.max(jnp.abs(exact)))
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(exact), rtol=1e-4, atol=1e-5 * scale
    )


def _even_symmetric(rng, n):
    """A real 1-D signal with x[k] == x[n-k]: its FFT is purely real, so the
    imaginary plane fed to the reference's inner recursion is exactly zero."""
    x = np.zeros(n, np.float32)
    x[: n // 2 + 1] = rng.standard_normal(n // 2 + 1).astype(np.float32)
    for k in range(1, n // 2):
        x[n - k] = x[k]
    return x


def test_nan_cascade_quirk_pinned():
    """Pins the reference's small-tensor NaN cascade (the claim gating
    _FAST_IMAG_MIN_NUMEL, merge/fourier.py module comment).

    With both inputs even-symmetric, the FFT imag planes are rounding noise
    and the REAL parts of the inner recursion's FFT of those planes round to
    exact zeros; the inner slerp then divides 0/0 (functions.py:113-134 with
    cutoff=0: every sign-agreeing lane lands in the slerp mask), the NaN
    spreads through the inverse FFT into most of the merged tensor, and the
    scrub (functions.py:211-213) zeroes those lanes. The torch oracle and our
    exact path must cascade identically — same zeroed positions, bit-equal
    survivors — and the fast path must be gated off at this size (it would
    return a clean, drastically different result)."""
    import torch

    from shardmerge_tpu.merge.fourier import _pair_slerp, _use_fast_imag

    from . import oracle_torch as oracle

    n = 16
    rng = np.random.default_rng(3)  # a seed whose rounding hits exact zeros
    a = _even_symmetric(rng, n)
    b = _even_symmetric(rng, n)
    # precondition: the real parts feeding the inner slerp are exactly zero
    # in both libraries under test (computed on the normalized inputs, as in
    # the real flow)
    for arr in (a, b):
        f_t = torch.fft.fft(torch.from_numpy(arr / np.linalg.norm(arr)))
        assert float(torch.fft.fft(f_t.imag).real.abs().max()) == 0.0
        f_j = jnp.fft.fft(jnp.asarray(arr / np.linalg.norm(arr)))
        assert float(jnp.abs(jnp.fft.fft(f_j.imag).real).max()) == 0.0

    theirs, _, _ = oracle.merge_tensors_fft2_slerp(
        torch.from_numpy(a), torch.from_numpy(b),
        t=0.6, cutoff_pct=0.08, cull_pct=0.2,
    )
    theirs = theirs.numpy()

    common = (
        jnp.asarray(a),
        jnp.asarray(b),
        jnp.float32(np.linalg.norm(a)),
        jnp.float32(np.linalg.norm(b)),
        jnp.float32(0.6),
        jnp.int32(blend.cutoff_rank(n, 0.08)),
        jnp.int32(blend.cull_rank(n, 0.2)),
        jnp.int32(blend.cull_limit(n, 0.2)),
        jnp.float32(1.0),
    )
    ours, nan_count, _ = _pair_slerp(
        *common, use_cutoff=True, use_cull=True, fast_imag=False
    )
    ours = np.asarray(ours)

    # the cascade fired and zeroed most of the tensor, identically
    assert int(nan_count) > n // 2
    assert (theirs == 0).sum() == (ours == 0).sum() == int(nan_count)
    np.testing.assert_array_equal(ours == 0, theirs == 0)
    np.testing.assert_array_equal(ours, theirs)

    # the fast-imag gate keeps small/1-D tensors on the exact path
    assert not _use_fast_imag(False, jnp.asarray(a))
    assert not _use_fast_imag(False, jnp.zeros((512, 512)))  # < 1<<20 numel
    assert _use_fast_imag(False, jnp.zeros((1024, 1024)))

    # and for good reason: the fast path would produce a clean result here
    fast, fast_nans, _ = _pair_slerp(
        *common, use_cutoff=True, use_cull=True, fast_imag=True
    )
    assert int(fast_nans) == 0
    assert (np.asarray(fast) == 0).sum() < (ours == 0).sum()


def test_rfft_kernel_matches_fast_full_spectrum(rng):
    from shardmerge_tpu.merge.fourier import _pair_slerp, _pair_slerp_rfft

    for shape in [(32, 48), (32, 47)]:  # even and odd N (Nyquist handling)
        a = _rand(rng, shape)
        b = _rand(rng, shape)
        numel = a.size
        common = (
            jnp.asarray(a),
            jnp.asarray(b),
            jnp.float32(np.linalg.norm(a)),
            jnp.float32(np.linalg.norm(b)),
            jnp.float32(0.6),
            jnp.int32(blend.cutoff_rank(numel, 0.08)),
            jnp.int32(blend.cull_rank(numel, 0.2)),
            jnp.int32(blend.cull_limit(numel, 0.2)),
            jnp.float32(1.7),
        )
        full, _, _ = _pair_slerp(
            *common, use_cutoff=True, use_cull=True, fast_imag=True
        )
        half, _, _ = _pair_slerp_rfft(*common, use_cutoff=True, use_cull=True)
        scale = float(jnp.max(jnp.abs(full)))
        np.testing.assert_allclose(
            np.asarray(half), np.asarray(full), rtol=1e-4, atol=1e-5 * scale
        )


def test_rfft_kernels_on_3d_expert_stacks(rng):
    """ndim>=3 fused expert stacks through the FAST-IMAG rfft kernels.

    The engine's ndim>=3 sharded route (fourier._sharding_for) sends expert
    stacks through the ordinary single-device kernels; the fast-imag gate
    (_use_fast_imag) admits ndim>=3 once the stack crosses
    _FAST_IMAG_MIN_NUMEL, so the rfft kernels MUST accept batch dims — a
    regression here only fires on multi-GB production stacks (the irfftn
    s=/axes= mismatch this test was written against crashed exactly there).

    arith/lowratio have no cross-slice coupling, so the 3-D kernel must be
    bit-identical to stacking per-slice 2-D calls. slerp ranks its order
    statistics over the GLOBAL stack numel, so it is pinned against the
    full-spectrum fast kernel on the same 3-D input instead.
    """
    from shardmerge_tpu.merge.fourier import (
        _pair_arith_rfft,
        _pair_lowratio_rfft,
        _pair_slerp,
        _pair_slerp_rfft,
    )

    E, M, N = 4, 16, 24
    a = rng.standard_normal((E, M, N)).astype(np.float32)
    b = rng.standard_normal((E, M, N)).astype(np.float32)

    stacked = _pair_arith_rfft(
        jnp.asarray(a), jnp.asarray(b), jnp.float32(1.3), jnp.float32(0.6)
    )
    per_slice = [
        _pair_arith_rfft(
            jnp.asarray(a[i]), jnp.asarray(b[i]),
            jnp.float32(1.3), jnp.float32(0.6),
        )
        for i in range(E)
    ]
    np.testing.assert_array_equal(
        np.asarray(stacked), np.stack([np.asarray(s) for s in per_slice])
    )

    lr_args = (
        jnp.float32(np.linalg.norm(a)),
        jnp.float32(np.linalg.norm(b)),
        jnp.float32(0.4),
        jnp.float32(1.7),
    )
    stacked, nans, _ = _pair_lowratio_rfft(jnp.asarray(a), jnp.asarray(b), *lr_args)
    per_slice = [
        _pair_lowratio_rfft(jnp.asarray(a[i]), jnp.asarray(b[i]), *lr_args)[0]
        for i in range(E)
    ]
    np.testing.assert_array_equal(
        np.asarray(stacked), np.stack([np.asarray(s) for s in per_slice])
    )
    assert int(nans) == 0

    numel = a.size
    slerp_args = (
        jnp.asarray(a),
        jnp.asarray(b),
        jnp.float32(np.linalg.norm(a)),
        jnp.float32(np.linalg.norm(b)),
        jnp.float32(0.6),
        jnp.int32(blend.cutoff_rank(numel, 0.08)),
        jnp.int32(blend.cull_rank(numel, 0.2)),
        jnp.int32(blend.cull_limit(numel, 0.2)),
        jnp.float32(1.7),
    )
    full, _, _ = _pair_slerp(
        *slerp_args, use_cutoff=True, use_cull=True, fast_imag=True
    )
    half, _, _ = _pair_slerp_rfft(*slerp_args, use_cutoff=True, use_cull=True)
    scale = float(jnp.max(jnp.abs(full)))
    np.testing.assert_allclose(
        np.asarray(half), np.asarray(full), rtol=1e-4, atol=1e-5 * scale
    )


def test_large_shape_parity_at_fast_imag_activation():
    """The fast-imag/rfft default path vs the exact path vs the torch oracle
    at (1024, 1024) — exactly _FAST_IMAG_MIN_NUMEL, so this exercises the
    path production shapes take (VERDICT r1: the previous suite topped out at
    64x96 and never ran the gate-active path at size).

    Asserts the documented deviation classes (NUMERICS.md §4, measured):
    cross-library fp32 reduction/FFT noise ~2e-4 relL2 at 1M elements
    (grows to ~2.7e-3 at 32M — bench.py asserts that shape); the fast-imag
    identity ~2e-7; rfft symmetrization ~3e-4.
    """
    import torch

    from shardmerge_tpu.merge.fourier import _pair_slerp, _pair_slerp_rfft

    from . import oracle_torch as oracle

    shape = (1024, 1024)
    gen = np.random.default_rng(7)
    a = gen.standard_normal(shape).astype(np.float32)
    b = gen.standard_normal(shape).astype(np.float32)
    numel = a.size
    common = (
        jnp.asarray(a),
        jnp.asarray(b),
        jnp.float32(np.linalg.norm(a)),
        jnp.float32(np.linalg.norm(b)),
        jnp.float32(0.6),
        jnp.int32(blend.cutoff_rank(numel, 0.08)),
        jnp.int32(blend.cull_rank(numel, 0.2)),
        jnp.int32(blend.cull_limit(numel, 0.2)),
        jnp.float32(1.0),
    )
    exact, _, _ = _pair_slerp(
        *common, use_cutoff=True, use_cull=True, fast_imag=False
    )
    fast, _, _ = _pair_slerp(
        *common, use_cutoff=True, use_cull=True, fast_imag=True
    )
    half, _, _ = _pair_slerp_rfft(*common, use_cutoff=True, use_cull=True)
    theirs, _, _ = oracle.merge_tensors_fft2_slerp(
        torch.from_numpy(a), torch.from_numpy(b),
        t=0.6, cutoff_pct=0.08, cull_pct=0.2,
    )
    theirs = theirs.numpy()
    exact, fast, half = map(np.asarray, (exact, fast, half))

    def rel_l2(x, y):
        return float(np.linalg.norm(x - y)) / float(np.linalg.norm(y))

    # cross-library class (headroom over the measured ~2e-4)
    assert rel_l2(exact, theirs) < 1e-3
    assert rel_l2(half, theirs) < 1e-3
    # identity class: fast-imag deviates from exact by far less than the
    # library noise (measured ~2e-7)
    assert rel_l2(fast, exact) < 1e-5
    # rfft symmetrization class (measured ~3e-4 relative to fast)
    assert rel_l2(half, fast) < 2e-3
    # and the deviations are diffuse, not structural: no element moves by
    # more than a small fraction of the output rms
    rms = float(np.linalg.norm(theirs)) / np.sqrt(theirs.size)
    assert float(np.abs(half - theirs).max()) < 0.2 * rms


def test_hermitian_col_weights():
    w = blend.hermitian_col_weights(8)
    np.testing.assert_array_equal(w, [1, 2, 2, 2, 1])
    w = blend.hermitian_col_weights(7)
    np.testing.assert_array_equal(w, [1, 2, 2, 2])


def test_weighted_select_equals_mirrored_full():
    from shardmerge_tpu.ops.select import kth_smallest_weighted

    rng = np.random.default_rng(5)
    M, N = 8, 12
    x = np.abs(rng.standard_normal((M, N // 2 + 1))).astype(np.float32)
    w = blend.hermitian_col_weights(N)
    # materialize the weighted multiset and compare ranks
    full = np.concatenate(
        [np.repeat(x[:, j], int(w[j])) for j in range(x.shape[1])]
    )
    full_sorted = np.sort(full)
    for k in [0, 5, len(full) // 2, len(full) - 1]:
        got = float(kth_smallest_weighted(jnp.asarray(x), k, jnp.asarray(w)))
        assert got == full_sorted[k], (k, got, full_sorted[k])


def test_weighted_select_1d_input():
    """1-D inputs (a single half-spectrum row) rank correctly: the shared
    exact-order-statistic primitive must not assume >= 2 data dims (the
    candidate broadcast otherwise leaves a per-column axis in the counts
    and returns garbage with no error)."""
    from shardmerge_tpu.ops.select import kth_smallest_weighted

    rng = np.random.default_rng(6)
    N = 12
    x = np.abs(rng.standard_normal((N // 2 + 1,))).astype(np.float32)
    w = blend.hermitian_col_weights(N)
    full_sorted = np.sort(
        np.concatenate([np.repeat(x[j], int(w[j])) for j in range(x.size)])
    )
    for k in [0, 3, len(full_sorted) // 2, len(full_sorted) - 1]:
        got = float(kth_smallest_weighted(jnp.asarray(x), k, jnp.asarray(w)))
        assert got == full_sorted[k], (k, got, full_sorted[k])


def test_batched_kernels_match_per_pair(rng):
    """The vmapped per-round kernels (merge/fourier._batched_kernel) must
    reproduce the single-pair kernels exactly for every regime, including
    the rfft fast-imag variants the tiny-tensor engine tests never reach."""
    from shardmerge_tpu.merge.fourier import (
        _batched_kernel,
        _pair_arith_rfft,
        _pair_lowratio_rfft,
        _pair_slerp_rfft,
    )

    K, M, N = 3, 16, 24
    A = rng.standard_normal((K, M, N)).astype(np.float32)
    B = rng.standard_normal((K, M, N)).astype(np.float32)
    na = np.linalg.norm(A.reshape(K, -1), axis=1).astype(np.float32)
    nb = np.linalg.norm(B.reshape(K, -1), axis=1).astype(np.float32)
    ts = np.asarray([0.3, 0.5, 0.7], np.float32)
    numel = M * N
    ranks = (
        jnp.int32(blend.cutoff_rank(numel, 0.08)),
        jnp.int32(blend.cull_rank(numel, 0.2)),
        jnp.int32(blend.cull_limit(numel, 0.2)),
    )

    # slerp (rfft fast-imag)
    bm, bn, bnan, binf = _batched_kernel("slerp", use_cull=True, fast_imag=True)(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(ts), *ranks, jnp.float32(1.7),
    )
    for i in range(K):
        single, _, _ = _pair_slerp_rfft(
            jnp.asarray(A[i]), jnp.asarray(B[i]),
            jnp.float32(na[i]), jnp.float32(nb[i]), jnp.float32(ts[i]),
            *ranks, jnp.float32(1.7), use_cutoff=True, use_cull=True,
        )
        np.testing.assert_array_equal(np.asarray(bm[i]), np.asarray(single))
        np.testing.assert_allclose(
            float(bn[i]), float(jnp.linalg.norm(single.ravel())), rtol=1e-6
        )

    # lowratio (rfft)
    bm, bn, _, _ = _batched_kernel("lowratio", fast_imag=True)(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(ts), jnp.float32(1.7),
    )
    for i in range(K):
        single, _, _ = _pair_lowratio_rfft(
            jnp.asarray(A[i]), jnp.asarray(B[i]),
            jnp.float32(na[i]), jnp.float32(nb[i]), jnp.float32(ts[i]),
            jnp.float32(1.7),
        )
        np.testing.assert_array_equal(np.asarray(bm[i]), np.asarray(single))

    # arith (rfft)
    bm, bn = _batched_kernel("arith", fast_imag=True)(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(na), jnp.asarray(nb)
    )
    for i in range(K):
        single = _pair_arith_rfft(
            jnp.asarray(A[i]), jnp.asarray(B[i]),
            jnp.float32(na[i]), jnp.float32(nb[i]),
        )
        np.testing.assert_array_equal(np.asarray(bm[i]), np.asarray(single))

    # add
    bm, bn = _batched_kernel("add")(jnp.asarray(A), jnp.asarray(B))
    np.testing.assert_array_equal(np.asarray(bm), A + B)
