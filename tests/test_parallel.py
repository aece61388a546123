"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh: distributed
FFT correctness and sharded-vs-single-chip merge equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from shardmerge_tpu.ops import blend
from shardmerge_tpu.parallel.fft2d import fft2_cs, fft2_rs, ifft2_cs, ifft2_rs
from shardmerge_tpu.parallel.merge import (
    row_sharding,
    sharded_pair_arith,
    sharded_pair_slerp,
)
from shardmerge_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("x",))


def _sharded(mesh, arr):
    return jax.device_put(jnp.asarray(arr), row_sharding(mesh))


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def test_fft2_rs_matches_fftn(mesh, rng):
    x = rng.standard_normal((32, 48)).astype(np.float32)

    fn = jax.jit(
        jax.shard_map(
            lambda b: fft2_rs(b, "x"),
            mesh=mesh,
            in_specs=P("x", None),
            out_specs=P(None, "x"),
        )
    )
    got = np.asarray(fn(_sharded(mesh, x)))
    expect = np.fft.fft2(x).astype(np.complex64)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-3)


def test_fft2_roundtrips(mesh, rng):
    x = rng.standard_normal((16, 24)).astype(np.float32)

    def round_rs(b):
        return ifft2_cs(fft2_rs(b, "x"), "x")

    fn = jax.jit(
        jax.shard_map(round_rs, mesh=mesh, in_specs=P("x", None), out_specs=P("x", None))
    )
    np.testing.assert_allclose(np.asarray(fn(_sharded(mesh, x))), x, atol=1e-4)

    def round_cs(b):
        return ifft2_rs(fft2_cs(b, "x"), "x")

    fn2 = jax.jit(
        jax.shard_map(
            round_cs, mesh=mesh, in_specs=P(None, "x"), out_specs=P(None, "x")
        )
    )
    x2 = jax.device_put(
        jnp.asarray(x), jax.NamedSharding(mesh, P(None, "x"))
    )
    np.testing.assert_allclose(np.asarray(fn2(x2)), x, atol=1e-4)


def test_sharded_slerp_matches_single_chip(mesh, rng):
    from shardmerge_tpu.merge.fourier import _pair_slerp

    a = rng.standard_normal((32, 64)).astype(np.float32)
    b = rng.standard_normal((32, 64)).astype(np.float32)
    norm_a = float(np.linalg.norm(a))
    norm_b = float(np.linalg.norm(b))
    numel = a.size
    args = dict(
        t=0.6,
        cutoff_k=blend.cutoff_rank(numel, 0.08),
        cull_k=blend.cull_rank(numel, 0.2),
        cull_count_limit=blend.cull_limit(numel, 0.2),
        target_norm=2.5,
    )

    # fast_imag=False on both sides: the analytic fast path is gated to
    # large tensors in the engine; this small tensor compares the exact path.
    single, single_inf = _pair_slerp(
        jnp.asarray(a),
        jnp.asarray(b),
        jnp.float32(norm_a),
        jnp.float32(norm_b),
        jnp.float32(args["t"]),
        jnp.int32(args["cutoff_k"]),
        jnp.int32(args["cull_k"]),
        jnp.int32(args["cull_count_limit"]),
        jnp.float32(args["target_norm"]),
        use_cutoff=True,
        use_cull=True,
        fast_imag=False,
    )
    shard, shard_inf = sharded_pair_slerp(
        mesh,
        _sharded(mesh, a),
        _sharded(mesh, b),
        norm_a,
        norm_b,
        args["t"],
        args["cutoff_k"],
        args["cull_k"],
        args["cull_count_limit"],
        args["target_norm"],
        use_cull=True,
        fast_imag=False,
    )
    assert bool(single_inf) == bool(shard_inf) == False  # noqa: E712
    single_np = np.asarray(single)
    scale = np.abs(single_np).max()
    np.testing.assert_allclose(
        np.asarray(shard), single_np, rtol=1e-3, atol=1e-4 * scale
    )


def test_sharded_arith_matches_single_chip(mesh, rng):
    from shardmerge_tpu.merge.fourier import _pair_arith

    a = rng.standard_normal((16, 32)).astype(np.float32)
    b = rng.standard_normal((16, 32)).astype(np.float32)
    single = _pair_arith(
        jnp.asarray(a), jnp.asarray(b), jnp.float32(1.3), jnp.float32(0.7)
    )
    shard = sharded_pair_arith(
        mesh, _sharded(mesh, a), _sharded(mesh, b), 1.3, 0.7
    )
    single_np = np.asarray(single)
    scale = np.abs(single_np).max()
    np.testing.assert_allclose(
        np.asarray(shard), single_np, rtol=1e-3, atol=1e-4 * scale
    )
