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
    single, _nan, single_inf = _pair_slerp(
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
    shard, _snan, shard_inf = sharded_pair_slerp(
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


def test_engine_with_mesh_sharded_tensors(tmp_path, mesh, tiny_model_factory):
    """FourierMerge with a mesh: 2-D tensors above the threshold are sharded
    and merged with the distributed kernels; output structure is intact and
    the single-finetune result equals the finetune."""
    import asyncio

    import ml_dtypes

    from shardmerge_tpu.config import MergeConfig, MergeModel
    from shardmerge_tpu.io.index import OfflineMultiModelIndex
    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader
    from shardmerge_tpu.merge import FourierMerge

    from .conftest import TINY_SHARD_MAP

    base_path, base_t = tiny_model_factory("base", seed=200)
    ft_path, ft_t = tiny_model_factory("ft", seed=201)

    config = MergeConfig(
        finetune_merge=[MergeModel(model=str(ft_path), base=str(base_path))],
        output_base_model=str(base_path),
        output_dir=str(tmp_path / "merged"),
        cache_dir=str(tmp_path / "cache"),
        storage_dir=str(tmp_path / "storage"),
    )
    index = OfflineMultiModelIndex()
    index.add_model(base_path)
    index.add_model(ft_path)
    merger = FourierMerge(
        config, index_manager=index, mesh=mesh, shard_min_bytes=0
    )
    asyncio.run(merger.merge())

    out = {}
    for shard in set(TINY_SHARD_MAP.values()):
        with SafeTensorsReader(tmp_path / "merged" / shard) as r:
            for k in r.keys():
                out[k] = r.get_tensor(k, copy=True)
    assert set(out) == set(TINY_SHARD_MAP)
    name = "model.layers.0.mlp.gate_proj.weight"
    assert out[name].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_allclose(
        out[name].astype(np.float32), ft_t[name], rtol=1e-2, atol=1e-2
    )


def test_engine_mesh_two_finetunes_runs(tmp_path, mesh, tiny_model_factory):
    """Two finetunes + mesh: the sharded pair kernels actually execute."""
    import asyncio

    from shardmerge_tpu.config import MergeConfig, MergeModel
    from shardmerge_tpu.io.index import OfflineMultiModelIndex
    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader
    from shardmerge_tpu.merge import FourierMerge

    from .conftest import TINY_SHARD_MAP

    base_path, _ = tiny_model_factory("base", seed=210)
    f1_path, _ = tiny_model_factory("f1", seed=211)
    f2_path, _ = tiny_model_factory("f2", seed=212)

    config = MergeConfig(
        finetune_merge=[
            MergeModel(model=str(f1_path), base=str(base_path), alpha=0.7),
            MergeModel(model=str(f2_path), base=str(base_path), alpha=0.3),
        ],
        output_base_model=str(base_path),
        output_dir=str(tmp_path / "merged2"),
        cache_dir=str(tmp_path / "cache"),
        storage_dir=str(tmp_path / "storage"),
    )
    index = OfflineMultiModelIndex()
    for p in (base_path, f1_path, f2_path):
        index.add_model(p)
    merger = FourierMerge(
        config, index_manager=index, mesh=mesh, shard_min_bytes=0
    )
    asyncio.run(merger.merge())
    assert merger.stats.pair_merges["slerp"] > 0

    for shard in set(TINY_SHARD_MAP.values()):
        with SafeTensorsReader(tmp_path / "merged2" / shard) as r:
            for k in r.keys():
                arr = r.get_tensor(k).astype(np.float32)
                assert np.all(np.isfinite(arr)), k


def test_sharded_rfft_half_roundtrip_and_match(mesh, rng):
    from shardmerge_tpu.parallel.fft2d import (
        half_col_weights,
        irfft2_half_rs,
        rfft2_rs_half,
    )

    M, N = 32, 64  # N % 2P == 0 for P=8
    x = rng.standard_normal((M, N)).astype(np.float32)

    def fwd(b):
        return rfft2_rs_half(b, "x")

    fn = jax.jit(
        jax.shard_map(
            fwd, mesh=mesh, in_specs=P("x", None), out_specs=P(None, "x")
        )
    )
    # local layout is (M, Nb+1); gathered along cols it interleaves
    # per-device [body|nyq] chunks — verify via roundtrip and a body check.
    def roundtrip(b):
        return irfft2_half_rs(rfft2_rs_half(b, "x"), "x", N)

    rt = jax.jit(
        jax.shard_map(
            roundtrip, mesh=mesh, in_specs=P("x", None), out_specs=P("x", None)
        )
    )
    np.testing.assert_allclose(
        np.asarray(rt(_sharded(mesh, x))), x, atol=1e-4
    )

    # weights: per-device (Nb+1,) with DC=1, interior=2, nyq on dev0 only
    def weights(b):
        h = rfft2_rs_half(b, "x")
        return half_col_weights(N, h.shape[1] - 1, "x")[None, :]

    wfn = jax.jit(
        jax.shard_map(
            weights, mesh=mesh, in_specs=P("x", None), out_specs=P("x", None)
        )
    )
    w = np.asarray(wfn(_sharded(mesh, x)))  # (8, Nb+1): one row per device
    nb = N // 2 // 8
    assert w[0, 0] == 1.0  # DC
    assert np.all(w[1:, :nb] == 2.0)
    assert w[0, -1] == 1.0 and np.all(w[1:, -1] == 0.0)  # nyquist on dev 0


def test_sharded_rfft_slerp_matches_single_chip(mesh, rng):
    from shardmerge_tpu.merge.fourier import _pair_slerp_rfft

    M, N = 32, 64
    a = rng.standard_normal((M, N)).astype(np.float32)
    b = rng.standard_normal((M, N)).astype(np.float32)
    norm_a = float(np.linalg.norm(a))
    norm_b = float(np.linalg.norm(b))
    numel = a.size
    cutoff_k = blend.cutoff_rank(numel, 0.08)
    cull_k = blend.cull_rank(numel, 0.2)
    cull_lim = blend.cull_limit(numel, 0.2)

    single, _, _ = _pair_slerp_rfft(
        jnp.asarray(a),
        jnp.asarray(b),
        jnp.float32(norm_a),
        jnp.float32(norm_b),
        jnp.float32(0.6),
        jnp.int32(cutoff_k),
        jnp.int32(cull_k),
        jnp.int32(cull_lim),
        jnp.float32(2.5),
        use_cutoff=True,
        use_cull=True,
    )
    shard, _snan, shard_inf = sharded_pair_slerp(
        mesh,
        _sharded(mesh, a),
        _sharded(mesh, b),
        norm_a,
        norm_b,
        0.6,
        cutoff_k,
        cull_k,
        cull_lim,
        2.5,
        use_cull=True,
        fast_imag=True,  # N % 2P == 0 -> rfft sharded path
    )
    assert not bool(shard_inf)
    single_np = np.asarray(single)
    scale = np.abs(single_np).max()
    np.testing.assert_allclose(
        np.asarray(shard), single_np, rtol=1e-3, atol=1e-4 * scale
    )


def test_sharded_rfft_arith_and_lowratio_match(mesh, rng):
    from shardmerge_tpu.merge.fourier import _pair_arith_rfft, _pair_lowratio_rfft
    from shardmerge_tpu.parallel.merge import sharded_pair_lowratio

    M, N = 32, 64
    a = rng.standard_normal((M, N)).astype(np.float32)
    b = rng.standard_normal((M, N)).astype(np.float32)

    single = _pair_arith_rfft(
        jnp.asarray(a), jnp.asarray(b), jnp.float32(1.3), jnp.float32(0.7)
    )
    shard = sharded_pair_arith(
        mesh, _sharded(mesh, a), _sharded(mesh, b), 1.3, 0.7, fast_imag=True
    )
    s_np = np.asarray(single)
    np.testing.assert_allclose(
        np.asarray(shard), s_np, rtol=1e-3, atol=1e-4 * np.abs(s_np).max()
    )

    na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
    single_lr, _, _ = _pair_lowratio_rfft(
        jnp.asarray(a), jnp.asarray(b), jnp.float32(na), jnp.float32(nb),
        jnp.float32(0.4), jnp.float32(1.5),
    )
    shard_lr, _, _ = sharded_pair_lowratio(
        mesh, _sharded(mesh, a), _sharded(mesh, b), na, nb, 0.4, 1.5,
        fast_imag=True,
    )
    s_np = np.asarray(single_lr)
    np.testing.assert_allclose(
        np.asarray(shard_lr), s_np, rtol=1e-3, atol=1e-4 * np.abs(s_np).max()
    )


# --- padded-rows sharding (row counts that do not divide the mesh) ----------


def _padded(mesh, arr, pad):
    padded = np.pad(arr, ((0, pad), (0, 0)))
    return jax.device_put(jnp.asarray(padded), row_sharding(mesh))


@pytest.mark.parametrize("fast_imag", [True, False])
def test_padded_sharded_slerp_matches_single_chip(mesh, rng, fast_imag):
    """36 rows on 8 devices: zero-padded to 40, true_m=36 — the kernels must
    slice the padding after the all-to-all so thresholds/norms/blend see the
    true tensor, and the merged pad rows must come back as zeros."""
    from shardmerge_tpu.merge.fourier import _pair_slerp, _pair_slerp_rfft

    M, N = 36, 64  # N % 2P == 0 so the rfft variant engages when fast_imag
    a = rng.standard_normal((M, N)).astype(np.float32)
    b = rng.standard_normal((M, N)).astype(np.float32)
    norm_a, norm_b = float(np.linalg.norm(a)), float(np.linalg.norm(b))
    numel = a.size
    ranks = (
        blend.cutoff_rank(numel, 0.08),
        blend.cull_rank(numel, 0.2),
        blend.cull_limit(numel, 0.2),
    )
    common = (
        jnp.asarray(a),
        jnp.asarray(b),
        jnp.float32(norm_a),
        jnp.float32(norm_b),
        jnp.float32(0.6),
        jnp.int32(ranks[0]),
        jnp.int32(ranks[1]),
        jnp.int32(ranks[2]),
        jnp.float32(2.5),
    )
    # like-for-like single-chip reference: the sharded fast_imag kernel is
    # the half-spectrum one, so compare against _pair_slerp_rfft (threshold
    # order statistics differ between full and half spectrum only by the
    # symmetrization rounding class, which flips boundary elements at this
    # tiny size)
    if fast_imag:
        single, _, single_inf = _pair_slerp_rfft(
            *common, use_cutoff=True, use_cull=True
        )
    else:
        single, _, single_inf = _pair_slerp(
            *common, use_cutoff=True, use_cull=True, fast_imag=False
        )
    shard, _, shard_inf = sharded_pair_slerp(
        mesh,
        _padded(mesh, a, 4),
        _padded(mesh, b, 4),
        norm_a,
        norm_b,
        0.6,
        *ranks,
        2.5,
        use_cull=True,
        fast_imag=fast_imag,
        true_m=M,
    )
    assert bool(single_inf) == bool(shard_inf) == False  # noqa: E712
    shard_np = np.asarray(shard)
    assert shard_np.shape == (40, N)
    np.testing.assert_array_equal(shard_np[M:], 0.0)  # pad rows stay zero
    single_np = np.asarray(single)
    scale = np.abs(single_np).max()
    np.testing.assert_allclose(
        shard_np[:M], single_np, rtol=1e-3, atol=1e-4 * scale
    )


def test_padded_sharded_arith_and_lowratio_match(mesh, rng):
    from shardmerge_tpu.merge.fourier import (
        _pair_arith_rfft,
        _pair_lowratio_rfft,
    )
    from shardmerge_tpu.parallel.merge import sharded_pair_lowratio

    M, N = 52, 32  # 52 % 8 = 4 -> pad to 56
    a = rng.standard_normal((M, N)).astype(np.float32)
    b = rng.standard_normal((M, N)).astype(np.float32)
    na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))

    single = np.asarray(
        _pair_arith_rfft(
            jnp.asarray(a), jnp.asarray(b), jnp.float32(1.3), jnp.float32(0.7)
        )
    )
    shard = np.asarray(
        sharded_pair_arith(
            mesh, _padded(mesh, a, 4), _padded(mesh, b, 4), 1.3, 0.7,
            true_m=M,
        )
    )
    np.testing.assert_array_equal(shard[M:], 0.0)
    np.testing.assert_allclose(
        shard[:M], single, rtol=1e-3, atol=1e-4 * np.abs(single).max()
    )

    single_lr, _, _ = _pair_lowratio_rfft(
        jnp.asarray(a), jnp.asarray(b), jnp.float32(na), jnp.float32(nb),
        jnp.float32(0.4), jnp.float32(1.9),
    )
    shard_lr, _, _ = sharded_pair_lowratio(
        mesh, _padded(mesh, a, 4), _padded(mesh, b, 4), na, nb, 0.4, 1.9,
        true_m=M,
    )
    single_lr, shard_lr = np.asarray(single_lr), np.asarray(shard_lr)
    np.testing.assert_array_equal(shard_lr[M:], 0.0)
    np.testing.assert_allclose(
        shard_lr[:M], single_lr, rtol=1e-3, atol=1e-4 * np.abs(single_lr).max()
    )


def test_engine_pads_odd_rows_and_falls_back_for_other_shapes(
    tmp_path, mesh, tiny_model_factory
):
    """Engine policy: 2-D tensors with mesh-indivisible rows are padded and
    sharded (not silently single-deviced); 1-D and 3-D tensors fall back."""
    import ml_dtypes

    from shardmerge_tpu.merge.fourier import FourierMerge
    from tests.test_merge_engine import (
        _make_config,
        _offline_index,
        _run_merge,
    )

    base_path, _ = tiny_model_factory("base", seed=300)
    paths = [tiny_model_factory(f"p{i}", seed=301 + i)[0] for i in range(3)]
    entries = [
        {"model": str(p), "base": str(base_path), "alpha": a}
        for p, a in zip(paths, [1.0, 0.6, 0.4])
    ]
    config = _make_config(tmp_path, base_path, entries)
    merger = FourierMerge(
        config,
        index_manager=_offline_index(base_path, *paths),
        mesh=mesh,
        shard_min_bytes=0,
        small_tensor_numel=0,
    )

    # policy unit checks
    assert merger._sharding_for(np.zeros((26, 16), np.float32)) is not None
    assert merger._pad_rows_for(np.zeros((26, 16), np.float32), None) == 6
    assert merger._pad_rows_for(np.zeros((24, 16), np.float32), None) == 0
    assert merger._sharding_for(np.zeros((16,), np.float32)) is None
    assert merger._sharding_for(np.zeros((4, 8, 16), np.float32)) is None
    # columns must divide the mesh (the all-to-all splits the LAST dim;
    # only rows can be padded) — indivisible columns fall back to one device
    assert merger._sharding_for(np.zeros((26, 18), np.float32)) is None

    # end-to-end: the tiny model's (24,16)/(16,24) tensors divide the mesh,
    # but (26,16) does not — patch one shape set to odd rows via a custom
    # model trio below is covered by the kernel tests; here we assert the
    # full merge still runs and matches the unsharded engine.
    _run_merge(merger)

    from tests.test_merge_engine import _read_output

    sharded_out = _read_output(tmp_path / "merged")

    sub = tmp_path / "nomesh"
    sub.mkdir()
    config2 = _make_config(sub, base_path, entries)
    merger2 = FourierMerge(
        config2, index_manager=_offline_index(base_path, *paths)
    )
    _run_merge(merger2)
    plain_out = _read_output(sub / "merged")
    for name in plain_out:
        a = sharded_out[name].astype(np.float32)
        b = plain_out[name].astype(np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        close = np.isclose(a, b, rtol=2e-2, atol=2e-2 * scale)
        # tiny tensors: distributed-FFT rounding flips a handful of
        # threshold-boundary elements vs the single-chip exact path
        assert close.mean() > 0.94, name
    assert sharded_out[name].dtype == np.dtype(ml_dtypes.bfloat16)


def test_ring_attention_matches_full(rng):
    """Ring attention over an 8-device 'cp' mesh == single-device causal
    attention (forward and gradients), with GQA groups."""
    from shardmerge_tpu.parallel.ring import ring_attention

    B, H, KVH, T, D = 2, 4, 2, 32, 8
    scale = 1.0 / np.sqrt(D)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KVH, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KVH, T, D)), jnp.float32)

    def full_attention(q, k, v):
        group = H // KVH
        qg = q.reshape(B, KVH, group, T, D)
        scores = jnp.einsum("bkgtd,bksd->bkgts", qg, k) * scale
        causal = jnp.tril(jnp.ones((T, T), bool))
        scores = jnp.where(causal[None, None, None], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bkgts,bksd->bkgtd", probs, v).reshape(B, H, T, D)

    expect = np.asarray(full_attention(q, k, v))
    mesh = make_mesh(("cp",))
    got = np.asarray(ring_attention(mesh, q, k, v, scale))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)

    # gradients flow through the flash recombination and the ppermute ring
    w = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    g_full = jax.grad(lambda q: jnp.sum(full_attention(q, k, v) * w))(q)
    g_ring = jax.grad(
        lambda q: jnp.sum(ring_attention(mesh, q, k, v, scale) * w)
    )(q)
    np.testing.assert_allclose(
        np.asarray(g_ring), np.asarray(g_full), rtol=1e-4, atol=1e-5
    )

    # mask correctness probe: shifting a future token never changes past
    # outputs
    k2 = k.at[:, :, T - 1].add(3.0)
    got2 = np.asarray(ring_attention(mesh, q, k2, v, scale))
    np.testing.assert_allclose(got2[:, :, : T - 1], got[:, :, : T - 1], rtol=1e-6)

    with pytest.raises(ValueError, match="does not divide"):
        ring_attention(mesh, q[:, :, :30], k[:, :, :30], v[:, :, :30], scale)


def test_ulysses_attention_matches_full(rng):
    """Ulysses (all-to-all seq<->head re-sharding) == single-device causal
    attention, GQA groups aligned across the contiguous head blocks."""
    from shardmerge_tpu.parallel.ring import ulysses_attention

    B, H, KVH, T, D = 2, 8, 4, 32, 8
    scale = 1.0 / np.sqrt(D)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KVH, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KVH, T, D)), jnp.float32)

    group = H // KVH
    qg = q.reshape(B, KVH, group, T, D)
    scores = jnp.einsum("bkgtd,bksd->bkgts", qg, k) * scale
    causal = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(causal[None, None, None], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    expect = np.asarray(
        jnp.einsum("bkgts,bksd->bkgtd", probs, v).reshape(B, H, T, D)
    )

    # 4 devices: KVH=4 divides, and each device's 2 q-heads span exactly
    # one GQA group boundary alignment
    mesh = make_mesh(("cp",), devices=jax.devices()[:4])
    got = np.asarray(ulysses_attention(mesh, q, k, v, scale))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="evenly divide"):
        ulysses_attention(make_mesh(("cp",)), q, k[:, :3], v[:, :3], scale)


def test_multihost_merge_mesh_and_init(rng):
    """merge_mesh orders devices host-contiguously and drives the sharded
    kernels identically to make_mesh; initialize_distributed is a no-op
    single-process."""
    from shardmerge_tpu.merge.fourier import _pair_arith_rfft
    from shardmerge_tpu.parallel.multihost import (
        initialize_distributed,
        merge_mesh,
    )

    assert initialize_distributed() is False  # single process: no-op

    mh = merge_mesh()
    assert mh.axis_names == ("x",)
    assert mh.devices.size == 8
    ids = [d.id for d in mh.devices.ravel()]
    assert ids == sorted(ids)  # host-contiguous == id order on one host

    a = rng.standard_normal((16, 32)).astype(np.float32)
    b = rng.standard_normal((16, 32)).astype(np.float32)
    single = np.asarray(
        _pair_arith_rfft(
            jnp.asarray(a), jnp.asarray(b), jnp.float32(1.1), jnp.float32(0.9)
        )
    )
    shard = np.asarray(
        sharded_pair_arith(mh, _sharded(mh, a), _sharded(mh, b), 1.1, 0.9)
    )
    np.testing.assert_allclose(
        shard, single, rtol=1e-3, atol=1e-4 * np.abs(single).max()
    )


def test_initialize_distributed_env_detection(monkeypatch):
    """Cluster env vars trigger an initialize attempt (which fails cleanly
    single-process); a bare environment stays a no-op without touching
    jax.distributed."""
    from shardmerge_tpu.parallel import multihost

    for var in multihost._CLUSTER_ENV_VARS:
        monkeypatch.delenv(var, raising=False)

    called = []

    def fake_init(**kw):
        called.append(kw)
        raise RuntimeError("no cluster")

    monkeypatch.setattr(multihost.jax.distributed, "initialize", fake_init)

    assert multihost.initialize_distributed() is False
    assert called == []  # bare env: never probed

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "h0,h1")
    assert multihost.initialize_distributed() is False  # probe failed cleanly
    assert len(called) == 1

    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    assert multihost.initialize_distributed(force=True) is False
    assert len(called) == 2


# ---------------------------------------------------------------------------
# Pipeline parallelism (parallel/pipeline.py)
# ---------------------------------------------------------------------------

def _pp_cfg(layers=4):
    from shardmerge_tpu.models.llama import ModelConfig

    return ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=layers,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )


@pytest.mark.parametrize("n_stages,n_micro", [(4, 2), (2, 4), (8, 1)])
def test_pipeline_forward_matches_single_device(n_stages, n_micro):
    """GPipe forward over 'pp' == the plain forward_train, bit-for-bit math:
    same block_train body, microbatching and the stage schedule must not
    change a single logit beyond float reassociation."""
    from shardmerge_tpu.models.llama import forward_train, init_params
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = _pp_cfg(layers=8)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = make_mesh(("pp",), devices=jax.devices()[:n_stages])
    pp_params = stack_stages(mesh, params, n_stages)

    B, T = 4, 9
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)
    want = np.asarray(forward_train(params, cfg, ids))
    got = np.asarray(
        pipeline_forward_train(mesh, cfg, pp_params, ids, n_micro)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pipeline_loss_and_grads_match_unpipelined():
    """The PP loss is differentiable through scan+ppermute and agrees with
    the dp x tp path's loss; grads wrt the replicated embedding agree too."""
    from shardmerge_tpu.models.llama import init_params
    from shardmerge_tpu.parallel.pipeline import make_pp_loss, stack_stages
    from shardmerge_tpu.parallel.train import _loss_fn

    cfg = _pp_cfg(layers=4)
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    mesh = make_mesh(("pp",), devices=jax.devices()[:4])
    pp_params = stack_stages(mesh, params, 4)

    batch = jax.random.randint(jax.random.PRNGKey(3), (4, 10), 0, cfg.vocab_size)
    loss_fn = make_pp_loss(mesh, cfg, n_microbatches=2)
    pp_loss, pp_grads = jax.value_and_grad(loss_fn)(pp_params, batch)
    ref_loss, ref_grads = jax.value_and_grad(_loss_fn)(params, cfg, batch)

    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pp_grads["embed_tokens"]),
        np.asarray(ref_grads["embed_tokens"]),
        rtol=2e-4, atol=2e-5,
    )
    # stage-stacked block grads exist and are finite
    for leaf in jax.tree.leaves(pp_grads["blocks"]):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_pipeline_rejects_bad_configs():
    from shardmerge_tpu.models.llama import init_params
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = _pp_cfg(layers=4)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = make_mesh(("pp",))
    with pytest.raises(ValueError, match="do not evenly divide"):
        stack_stages(mesh, params, 8)  # 4 layers, 8 stages

    mesh4 = make_mesh(("pp",), devices=jax.devices()[:4])
    pp_params = stack_stages(mesh4, params, 4)
    ids = jnp.zeros((3, 5), jnp.int32)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_forward_train(mesh4, cfg, pp_params, ids, 2)  # 3 % 2 != 0

    # quantized {'q','scale'} dicts stack, but a dict leaf holding a
    # NON-array still refuses (nothing stackable inside it)
    broken = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    for layer in broken["layers"]:
        layer["q_proj"] = {"q": layer["q_proj"], "scale": 1.0}
    with pytest.raises(NotImplementedError, match="quantized-dict"):
        stack_stages(mesh4, broken, 4)


@pytest.mark.parametrize("pp,tp", [(2, 4), (4, 2)])
def test_pipeline_with_tensor_parallel_stages(pp, tp):
    """2-D (pp x tp): pipeline stages whose blocks run Megatron tensor
    parallelism internally (column/row-sliced weights, two psums per block)
    still reproduce the single-device forward."""
    from shardmerge_tpu.models.llama import forward_train, init_params
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    from shardmerge_tpu.models.llama import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    mesh = make_mesh(("pp", "tp"), shape=(pp, tp))
    pp_params = stack_stages(mesh, params, pp, tp=True)
    # every device holds 1/(pp*tp) of each projection
    q = pp_params["blocks"]["q_proj"]
    assert q.sharding.shard_shape(q.shape) == (
        q.shape[0] // pp, q.shape[1], q.shape[2] // tp, q.shape[3]
    )

    B, T = 4, 9
    ids = jax.random.randint(jax.random.PRNGKey(5), (B, T), 0, cfg.vocab_size)
    want = np.asarray(forward_train(params, cfg, ids))
    got = np.asarray(pipeline_forward_train(mesh, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pipeline_tp_rejects_indivisible_heads():
    from shardmerge_tpu.models.llama import init_params
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = _pp_cfg(layers=2)  # 2 kv heads
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = make_mesh(("pp", "tp"), shape=(2, 4))  # tp=4 > kv_heads=2
    pp_params = stack_stages(mesh, params, 2, tp=True)
    with pytest.raises(ValueError, match="tp=4 must evenly divide"):
        pipeline_forward_train(
            mesh, cfg, pp_params, jnp.zeros((4, 5), jnp.int32), 2
        )


@pytest.mark.parametrize(
    "kind",
    [
        "mistral_all_sliding",
        "gemma2_alternating",
        "smollm3_nope",
        "llama4_chunked",
    ],
)
def test_pipeline_per_layer_schedules_match_single_device(kind):
    """Per-layer attention schedules through the pipeline (VERDICT r2 #5):
    sliding windows (every layer / alternating), mixed NoPE layers, and
    llama4 chunk-aligned local attention (+ post-rope L2 qk norm and NoPE
    query temperature) must reproduce forward_train exactly — the scanned
    stage body selects each layer's mask/rope gate by its global index."""
    import dataclasses

    from shardmerge_tpu.models.llama import forward_train, init_params
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = _pp_cfg(layers=4)
    if kind == "mistral_all_sliding":
        cfg = dataclasses.replace(cfg, model_type="mistral", sliding_window=3)
    elif kind == "gemma2_alternating":
        cfg = dataclasses.replace(cfg, model_type="gemma2", sliding_window=3)
    elif kind == "llama4_chunked":
        # dense llama4-shaped stack: chunked attention on rope layers,
        # global attention + temperature scaling on the NoPE layer,
        # weightless L2 qk norm after rope
        cfg = dataclasses.replace(
            cfg,
            model_type="llama4_text",
            no_rope_layers=(1, 1, 0, 1),
            layer_types=(
                "chunked_attention",
                "chunked_attention",
                "full_attention",
                "chunked_attention",
            ),
            attention_chunk_size=4,
            attn_temperature_tuning=True,
            floor_scale=2.0,
            qk_norm_l2=True,
        )
    else:  # smollm3: NoPE (rope off) on layers 1 and 3
        cfg = dataclasses.replace(
            cfg, model_type="smollm3", no_rope_layers=(1, 0, 1, 0)
        )
    # the schedule must actually vary across layers for this test to bite
    flags = [
        (
            cfg.layer_is_sliding(i),
            cfg.layer_is_chunked(i),
            cfg.layer_uses_rope(i),
        )
        for i in range(4)
    ]
    if kind != "mistral_all_sliding":
        assert len(set(flags)) > 1, flags

    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    mesh = make_mesh(("pp",), devices=jax.devices()[:4])
    pp_params = stack_stages(mesh, params, 4)

    B, T = 4, 9  # T > window so sliding actually masks something
    ids = jax.random.randint(jax.random.PRNGKey(8), (B, T), 0, cfg.vocab_size)
    want = np.asarray(forward_train(params, cfg, ids))
    got = np.asarray(pipeline_forward_train(mesh, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pipeline_tp_olmo2_full_qk_norm():
    """pp x tp for olmo2-style models (VERDICT r2 weak #3): the full-vector
    q/k RMSNorm statistic is psummed across the Megatron head slices and
    the norm weights shard with their columns — logits match the
    single-device forward."""
    import dataclasses

    from shardmerge_tpu.models.llama import (
        ModelConfig,
        forward_train,
        init_params,
    )
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    cfg = dataclasses.replace(cfg, model_type="olmo2", qk_norm_full=True)
    params = init_params(cfg, jax.random.PRNGKey(11), dtype=jnp.float32)
    assert "q_norm" in params["layers"][0]  # olmo2 carries full-vector norms
    assert params["layers"][0]["q_norm"].shape == (32,)

    mesh = make_mesh(
        ("pp", "tp"), devices=jax.devices()[:4], shape=(2, 2)
    )
    pp_params = stack_stages(mesh, params, 2, tp=True, qk_norm_full=True)
    qn = pp_params["blocks"]["q_norm"]
    # the norm weight column-shards with q (pp x per x (H*D)/tp slices)
    assert qn.sharding.shard_shape(qn.shape) == (1, 2, 16)

    B, T = 4, 9
    ids = jax.random.randint(jax.random.PRNGKey(12), (B, T), 0, cfg.vocab_size)
    want = np.asarray(forward_train(params, cfg, ids))
    got = np.asarray(pipeline_forward_train(mesh, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _moe_pp_cfg(layers=4, **kw):
    import dataclasses

    return dataclasses.replace(
        _pp_cfg(layers=layers),
        num_local_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        **kw,
    )


def test_pipeline_moe_matches_single_device():
    """Mixtral-style MoE blocks through the pipeline: per-expert weight
    lists stage-stack as (W1, W3, W2) leaves and the scanned body runs the
    SAME dense-and-mask dispatch as forward_train — logits and grads match
    the single-device forward (lifts the r2 dense-only pp boundary)."""
    from shardmerge_tpu.models.llama import forward_train, init_params
    from shardmerge_tpu.parallel.pipeline import (
        make_pp_loss,
        pipeline_forward_train,
        stack_stages,
    )
    from shardmerge_tpu.parallel.train import _loss_fn

    cfg = _moe_pp_cfg(layers=4)
    params = init_params(cfg, jax.random.PRNGKey(20), dtype=jnp.float32)
    assert "experts" in params["layers"][0]
    mesh = make_mesh(("pp",), devices=jax.devices()[:4])
    pp_params = stack_stages(mesh, params, 4)
    # the stacked experts shard over 'pp' like any block leaf
    w1 = pp_params["blocks"]["experts_stacked"][0]
    assert w1.shape == (4, 1, 4, 48, 32)  # (S, per, E, inter, hidden)
    assert w1.sharding.shard_shape(w1.shape)[0] == 1

    B, T = 4, 9
    ids = jax.random.randint(
        jax.random.PRNGKey(21), (B, T), 0, cfg.vocab_size
    )
    want = np.asarray(forward_train(params, cfg, ids))
    got = np.asarray(pipeline_forward_train(mesh, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    batch = jax.random.randint(
        jax.random.PRNGKey(22), (4, 10), 0, cfg.vocab_size
    )
    loss_fn = make_pp_loss(mesh, cfg, n_microbatches=2)
    pp_loss, pp_grads = jax.value_and_grad(loss_fn)(pp_params, batch)
    ref_loss, _ = jax.value_and_grad(_loss_fn)(params, cfg, batch)
    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    for leaf in jax.tree.leaves(pp_grads["blocks"]):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_pipeline_quantized_fused_experts():
    """Quantized FUSED expert stacks ({'q3','scale'}, gpt-oss layout)
    pipeline pp AND pp x tp: the dicts stage-stack like nested leaves and
    the scanned body's per-layer slice is exactly the (E, in, out) shape
    dequant_stacked expects; under tp, gate_up column-slices q3+scale on
    the interleaved out dim (untouched by the middle-axis packing) and
    down row-slices q3's packed middle axis (tp-block-repacked on ndim-2)
    with scale replicated — logits equal forward_train on the same
    quantized params both ways. (llama4's permuted variant is covered by
    test_pipeline_llama4_quantized_fused_tp.)"""
    import dataclasses

    from shardmerge_tpu.models.llama import forward_train, init_params
    from shardmerge_tpu.models.quant import quantize_stacked
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = dataclasses.replace(
        _moe_pp_cfg(layers=4),
        model_type="gpt_oss",
        sliding_window=3,
    )
    params = init_params(cfg, jax.random.PRNGKey(29), dtype=jnp.float32)
    for bits in (8, 4):
        qparams = {
            **params,
            "layers": [
                {
                    **layer,
                    "gptoss_experts": {
                        k: (
                            quantize_stacked(np.asarray(v), bits)
                            if k in ("gate_up", "down")
                            else v
                        )
                        for k, v in layer["gptoss_experts"].items()
                    },
                }
                for layer in params["layers"]
            ],
        }
        ids = jax.random.randint(
            jax.random.PRNGKey(30), (4, 7), 0, cfg.vocab_size
        )
        want = np.asarray(forward_train(qparams, cfg, ids))

        mesh = make_mesh(("pp",), devices=jax.devices()[:2])
        pp_params = stack_stages(mesh, qparams, 2)
        gu = pp_params["blocks"]["gptoss_experts"]["gate_up"]
        assert set(gu) == {"q3", "scale"}
        assert gu["q3"].shape[:3] == (2, 2, 4)  # (S, per, E)
        got = np.asarray(
            pipeline_forward_train(mesh, cfg, pp_params, ids, 2)
        )
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=4e-3)

        mesh2 = make_mesh(
            ("pp", "tp"), devices=jax.devices()[:4], shape=(2, 2)
        )
        tp_params = stack_stages(mesh2, qparams, 2, tp=True)
        gu2 = tp_params["blocks"]["gptoss_experts"]["gate_up"]
        dn2 = tp_params["blocks"]["gptoss_experts"]["down"]
        # gate_up column-parallel: q3 AND scale slice the interleaved out
        assert gu2["q3"].sharding.shard_shape(gu2["q3"].shape)[4] \
            == gu2["q3"].shape[4] // 2
        assert gu2["scale"].sharding.shard_shape(gu2["scale"].shape)[4] \
            == gu2["scale"].shape[4] // 2
        # down row-parallel: q3 slices its (packed) middle axis, scale
        # replicates within the stage (only 'pp' shards it)
        assert dn2["q3"].sharding.shard_shape(dn2["q3"].shape)[3] \
            == dn2["q3"].shape[3] // 2
        assert dn2["scale"].sharding.shard_shape(dn2["scale"].shape) \
            == (dn2["scale"].shape[0] // 2, *dn2["scale"].shape[1:])
        got_tp = np.asarray(
            pipeline_forward_train(mesh2, cfg, tp_params, ids, 2)
        )
        np.testing.assert_allclose(got_tp, want, rtol=2e-2, atol=4e-3)


def test_pipeline_llama4_quantized_fused_tp(tmp_path):
    """Llama-4 fused expert stacks quantized to int4 pipeline pp x tp:
    the gate/up block permutation applies to q3 AND its per-output-channel
    scale (the permuted axis is the out dim — never the packed axis), and
    down's packed middle axis gets the tp-blocked repack — logits equal
    forward_train on the same quantized params."""
    import torch
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    from shardmerge_tpu.models.llama import ModelConfig, forward_train
    from shardmerge_tpu.models.loader import load_params
    from shardmerge_tpu.models.quant import quantize_stacked
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    torch.manual_seed(31)
    config = Llama4TextConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=48,
        intermediate_size_mlp=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        num_local_experts=4,
        num_experts_per_tok=2,
        interleave_moe_layer_step=1,
        no_rope_layers=[1, 1, 0, 1],
        attention_chunk_size=4,
        max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    model = Llama4ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "l4q"
    model.save_pretrained(str(path), safe_serialization=True)

    cfg = ModelConfig.from_pretrained(path)
    params = load_params(path, cfg, dtype=jnp.float32)
    qparams = {
        **params,
        "layers": [
            {
                **layer,
                "llama4_experts": {
                    k: quantize_stacked(np.asarray(v), 4)
                    for k, v in layer["llama4_experts"].items()
                },
            }
            for layer in params["layers"]
        ],
    }
    ids = jax.random.randint(jax.random.PRNGKey(32), (2, 9), 0, cfg.vocab_size)
    want = np.asarray(forward_train(qparams, cfg, ids))

    mesh_2d = make_mesh(("pp", "tp"), devices=jax.devices()[:4], shape=(2, 2))
    tp_params = stack_stages(mesh_2d, qparams, 2, tp=True)
    gu = tp_params["blocks"]["llama4_experts"]["gate_up"]
    assert gu["q3"].sharding.shard_shape(gu["q3"].shape)[4] \
        == gu["q3"].shape[4] // 2
    got = np.asarray(pipeline_forward_train(mesh_2d, cfg, tp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=4e-3)


def test_pipeline_quantized_experts():
    """int8/int4 per-expert lists pipeline pp AND pp x tp: the
    {'q','scale'} dicts stage-stack into parallel (S, per, E, ...)
    buffers, the stage body re-slices them per expert and matmul
    dequantizes; under tp, W1/W3 column-slice q+scale on the expert
    intermediate dim and W2 row-slices q's packed reduction dim
    (tp-block-repacked) with scale replicated — logits equal
    forward_train on the SAME quantized params either way."""
    import dataclasses

    from shardmerge_tpu.models.llama import forward_train, init_params
    from shardmerge_tpu.models.quant import quantize
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = dataclasses.replace(
        _moe_pp_cfg(layers=4), num_key_value_heads=4
    )
    params = init_params(cfg, jax.random.PRNGKey(26), dtype=jnp.float32)
    for bits in (8, 4):
        qparams = {
            **params,
            "layers": [
                {
                    **layer,
                    "experts": [
                        {k: quantize(w, bits) for k, w in ex.items()}
                        for ex in layer["experts"]
                    ],
                }
                for layer in params["layers"]
            ],
        }
        ids = jax.random.randint(
            jax.random.PRNGKey(27), (4, 7), 0, cfg.vocab_size
        )
        want = np.asarray(forward_train(qparams, cfg, ids))

        mesh = make_mesh(("pp",), devices=jax.devices()[:2])
        pp_params = stack_stages(mesh, qparams, 2)
        w1 = pp_params["blocks"]["experts_stacked"][0]
        assert set(w1) == {"q", "scale"}  # parallel stacked buffers
        assert w1["q"].shape[:3] == (2, 2, 4)  # (S, per, E)
        got = np.asarray(
            pipeline_forward_train(mesh, cfg, pp_params, ids, 2)
        )
        # bf16 dequant ulps, like the quantized dense stack test
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=4e-3)

        mesh2 = make_mesh(
            ("pp", "tp"), devices=jax.devices()[:4], shape=(2, 2)
        )
        tp_params = stack_stages(mesh2, qparams, 2, tp=True)
        w1, _, w2 = tp_params["blocks"]["experts_stacked"]
        # W1 column-parallel: q and scale slice the intermediate dim
        assert w1["q"].sharding.shard_shape(w1["q"].shape)[3] \
            == w1["q"].shape[3] // 2
        assert w1["scale"].sharding.shard_shape(w1["scale"].shape)[3] \
            == w1["scale"].shape[3] // 2
        # W2 row-parallel: q slices the packed reduction dim; scale
        # replicates within the stage (only 'pp' shards it)
        assert w2["q"].sharding.shard_shape(w2["q"].shape)[4] \
            == w2["q"].shape[4] // 2
        assert w2["scale"].sharding.shard_shape(w2["scale"].shape) \
            == (w2["scale"].shape[0] // 2, *w2["scale"].shape[1:])
        got_tp = np.asarray(
            pipeline_forward_train(mesh2, cfg, tp_params, ids, 2)
        )
        np.testing.assert_allclose(got_tp, want, rtol=2e-2, atol=4e-3)


def test_pipeline_moe_with_tensor_parallel():
    """pp x tp over MoE stages: expert W1/W3 column-shard and W2 row-shards
    on the expert intermediate dim, the router replicates, and the block's
    existing down_proj psum assembles the routed partial sums — logits
    match the single-device forward."""
    from shardmerge_tpu.models.llama import forward_train, init_params
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = _moe_pp_cfg(layers=4, num_key_value_heads=4)
    params = init_params(cfg, jax.random.PRNGKey(23), dtype=jnp.float32)
    mesh = make_mesh(("pp", "tp"), devices=jax.devices()[:4], shape=(2, 2))
    pp_params = stack_stages(mesh, params, 2, tp=True)
    w1, _, w2 = pp_params["blocks"]["experts_stacked"]
    assert w1.sharding.shard_shape(w1.shape) == (1, 2, 4, 24, 32)
    assert w2.sharding.shard_shape(w2.shape) == (1, 2, 4, 32, 24)
    gate = pp_params["blocks"]["moe_gate"]  # router replicates within stage
    assert gate.sharding.shard_shape(gate.shape) == (1, 2, 4, 32)

    B, T = 4, 9
    ids = jax.random.randint(
        jax.random.PRNGKey(24), (B, T), 0, cfg.vocab_size
    )
    want = np.asarray(forward_train(params, cfg, ids))
    got = np.asarray(pipeline_forward_train(mesh, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pp_train_step_descends_and_zero1_shards_moments():
    """The full pipeline-parallel train step: adamw over stage-stacked
    params (moments inherit the 'pp' placement), first-step loss equals
    the unpipelined loss, repeated steps descend; with a dp axis and
    zero1=True the moments additionally shard over 'dp'."""
    from shardmerge_tpu.models.llama import init_params
    from shardmerge_tpu.parallel.pipeline import stack_stages
    from shardmerge_tpu.parallel.train import (
        _loss_fn,
        make_pp_train_step,
    )

    cfg = _pp_cfg(layers=4)
    params = init_params(cfg, jax.random.PRNGKey(50), dtype=jnp.float32)
    batch = jax.random.randint(
        jax.random.PRNGKey(51), (4, 10), 0, cfg.vocab_size
    )
    ref_loss = float(_loss_fn(params, cfg, batch))

    mesh = make_mesh(("pp",), devices=jax.devices()[:4], shape=(4,))
    pp_params = stack_stages(mesh, params, 4)
    init_state, train_step = make_pp_train_step(
        mesh, cfg, n_microbatches=2, learning_rate=1e-2
    )
    state = init_state(pp_params)
    losses = []
    for _ in range(4):
        state, loss = train_step(state, batch)
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], ref_loss, rtol=1e-5)
    assert losses[-1] < losses[0]
    # moments inherit the stage placement: some leaf carries 'pp'
    mu_tree = state["opt_state"][0].mu
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(mu_tree)
        if hasattr(leaf, "sharding")
    ]
    assert any(
        "pp" in [a for e in spec if e for a in (e if isinstance(e, tuple) else (e,))]
        for spec in specs
    ), specs[:4]

    # dp x pp + zero1: moments pick up 'dp' on top of 'pp'
    mesh2 = make_mesh(
        ("dp", "pp"), devices=jax.devices()[:4], shape=(2, 2)
    )
    params2 = init_params(cfg, jax.random.PRNGKey(50), dtype=jnp.float32)
    pp_params2 = stack_stages(mesh2, params2, 2)
    z_init, z_step = make_pp_train_step(
        mesh2, cfg, n_microbatches=2, learning_rate=1e-2, zero1=True
    )
    z_state = z_init(pp_params2)
    z_state, z_loss = z_step(z_state, batch)
    np.testing.assert_allclose(float(z_loss), ref_loss, rtol=1e-5)
    flat = set()
    for leaf in jax.tree.leaves(z_state["opt_state"][0].mu):
        if hasattr(leaf, "sharding") and leaf.ndim >= 2:
            for e in leaf.sharding.spec:
                if e is not None:
                    flat.update(e if isinstance(e, tuple) else (e,))
    assert "dp" in flat and "pp" in flat, flat

    # master_fp32 composes on the pp path (bf16 stage weights, fp32
    # master+moments, zero1-sharded)
    params3 = init_params(cfg, jax.random.PRNGKey(50), dtype=jnp.bfloat16)
    pp3 = stack_stages(mesh2, params3, 2)
    m_init, m_step = make_pp_train_step(
        mesh2, cfg, n_microbatches=2, learning_rate=1e-3,
        zero1=True, master_fp32=True,
    )
    m_state = m_init(pp3)
    m_state, m_loss = m_step(m_state, batch)
    assert np.isfinite(float(m_loss))
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(m_state["master"])
    )
    assert all(
        leaf.dtype == jnp.bfloat16
        for leaf in jax.tree.leaves(m_state["params"])
    )


@pytest.mark.parametrize(
    "axes,shape,moe",
    [
        (("dp", "pp"), (2, 4), False),
        (("dp", "pp", "tp"), (2, 2, 2), False),
        (("dp", "pp"), (2, 2), True),  # dp x pp over stage-stacked experts
    ],
)
def test_pipeline_with_data_parallel(axes, shape, moe):
    """dp x pp (and the full 3-D dp x pp x tp): the microbatch dim shards
    over 'dp', each dp group pipelines its slice, weights replicate over
    'dp' — logits, loss and grads match the single-device forward, and the
    weight grads come out dp-synchronized (shard_map's transpose psums the
    replicated-in cotangents)."""
    from shardmerge_tpu.models.llama import forward_train, init_params
    from shardmerge_tpu.parallel.pipeline import (
        make_pp_loss,
        pipeline_forward_train,
        stack_stages,
    )
    from shardmerge_tpu.parallel.train import _loss_fn

    tp = "tp" in axes
    cfg = _moe_pp_cfg(layers=4) if moe else _pp_cfg(layers=4)
    if tp:
        import dataclasses

        cfg = dataclasses.replace(cfg, num_key_value_heads=4)
    params = init_params(cfg, jax.random.PRNGKey(30), dtype=jnp.float32)
    n_dev = int(np.prod(shape))
    mesh = make_mesh(axes, devices=jax.devices()[:n_dev], shape=shape)
    pp = shape[list(axes).index("pp")]
    pp_params = stack_stages(mesh, params, pp, tp=tp)

    B, T = 4, 9  # 2 microbatches of mb=2, sharded 1/dp-device
    ids = jax.random.randint(
        jax.random.PRNGKey(31), (B, T), 0, cfg.vocab_size
    )
    want = np.asarray(forward_train(params, cfg, ids))
    got = np.asarray(pipeline_forward_train(mesh, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    batch = jax.random.randint(
        jax.random.PRNGKey(32), (4, 10), 0, cfg.vocab_size
    )
    loss_fn = make_pp_loss(mesh, cfg, n_microbatches=2)
    pp_loss, pp_grads = jax.value_and_grad(loss_fn)(pp_params, batch)
    ref_loss, ref_grads = jax.value_and_grad(_loss_fn)(params, cfg, batch)
    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pp_grads["embed_tokens"]),
        np.asarray(ref_grads["embed_tokens"]),
        rtol=2e-4, atol=2e-5,
    )

    # indivisible microbatch-per-dp must raise, not silently misshard
    ids_bad = ids[:2]  # mb would be 1 with n_micro=2, dp=2
    with pytest.raises(ValueError, match="dp="):
        pipeline_forward_train(mesh, cfg, pp_params, ids_bad, 2)


def test_remat_matches_unremat():
    """jax.checkpoint rematerialisation (the standard TPU HBM-for-FLOPs
    trade) changes neither the loss nor the grads — in the dp x tp train
    step and through the pipeline schedule."""
    from shardmerge_tpu.models.llama import init_params
    from shardmerge_tpu.parallel.pipeline import make_pp_loss, stack_stages
    from shardmerge_tpu.parallel.train import _loss_fn, make_train_step

    cfg = _pp_cfg(layers=4)
    params = init_params(cfg, jax.random.PRNGKey(40), dtype=jnp.float32)
    batch = jax.random.randint(
        jax.random.PRNGKey(41), (4, 10), 0, cfg.vocab_size
    )

    # plain loss/grads: remat must be value- and grad-invariant
    loss_p, grads_p = jax.value_and_grad(_loss_fn)(params, cfg, batch)
    loss_r, grads_r = jax.value_and_grad(_loss_fn)(params, cfg, batch, True)
    np.testing.assert_allclose(float(loss_r), float(loss_p), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads_r), jax.tree.leaves(grads_p)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )

    # sharded train step accepts remat and produces the same first loss.
    # NOTE fresh params per init: the donated train state can ALIAS the
    # input tree (device_put aliases on matching placement) and donation
    # then deletes the original buffers (CLAUDE.md gotcha)
    mesh = make_mesh(("dp", "tp"), shape=(2, 2), devices=jax.devices()[:4])
    init_s, step = make_train_step(mesh, cfg)
    init_r, step_r = make_train_step(mesh, cfg, remat=True)
    _, loss_a = step(
        init_s(init_params(cfg, jax.random.PRNGKey(40), dtype=jnp.float32)),
        batch,
    )
    _, loss_b = step_r(
        init_r(init_params(cfg, jax.random.PRNGKey(40), dtype=jnp.float32)),
        batch,
    )
    np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-6)

    # pipeline: remat through scan-over-ticks of scan-over-layers
    mesh_pp = make_mesh(("pp",), devices=jax.devices()[:4])
    pp_params = stack_stages(mesh_pp, params, 4)
    loss_fn = make_pp_loss(mesh_pp, cfg, n_microbatches=2)
    loss_fn_r = make_pp_loss(mesh_pp, cfg, n_microbatches=2, remat=True)
    pl, pg = jax.value_and_grad(loss_fn)(pp_params, batch)
    rl, rg = jax.value_and_grad(loss_fn_r)(pp_params, batch)
    np.testing.assert_allclose(float(rl), float(pl), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(rg), jax.tree.leaves(pg)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_deepseek_mla_trains():
    """DeepSeek gains a train path (block_train's MLA branch): the
    cache-free forward_train equals the serving forward's prefill logits
    (which are HF-validated in test_models.py), gradients flow finite —
    with and without remat — and the dp x tp train step runs, covering
    MLA + grouped routing + shared experts + the dense first_k layer."""
    from shardmerge_tpu.models.llama import (
        ModelConfig,
        forward,
        forward_train,
        init_kv_cache,
        init_params,
        rope_tables,
    )
    from shardmerge_tpu.parallel.train import _loss_fn, make_train_step

    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=64,
        model_type="deepseek_v3",
        q_lora_rank=24,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        num_local_experts=4,
        num_experts_per_tok=2,
        n_shared_experts=1,
        first_k_dense_replace=1,
        n_group=2,
        topk_group=1,
        topk_method="noaux_tc",
        rope_interleave=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(60), dtype=jnp.float32)
    assert "kv_a_proj" in params["layers"][0]  # MLA layers, not q/k/v

    B, T = 2, 9
    ids = jax.random.randint(jax.random.PRNGKey(61), (B, T), 0, 64)
    rope = rope_tables(cfg, T)
    kv = init_kv_cache(cfg, B, T, jnp.float32)
    positions = jnp.arange(T, dtype=jnp.int32)[None, :].repeat(B, 0)
    want, _ = forward(
        params, cfg, ids, positions, kv, cache_pos=0, rope=rope, attn_len=T
    )
    got = forward_train(params, cfg, ids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )

    batch = jax.random.randint(jax.random.PRNGKey(62), (2, 10), 0, 64)
    loss, grads = jax.value_and_grad(_loss_fn)(params, cfg, batch)
    loss_r, _ = jax.value_and_grad(_loss_fn)(params, cfg, batch, True)
    np.testing.assert_allclose(float(loss_r), float(loss), rtol=1e-6)
    assert all(
        bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads)
    )

    mesh = make_mesh(("dp", "tp"), shape=(2, 2), devices=jax.devices()[:4])
    init_s, step = make_train_step(mesh, cfg)
    _, loss2 = step(init_s(params), batch)
    np.testing.assert_allclose(float(loss2), float(loss), rtol=1e-5)


def test_stack_experts_single_buffer_and_homogeneity():
    """_stack_experts fills one (S, per, E, ., .) buffer per matrix kind
    straight from the per-layer lists (no per-layer intermediate copies)
    and rejects ragged expert counts."""
    from shardmerge_tpu.parallel.pipeline import _stack_experts

    def expert(seed):
        rng = np.random.default_rng(seed)
        return {
            "w1": rng.standard_normal((6, 4), dtype=np.float32),
            "w3": rng.standard_normal((6, 4), dtype=np.float32),
            "w2": rng.standard_normal((4, 6), dtype=np.float32),
        }

    layers = [{"experts": [expert(10 * li + e) for e in range(3)]}
              for li in range(4)]
    W1, W3, W2 = _stack_experts(layers, n_stages=2, per=2)
    assert W1.shape == (2, 2, 3, 6, 4) and W2.shape == (2, 2, 3, 4, 6)
    np.testing.assert_array_equal(W1[1, 0, 2], layers[2]["experts"][2]["w1"])
    np.testing.assert_array_equal(W2[0, 1, 1], layers[1]["experts"][1]["w2"])

    layers[3]["experts"].pop()
    with pytest.raises(ValueError, match="expert counts differ"):
        _stack_experts(layers, n_stages=2, per=2)


def test_deepseek_homogeneous_stack_pipelines():
    """A homogeneous DeepSeek stack (first_k_dense_replace=0) pipelines:
    MLA blocks + grouped routing + shared experts through the GPipe
    schedule equal the single-device forward — pp-only AND pp x tp
    (q_b/kv_b outputs are contiguous head blocks, so Megatron column
    slicing IS head slicing; the shared latent side replicates)."""
    from shardmerge_tpu.models.llama import (
        ModelConfig,
        forward_train,
        init_params,
    )
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=64,
        model_type="deepseek_v3",
        q_lora_rank=24,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        num_local_experts=4,
        num_experts_per_tok=2,
        n_shared_experts=1,
        first_k_dense_replace=0,
        n_group=2,
        topk_group=1,
        topk_method="noaux_tc",
        rope_interleave=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(63), dtype=jnp.float32)
    mesh = make_mesh(("pp",), devices=jax.devices()[:2])
    pp_params = stack_stages(mesh, params, 2)

    B, T = 2, 9
    ids = jax.random.randint(jax.random.PRNGKey(64), (B, T), 0, 64)
    want = np.asarray(forward_train(params, cfg, ids))
    got = np.asarray(pipeline_forward_train(mesh, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    mesh2 = make_mesh(("pp", "tp"), devices=jax.devices()[:4], shape=(2, 2))
    pp2 = stack_stages(mesh2, params, 2, tp=True)
    qb = pp2["blocks"]["q_b_proj"]  # head blocks column-shard over 'tp'
    assert qb.sharding.shard_shape(qb.shape) == (
        qb.shape[0] // 2, qb.shape[1], qb.shape[2] // 2, qb.shape[3]
    )
    got2 = np.asarray(pipeline_forward_train(mesh2, cfg, pp2, ids, 2))
    np.testing.assert_allclose(got2, want, rtol=2e-5, atol=2e-5)


def test_pipeline_gptoss_moe_pp_and_pp_tp():
    """GPT-OSS MoE blocks (fused interleaved experts, sinks, router bias)
    pipeline correctly under pp AND pp x tp: gate_up column-shards its
    interleaved dim (even slices keep every (gate, up) pair intact), down
    row-shards, down_bias rides replicated pre-scaled by 1/n_tp so the
    row-parallel psum counts it once, and the per-head sinks slice with
    the tp head split."""
    import dataclasses

    from shardmerge_tpu.models.llama import forward_train, init_params
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = dataclasses.replace(
        _moe_pp_cfg(layers=4),
        model_type="gpt_oss",
        sliding_window=3,  # gpt-oss alternates sliding/full per layer
    )
    params = init_params(cfg, jax.random.PRNGKey(25), dtype=jnp.float32)
    assert "gptoss_experts" in params["layers"][0]
    mesh = make_mesh(("pp",), devices=jax.devices()[:4])
    pp_params = stack_stages(mesh, params, 4)

    B, T = 4, 9
    ids = jax.random.randint(
        jax.random.PRNGKey(26), (B, T), 0, cfg.vocab_size
    )
    want = np.asarray(forward_train(params, cfg, ids))
    got = np.asarray(pipeline_forward_train(mesh, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    mesh2 = make_mesh(("pp", "tp"), devices=jax.devices()[:4], shape=(2, 2))
    pp2 = stack_stages(mesh2, params, 2, tp=True)
    ge = pp2["blocks"]["gptoss_experts"]
    gu = ge["gate_up"]  # (S, per, E, hidden, 2*inter): cols shard over tp
    assert gu.sharding.shard_shape(gu.shape) == (
        1, gu.shape[1], gu.shape[2], gu.shape[3], gu.shape[4] // 2
    )
    dw = ge["down"]  # (S, per, E, inter, hidden): rows shard over tp
    assert dw.sharding.shard_shape(dw.shape)[3] == dw.shape[3] // 2
    sinks = pp2["blocks"]["sinks"]  # per-head: slices with the head split
    assert sinks.sharding.shard_shape(sinks.shape)[2] == sinks.shape[2] // 2
    # down_bias replicates, pre-scaled so the psum counts it exactly once
    db = ge["down_bias"]
    assert db.sharding.shard_shape(db.shape) == (1,) + db.shape[1:]
    np.testing.assert_allclose(
        np.asarray(jax.device_get(db))[0],
        np.stack([
            np.asarray(l["gptoss_experts"]["down_bias"])
            for l in params["layers"][:2]
        ]) / 2,
    )
    got2 = np.asarray(pipeline_forward_train(mesh2, cfg, pp2, ids, 2))
    np.testing.assert_allclose(got2, want, rtol=2e-5, atol=2e-5)


def test_huge_tensors_route_to_mesh_not_host(mesh, tmp_path, tiny_model_factory):
    """With a mesh, a tensor over the huge-tensor working-set bound shards
    over the mesh (its working set divides across devices) instead of
    falling back to the host CPU backend; without a mesh the documented
    host fallback stands (merge/base.py _device_for)."""
    from shardmerge_tpu.config import MergeConfig, MergeModel
    from shardmerge_tpu.io.index import OfflineMultiModelIndex
    from shardmerge_tpu.merge import FourierMerge

    base_path, _ = tiny_model_factory("base", seed=400)
    ft_path, _ = tiny_model_factory("ft", seed=401)
    config = MergeConfig(
        finetune_merge=[MergeModel(model=str(ft_path), base=str(base_path))],
        output_base_model=str(base_path),
        output_dir=str(tmp_path / "m"),
        cache_dir=str(tmp_path / "c"),
        storage_dir=str(tmp_path / "s"),
    )
    index = OfflineMultiModelIndex()
    # default shard_min_bytes (1 GiB) stays: only the huge trigger fires
    merger = FourierMerge(
        config, index_manager=index, mesh=mesh, huge_tensor_numel=24 * 16
    )
    assert merger.huge_tensor_numel == 24 * 16  # kwargs reach the base now
    huge = np.zeros((24, 16), np.float32)
    assert merger._sharding_for(huge) is not None
    assert merger._sharding_for(np.zeros((8, 16), np.float32)) is None
    # the sharding wins inside _place: the host-CPU pin never engages
    placed = merger._place(huge, "w")
    assert len(placed.sharding.device_set) == mesh.devices.size
    # no mesh -> huge tensors keep the host-CPU fallback
    nomesh = FourierMerge(config, index_manager=index, huge_tensor_numel=24 * 16)
    assert nomesh._sharding_for(huge) is None


def test_cli_auto_mesh_default(tmp_path, tiny_model_factory):
    """shard_tensors unset (auto): the merge CLI creates the mesh on its own
    when more than one device is visible, and the sharded result matches a
    shard_tensors: false run."""
    import json as _json

    import yaml
    from click.testing import CliRunner

    from shardmerge_tpu.cli import cli
    from tests.test_merge_engine import _read_output

    base_path, _ = tiny_model_factory("base", seed=410)
    ft1_path, _ = tiny_model_factory("f1", seed=411)
    ft2_path, _ = tiny_model_factory("f2", seed=412)

    def run(subdir, extra):
        cfg = {
            "output_base_model": str(base_path),
            "finetune_merge": [
                {"model": str(ft1_path), "base": str(base_path), "alpha": 0.7},
                {"model": str(ft2_path), "base": str(base_path), "alpha": 0.4},
            ],
            "output_dir": str(tmp_path / subdir / "merged"),
            "cache_dir": str(tmp_path / subdir / "cache"),
            "storage_dir": str(tmp_path / subdir / "storage"),
            **extra,
        }
        cfg_path = tmp_path / f"{subdir}.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        result = CliRunner().invoke(cli, ["merge", str(cfg_path)])
        assert result.exit_code == 0, result.output
        return _read_output(tmp_path / subdir / "merged")

    # auto (key absent) + a tiny threshold: every 2-D tensor shards
    sharded = run("auto", {"shard_min_bytes": 256})
    plain = run("plain", {"shard_tensors": False})
    assert set(sharded) == set(plain)
    for name in plain:
        a = sharded[name].astype(np.float32)
        b = plain[name].astype(np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        close = np.isclose(a, b, rtol=2e-2, atol=2e-2 * scale)
        # tiny tensors: distributed-FFT rounding flips a handful of
        # threshold-boundary elements vs the single-chip exact path
        assert close.mean() > 0.94, name


def _deepseek_cfg(layers: int, first_k: int):
    from shardmerge_tpu.models.llama import ModelConfig

    return ModelConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=32,
        num_hidden_layers=layers,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=64,
        model_type="deepseek_v3",
        q_lora_rank=24,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        num_local_experts=4,
        num_experts_per_tok=2,
        n_shared_experts=1,
        first_k_dense_replace=first_k,
        n_group=2,
        topk_group=1,
        topk_method="noaux_tc",
        rope_interleave=True,
    )


def test_pipeline_deepseek_dense_prefix():
    """Real-checkpoint-shaped DeepSeek (first_k_dense_replace=1) pipelines:
    the dense layer replicates as a pre-pipeline prefix (auto-detected) and
    the homogeneous MoE remainder stage-stacks — logits AND grads match the
    unpipelined forward, pp-only and pp x tp."""
    from shardmerge_tpu.models.llama import forward_train, init_params
    from shardmerge_tpu.parallel.pipeline import (
        make_pp_loss,
        pipeline_forward_train,
        stack_stages,
    )
    from shardmerge_tpu.parallel.train import _loss_fn

    cfg = _deepseek_cfg(layers=3, first_k=1)
    params = init_params(cfg, jax.random.PRNGKey(70), dtype=jnp.float32)
    assert "experts" not in params["layers"][0]
    assert "experts" in params["layers"][1]

    mesh = make_mesh(("pp",), devices=jax.devices()[:2])
    pp_params = stack_stages(mesh, params, 2)
    assert len(pp_params["prefix_blocks"]) == 1
    # the prefix layer replicates over the mesh
    gate_w = pp_params["prefix_blocks"][0]["gate_proj"]
    assert gate_w.sharding.is_fully_replicated

    B, T = 2, 9
    ids = jax.random.randint(jax.random.PRNGKey(71), (B, T), 0, 64)
    want = np.asarray(forward_train(params, cfg, ids))
    got = np.asarray(pipeline_forward_train(mesh, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # grads flow through the replicated prefix too
    batch = jax.random.randint(jax.random.PRNGKey(72), (2, 10), 0, 64)
    loss_fn = make_pp_loss(mesh, cfg, n_microbatches=2)
    pp_loss, pp_grads = jax.value_and_grad(loss_fn)(pp_params, batch)
    ref_loss, _ = jax.value_and_grad(_loss_fn)(params, cfg, batch)
    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    for leaf in jax.tree.leaves(pp_grads["prefix_blocks"]):
        assert np.all(np.isfinite(np.asarray(leaf)))

    mesh2 = make_mesh(("pp", "tp"), devices=jax.devices()[:4], shape=(2, 2))
    pp2 = stack_stages(mesh2, params, 2, tp=True)
    got2 = np.asarray(pipeline_forward_train(mesh2, cfg, pp2, ids, 2))
    np.testing.assert_allclose(got2, want, rtol=2e-5, atol=2e-5)


def test_pipeline_prefix_divisibility_hint():
    """When the pipelined remainder does not divide the stage count, the
    error suggests n_prefix_layers; replicating one MoE layer into the
    prefix restores divisibility and exactness (the DeepSeek-V2 1+59 case
    in miniature)."""
    from shardmerge_tpu.models.llama import forward_train, init_params
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = _deepseek_cfg(layers=4, first_k=1)  # 1 dense + 3 MoE; pp=2
    params = init_params(cfg, jax.random.PRNGKey(73), dtype=jnp.float32)
    mesh = make_mesh(("pp",), devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="n_prefix_layers"):
        stack_stages(mesh, params, 2)
    with pytest.raises(ValueError, match="heterogeneous"):
        stack_stages(mesh, params, 2, n_prefix_layers=0)

    pp_params = stack_stages(mesh, params, 2, n_prefix_layers=2)
    assert len(pp_params["prefix_blocks"]) == 2

    B, T = 2, 9
    ids = jax.random.randint(jax.random.PRNGKey(74), (B, T), 0, 64)
    want = np.asarray(forward_train(params, cfg, ids))
    got = np.asarray(pipeline_forward_train(mesh, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "axes,shape",
    [
        (("dp", "cp"), (2, 4)),
        (("dp", "cp", "tp"), (2, 2, 2)),
    ],
)
def test_train_with_context_parallel(axes, shape):
    """cp composes into training (dp x cp [x tp] in one shard_map): loss
    AND grads of the ring-attention sequence-sharded step equal the
    unsharded single-device step; the full adamw train step runs and its
    loss matches make_train_step's on the same batch."""
    from shardmerge_tpu.models.llama import init_params
    from shardmerge_tpu.parallel.train import (
        _loss_fn,
        make_cp_loss,
        make_cp_train_step,
    )

    cfg = _pp_cfg(layers=2)
    params = init_params(cfg, jax.random.PRNGKey(80), dtype=jnp.float32)
    mesh = make_mesh(axes, devices=jax.devices()[: int(np.prod(shape))],
                     shape=shape)

    B, T = 4, 16  # T divides cp; B divides dp
    batch = jax.random.randint(
        jax.random.PRNGKey(81), (B, T + 1), 0, cfg.vocab_size
    )

    loss_fn = make_cp_loss(mesh, cfg, params)
    cp_loss, cp_grads = jax.value_and_grad(loss_fn)(params, batch)
    ref_loss, ref_grads = jax.value_and_grad(_loss_fn)(params, cfg, batch)
    np.testing.assert_allclose(float(cp_loss), float(ref_loss), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        ),
        cp_grads,
        ref_grads,
    )

    # remat is loss-invariant through the cp path too
    loss_r = make_cp_loss(mesh, cfg, params, remat=True)(params, batch)
    np.testing.assert_allclose(float(loss_r), float(cp_loss), rtol=1e-6)

    # the full train step: state shards, loss matches the dp x tp step
    init_state, train_step = make_cp_train_step(mesh, cfg, params)
    state = init_state(params)
    state2, loss0 = train_step(state, batch)
    np.testing.assert_allclose(float(loss0), float(ref_loss), rtol=1e-5)
    for leaf in jax.tree.leaves(state2["params"]):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # ZeRO-1 composes: moments shard over every data axis present, the
    # first-step loss is unchanged. Fresh params: the donated train step
    # above consumed the originals (device_put aliases on matching
    # placement — CLAUDE.md gotcha)
    z1_params = init_params(cfg, jax.random.PRNGKey(80), dtype=jnp.float32)
    z1_init, z1_step = make_cp_train_step(mesh, cfg, z1_params, zero1=True)
    z1_state, z1_loss = z1_step(z1_init(z1_params), batch)
    np.testing.assert_allclose(float(z1_loss), float(loss0), rtol=1e-5)
    mu_leaf = z1_state["opt_state"][0].mu["layers"][0]["q_proj"]
    flat_axes = set()
    for entry in mu_leaf.sharding.spec:
        if entry is None:
            continue
        flat_axes.update(entry if isinstance(entry, tuple) else (entry,))
    expected = {a for a in ("dp", "cp") if a in mesh.axis_names}
    assert expected <= flat_axes, (mu_leaf.sharding.spec, expected)


@pytest.mark.parametrize(
    "name,cfg_kw",
    [
        ("mistral_sliding", dict(model_type="mistral", sliding_window=6)),
        (
            "gemma2_softcap_alternating_windows",
            dict(
                model_type="gemma2",
                attn_logit_softcapping=30.0,
                final_logit_softcapping=30.0,
                sliding_window=6,
                query_pre_attn_scalar=16,
            ),
        ),
        (
            "gptoss_sinks_sliding",
            dict(
                model_type="gpt_oss",
                sliding_window=6,
                layer_types=[
                    "sliding_attention",
                    "full_attention",
                    "sliding_attention",
                    "full_attention",
                ],
                num_local_experts=4,
                num_experts_per_tok=2,
                norm_topk_prob=True,
            ),
        ),
        (
            "llama4_chunked",
            dict(
                attention_chunk_size=8,
                layer_types=[
                    "chunked_attention",
                    "full_attention",
                    "chunked_attention",
                    "full_attention",
                ],
            ),
        ),
    ],
)
def test_cp_attention_variants_match_unsharded(name, cfg_kw):
    """Sliding windows (with the BOUNDED hop schedule), gemma2
    softcapping, gpt-oss sinks, and llama4 chunked attention all compose
    with context-parallel training: loss and grads of the ring step equal
    the unsharded forward_train reference for each family."""
    import dataclasses

    from shardmerge_tpu.models.llama import init_params
    from shardmerge_tpu.parallel.train import _loss_fn, make_cp_loss

    cfg = dataclasses.replace(_pp_cfg(layers=4), **cfg_kw)
    params = init_params(cfg, jax.random.PRNGKey(83), dtype=jnp.float32)
    if name.startswith("gptoss"):
        assert "sinks" in params["layers"][0]
        # non-zero sinks so the renormalization actually moves the output
        for li, layer in enumerate(params["layers"]):
            layer["sinks"] = (
                jax.random.normal(
                    jax.random.PRNGKey(90 + li),
                    (cfg.num_attention_heads,),
                    jnp.float32,
                )
                * 0.5
            )
    mesh = make_mesh(("dp", "cp"), devices=jax.devices()[:8], shape=(2, 4))

    B, T = 4, 16  # window (6) < T and chunk (8) < T: locality is real
    batch = jax.random.randint(
        jax.random.PRNGKey(84), (B, T + 1), 0, cfg.vocab_size
    )
    loss_fn = make_cp_loss(mesh, cfg, params)
    cp_loss, cp_grads = jax.value_and_grad(loss_fn)(params, batch)
    ref_loss, ref_grads = jax.value_and_grad(_loss_fn)(params, cfg, batch)
    np.testing.assert_allclose(float(cp_loss), float(ref_loss), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        ),
        cp_grads,
        ref_grads,
    )


def test_cp_window_skips_out_of_window_hops():
    """The ring schedule for a sliding window runs ceil(w/Tl)+1 hops, not
    n_dev — blocks entirely behind the window are never shipped. Pinned
    by counting the scan length in the jaxpr of the windowed kernel."""
    from functools import partial

    from shardmerge_tpu.parallel.ring import _ring_body

    n_dev = 8
    mesh = make_mesh(("cp",), devices=jax.devices()[:8], shape=(8,))
    Tl = 4  # local block; window 6 -> ceil(6/4)+1 = 3 hops, not 8

    def count_scan_lengths(window):
        fn = jax.shard_map(
            partial(
                _ring_body,
                n_dev=n_dev,
                scale=jnp.float32(0.5),
                window=window,
            ),
            mesh=mesh,
            in_specs=(P(None, None, "cp", None),) * 3,
            out_specs=P(None, None, "cp", None),
        )
        shape = jax.ShapeDtypeStruct((1, 2, Tl * n_dev, 8), jnp.float32)
        jaxpr = jax.make_jaxpr(fn)(shape, shape, shape)
        lengths = []

        def walk(jx):
            # params may hold ClosedJaxpr (.jaxpr), raw Jaxpr (.eqns),
            # or tuples of either — descend into all of them
            if hasattr(jx, "jaxpr"):
                jx = jx.jaxpr
            if not hasattr(jx, "eqns"):
                return
            for eqn in jx.eqns:
                if eqn.primitive.name == "scan":
                    lengths.append(eqn.params["length"])
                for v in eqn.params.values():
                    for sub in v if isinstance(v, (tuple, list)) else (v,):
                        if hasattr(sub, "jaxpr") or hasattr(sub, "eqns"):
                            walk(sub)
        walk(jaxpr.jaxpr)
        return lengths

    assert 3 in count_scan_lengths(6)
    assert 8 in count_scan_lengths(None)


def test_cp_loss_rejects_incompatible_attention():
    """The one remaining structural refusal: MLA (no per-head K/V to
    ring). gpt-oss under 'tp' now composes (expert-dim sharding —
    test_cp_gptoss_trains_under_tp); only indivisible expert counts
    refuse there."""
    import dataclasses

    from shardmerge_tpu.models.llama import init_params
    from shardmerge_tpu.parallel.train import make_cp_loss

    cfg = _pp_cfg(layers=2)
    params = init_params(cfg, jax.random.PRNGKey(82), dtype=jnp.float32)

    mla = dataclasses.replace(
        cfg,
        model_type="deepseek_v2",
        q_lora_rank=16,
        kv_lora_rank=16,
        qk_nope_head_dim=8,
        qk_rope_head_dim=4,
        v_head_dim=8,
    )
    mesh = make_mesh(("dp", "cp"), devices=jax.devices()[:4], shape=(2, 2))
    with pytest.raises(NotImplementedError, match="MLA"):
        make_cp_loss(mesh, mla, params)


def test_repack4_tp_blocked_matches_contiguous_slices():
    """The tp-blocked int4 repack invariant: slicing the repacked buffer
    into n_tp equal blocks and unpacking each block yields exactly the
    contiguous reduction columns [r*K/T, (r+1)*K/T) of the original
    full-K split-half unpack — for every block, any leading shape."""
    from shardmerge_tpu.models.quant import _pack4, _unpack4
    from shardmerge_tpu.parallel.pipeline import _repack4_tp_blocked

    rng = np.random.default_rng(7)
    q = rng.integers(-7, 8, size=(3, 5, 48), dtype=np.int8)
    packed = _pack4(q.reshape(-1, 48)).reshape(3, 5, 24)
    for n_tp in (2, 4):
        rp = _repack4_tp_blocked(packed, n_tp)
        blk = 48 // n_tp
        for r in range(n_tp):
            shard = jnp.asarray(
                rp[..., r * blk // 2 : (r + 1) * blk // 2]
            )
            got = np.asarray(_unpack4(shard, axis=-1))
            np.testing.assert_array_equal(
                got, q[..., r * blk : (r + 1) * blk]
            )

    # fused (E, in, out) stacks pack the MIDDLE axis (_pack4 axis 1);
    # axis=ndim-2 must slice to the same contiguous reduction rows
    qm = rng.integers(-7, 8, size=(3, 48, 5), dtype=np.int8)
    pm = _pack4(qm)  # (3, 24, 5) — axis 1 is the packed axis
    rpm = _repack4_tp_blocked(pm, 2, axis=1)
    for r in range(2):
        shard = jnp.asarray(rpm[:, r * 12 : (r + 1) * 12, :])
        got = np.asarray(_unpack4(shard, axis=1))
        np.testing.assert_array_equal(got, qm[:, r * 24 : (r + 1) * 24, :])


def test_pipeline_quantized_dense_stacks():
    """int8/int4 serving-representation weights pipeline pp AND pp x tp:
    the {'q','scale'} dicts stage-stack like raw leaves and dequantize
    inside the scanned stage body; under tp, column-parallel owners slice
    q and its per-output-channel scale on the out dim while row-parallel
    owners slice q's reduction dim (int4 packed buffers tp-block-repacked
    at stack time) with scale replicated — logits equal forward_train on
    the SAME quantized params either way."""
    import dataclasses

    from shardmerge_tpu.models.llama import forward_train, init_params
    from shardmerge_tpu.models.quant import quantize
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = dataclasses.replace(_pp_cfg(layers=4), num_key_value_heads=4)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    proj = ("q_proj", "k_proj", "v_proj", "o_proj",
            "gate_proj", "up_proj", "down_proj")
    for bits in (8, 4):
        qparams = {
            "embed_tokens": quantize(params["embed_tokens"], bits),
            "norm": params["norm"],
            "lm_head": params["lm_head"],
            "layers": [
                {
                    k: (quantize(v, bits) if k in proj else v)
                    for k, v in layer.items()
                }
                for layer in params["layers"]
            ],
        }
        ids = jax.random.randint(
            jax.random.PRNGKey(6), (4, 7), 0, cfg.vocab_size
        )
        want = np.asarray(forward_train(qparams, cfg, ids))

        mesh = make_mesh(("pp",), devices=jax.devices()[:2])
        pp_params = stack_stages(mesh, qparams, 2)
        got = np.asarray(
            pipeline_forward_train(mesh, cfg, pp_params, ids, 2)
        )
        # dequantized weights are bf16, so activations carry bf16 ulps and
        # the scanned stage body reassociates differently from the
        # unrolled loop — tolerance is bf16-scale, not fp32-scale
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=4e-3)

        mesh2 = make_mesh(
            ("pp", "tp"), devices=jax.devices()[:4], shape=(2, 2)
        )
        tp_params = stack_stages(mesh2, qparams, 2, tp=True)
        # column-parallel q_proj: q AND scale slice the out dim
        q = tp_params["blocks"]["q_proj"]
        assert q["q"].sharding.shard_shape(q["q"].shape)[2] \
            == q["q"].shape[2] // 2
        assert q["scale"].sharding.shard_shape(q["scale"].shape)[2] \
            == q["scale"].shape[2] // 2
        # row-parallel o_proj: q slices the (packed) reduction dim,
        # scale replicates within the stage (only 'pp' shards it)
        o = tp_params["blocks"]["o_proj"]
        assert o["q"].sharding.shard_shape(o["q"].shape)[3] \
            == o["q"].shape[3] // 2
        assert o["scale"].sharding.shard_shape(o["scale"].shape) \
            == (o["scale"].shape[0] // 2, *o["scale"].shape[1:])
        got_tp = np.asarray(
            pipeline_forward_train(mesh2, cfg, tp_params, ids, 2)
        )
        np.testing.assert_allclose(got_tp, want, rtol=2e-2, atol=4e-3)


def test_engine_mesh_shards_3d_expert_stacks(tmp_path, mesh):
    """ndim>=3 tensors (fused MoE expert stacks) shard over the LEADING dim:
    every per-slice FFT is device-local (no all-to-all) and the global
    reductions all-reduce via GSPMD on the ordinary kernels. Output equals
    the single-device merge."""
    import asyncio
    import json

    from shardmerge_tpu.config import MergeConfig, MergeModel
    from shardmerge_tpu.io import safetensors_io as stio
    from shardmerge_tpu.io.index import OfflineMultiModelIndex
    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader
    from shardmerge_tpu.merge import FourierMerge

    shapes = {
        "model.embed_tokens.weight": (16, 8),
        "model.layers.0.self_attn.q_proj.weight": (16, 16),
        "model.layers.0.feed_forward.experts.gate_up_proj": (8, 16, 24),
        "model.layers.0.feed_forward.experts.down_proj": (8, 12, 16),
        "model.layers.0.input_layernorm.weight": (16,),
        "model.norm.weight": (16,),
        "lm_head.weight": (16, 8),
    }

    def make(path, seed):
        gen = np.random.default_rng(seed)
        tensors = {
            n: gen.standard_normal(s).astype(np.float32)
            for n, s in shapes.items()
        }
        path.mkdir(parents=True)
        stio.save_file(tensors, path / "model.safetensors")
        index = {
            "metadata": {},
            "weight_map": {n: "model.safetensors" for n in shapes},
        }
        (path / "model.safetensors.index.json").write_text(json.dumps(index))
        return tensors

    make(tmp_path / "base", 300)
    make(tmp_path / "f1", 301)
    make(tmp_path / "f2", 302)

    def run(out_name, use_mesh):
        config = MergeConfig(
            finetune_merge=[
                MergeModel(
                    model=str(tmp_path / "f1"), base=str(tmp_path / "base"),
                    alpha=0.7,
                ),
                MergeModel(
                    model=str(tmp_path / "f2"), base=str(tmp_path / "base"),
                    alpha=0.3,
                ),
            ],
            output_base_model=str(tmp_path / "base"),
            output_dir=str(tmp_path / out_name),
            cache_dir=str(tmp_path / "cache"),
            storage_dir=str(tmp_path / "storage"),
            output_dtype="float32",
        )
        index = OfflineMultiModelIndex()
        for p in ("base", "f1", "f2"):
            index.add_model(tmp_path / p)
        merger = FourierMerge(
            config,
            index_manager=index,
            mesh=mesh if use_mesh else None,
            shard_min_bytes=0,
        )
        asyncio.run(merger.merge())
        out = {}
        with SafeTensorsReader(tmp_path / out_name / "model.safetensors") as r:
            for k in r.keys():
                out[k] = r.get_tensor(k, copy=True)
        return out, merger

    single, _ = run("merged_single", use_mesh=False)
    sharded, merger = run("merged_mesh", use_mesh=True)

    # the 3-D stacks (and 2-D tensors) were actually mesh-placed
    assert merger.stats.tensors_sharded > 0
    for name in shapes:
        np.testing.assert_allclose(
            sharded[name], single[name], rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_sharding_for_3d_policy(mesh):
    """Leading-dim sharding engages only when the leading dim divides the
    mesh (zero-pad slices would corrupt the global percentile ranks)."""
    from shardmerge_tpu.config import MergeConfig, MergeModel
    from shardmerge_tpu.merge import FourierMerge

    config = MergeConfig(
        finetune_merge=[MergeModel(model="m", base="b")],
        output_base_model="b",
        output_dir="/tmp/none",
    )
    merger = FourierMerge(config, mesh=mesh, shard_min_bytes=0)

    s3 = merger._sharding_for(np.zeros((8, 4, 6), np.float32))
    assert s3 is not None and s3.spec == ("x", None, None)
    # 7 % 8 != 0 -> no sharding (and no padding for 3-D)
    assert merger._sharding_for(np.zeros((7, 4, 6), np.float32)) is None
    # 4-D stacks shard on the leading dim too
    s4 = merger._sharding_for(np.zeros((16, 2, 4, 6), np.float32))
    assert s4 is not None and s4.spec == ("x", None, None, None)
    # 1-D never shards
    assert merger._sharding_for(np.zeros((64,), np.float32)) is None


def test_pipeline_llama4_moe_pp_and_pp_tp(tmp_path):
    """Homogeneous (Scout-style, every layer MoE) Llama-4 stacks pipeline:
    the fused llama4_experts dict stage-stacks, and under pp x tp the
    gate/up halves are block-permuted so the Megatron column slice hands
    each device matched gate/up columns (stack_stages) — logits equal
    forward_train both ways. Interleaved stacks (step > 1) are covered by
    test_pipeline_llama4_interleaved_maverick."""
    import torch
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    from shardmerge_tpu.models.llama import ModelConfig, forward_train
    from shardmerge_tpu.models.loader import load_params
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    torch.manual_seed(27)
    config = Llama4TextConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=48,
        intermediate_size_mlp=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        num_local_experts=4,
        num_experts_per_tok=2,
        interleave_moe_layer_step=1,  # every layer MoE -> homogeneous
        no_rope_layers=[1, 1, 0, 1],
        attention_chunk_size=4,
        attn_temperature_tuning=True,
        floor_scale=2.0,
        use_qk_norm=True,
        max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    model = Llama4ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "l4pp"
    model.save_pretrained(str(path), safe_serialization=True)

    cfg = ModelConfig.from_pretrained(path)
    assert all(cfg.layer_is_moe(i) for i in range(4))
    params = load_params(path, cfg, dtype=jnp.float32)

    B, T = 2, 9
    ids = jax.random.randint(jax.random.PRNGKey(13), (B, T), 0, cfg.vocab_size)
    want = np.asarray(forward_train(params, cfg, ids))

    # pp-only over 4 stages
    mesh_pp = make_mesh(("pp",), devices=jax.devices()[:4])
    pp_params = stack_stages(mesh_pp, params, 4)
    got = np.asarray(pipeline_forward_train(mesh_pp, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # pp x tp (2, 2)
    mesh_2d = make_mesh(("pp", "tp"), devices=jax.devices()[:4], shape=(2, 2))
    pp_tp_params = stack_stages(mesh_2d, params, 2, tp=True)
    gu = pp_tp_params["blocks"]["llama4_experts"]["gate_up"]
    # (S, per, E, hidden, 2I) sliced on the (permuted) last dim
    assert gu.sharding.shard_shape(gu.shape) == (1, 2, 4, 32, 48)
    got2 = np.asarray(
        pipeline_forward_train(mesh_2d, cfg, pp_tp_params, ids, 2)
    )
    np.testing.assert_allclose(got2, want, rtol=2e-5, atol=2e-5)


def test_pipeline_llama4_interleaved_maverick(tmp_path):
    """Interleaved dense/MoE Llama-4 stacks (Maverick's
    interleave_moe_layer_step=2) pipeline via PERIODIC kind slots: dense
    and MoE layers stack into separate (S, per/p, ...) leaves and the
    schedule scans over periods, applying the slots in original layer
    order — pp and pp x tp logits equal forward_train, the pp loss/grads
    match the unpipelined loss, and non-aligned stage counts or prefixes
    that break the pattern fail loudly.

    Reference has no pipeline at all (merge-only); this closes the round-4
    boundary 'interleaved stacks (interleave step > 1) remain loud'.
    HF reference semantics: configuration_llama4.Llama4TextConfig
    (moe_layers = every interleave_moe_layer_step-th layer)."""
    import torch
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    from shardmerge_tpu.models.llama import ModelConfig, forward_train
    from shardmerge_tpu.models.loader import load_params
    from shardmerge_tpu.parallel.pipeline import (
        make_pp_loss,
        pipeline_forward_train,
        stack_stages,
    )

    torch.manual_seed(41)
    config = Llama4TextConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=48,
        intermediate_size_mlp=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        num_local_experts=4,
        num_experts_per_tok=2,
        interleave_moe_layer_step=2,  # layers 1, 3 MoE; 0, 2 dense
        no_rope_layers=[1, 1, 0, 1],
        attention_chunk_size=4,
        attn_temperature_tuning=True,
        floor_scale=2.0,
        use_qk_norm=True,
        max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    model = Llama4ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "l4mav"
    model.save_pretrained(str(path), safe_serialization=True)

    cfg = ModelConfig.from_pretrained(path)
    assert [cfg.layer_is_moe(i) for i in range(4)] == [
        False, True, False, True,
    ]
    params = load_params(path, cfg, dtype=jnp.float32)

    B, T = 2, 9
    ids = jax.random.randint(jax.random.PRNGKey(17), (B, T), 0, cfg.vocab_size)
    want = np.asarray(forward_train(params, cfg, ids))

    # pp-only over 2 stages: each stage holds one (dense, moe) period
    mesh_pp = make_mesh(("pp",), devices=jax.devices()[:2])
    pp_params = stack_stages(mesh_pp, params, 2)
    slots = pp_params["blocks"]["period_slots"]
    assert len(slots) == 2
    assert "llama4_experts" in slots[1] and "llama4_experts" not in slots[0]
    got = np.asarray(pipeline_forward_train(mesh_pp, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # the pp loss (and its grads) ride the periodic schedule too
    batch = jax.random.randint(
        jax.random.PRNGKey(18), (2, 10), 0, cfg.vocab_size
    )
    from shardmerge_tpu.parallel.train import _loss_fn

    loss_fn = make_pp_loss(mesh_pp, cfg, n_microbatches=2)
    pp_loss, pp_grads = jax.value_and_grad(loss_fn)(pp_params, batch)
    ref_loss = _loss_fn(params, cfg, batch)
    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    for leaf in jax.tree.leaves(pp_grads["blocks"]):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # pp x tp: dense slots Megatron-slice their intermediate_size_mlp,
    # MoE slots their (permuted) expert gate/up halves
    mesh_2d = make_mesh(("pp", "tp"), devices=jax.devices()[:4], shape=(2, 2))
    pp_tp_params = stack_stages(mesh_2d, params, 2, tp=True)
    gu = pp_tp_params["blocks"]["period_slots"][1]["llama4_experts"]["gate_up"]
    assert gu.sharding.shard_shape(gu.shape) == (1, 1, 4, 32, 48)
    dense_gate = pp_tp_params["blocks"]["period_slots"][0]["gate_proj"]
    assert dense_gate.sharding.shard_shape(dense_gate.shape) == (1, 1, 32, 32)
    got2 = np.asarray(
        pipeline_forward_train(mesh_2d, cfg, pp_tp_params, ids, 2)
    )
    np.testing.assert_allclose(got2, want, rtol=2e-5, atol=2e-5)

    # the pp TRAIN step rides the periodic tree too: moments inherit the
    # per-slot stage placement (derived from each leaf's own sharding)
    from shardmerge_tpu.parallel.train import make_pp_train_step

    init_state, train_step = make_pp_train_step(
        mesh_pp, cfg, n_microbatches=2, learning_rate=1e-3
    )
    state = init_state(pp_params)
    state, loss0 = train_step(state, batch)
    state, loss1 = train_step(state, batch)
    assert np.isfinite(float(loss0)) and float(loss1) < float(loss0)

    # 4 stages would put one layer per stage — stages would be
    # structurally different; refused with the period in the message
    mesh_4 = make_mesh(("pp",), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="period"):
        stack_stages(mesh_4, params, 4)

    # a prefix that breaks the alternation leaves a heterogeneous,
    # aperiodic remainder — refused
    with pytest.raises(ValueError, match="heterogeneous"):
        stack_stages(mesh_pp, params, 2, n_prefix_layers=1)


def test_pipeline_gemma3_dual_rope():
    """Gemma3 stacks pipeline: the per-layer DUAL rope table (local for
    sliding layers, scaled-global otherwise) rides the schedule's
    static-or-gathered select; pp logits == forward_train. Also pinned
    under cp and ep-free train paths via layer_rope."""
    import dataclasses

    from shardmerge_tpu.models.llama import (
        ModelConfig,
        forward_train,
        init_params,
    )
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )

    cfg = dataclasses.replace(
        _pp_cfg(layers=4),
        model_type="gemma3_text",
        sliding_window=4,
        layer_types=(
            "sliding_attention",
            "full_attention",
            "sliding_attention",
            "full_attention",
        ),
        rope_local_base_freq=10_000.0,
        rope_theta=1_000_000.0,
        rope_scaling={"rope_type": "linear", "factor": 8.0},
        query_pre_attn_scalar=8.0,
        qk_norm=True,
        hidden_act="gelu_pytorch_tanh",
        head_dim_override=8,
    )
    params = init_params(cfg, jax.random.PRNGKey(91), dtype=jnp.float32)
    assert "pre_feedforward_layernorm" in params["layers"][0]
    ids = jax.random.randint(jax.random.PRNGKey(92), (4, 9), 0, 64)
    want = np.asarray(forward_train(params, cfg, ids))

    mesh = make_mesh(("pp",), devices=jax.devices()[:2])
    pp_params = stack_stages(mesh, params, 2)
    got = np.asarray(pipeline_forward_train(mesh, cfg, pp_params, ids, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # cp training with the dual tables: loss+grads == unsharded
    from shardmerge_tpu.parallel.train import _loss_fn, make_cp_loss

    cp_mesh = make_mesh(("dp", "cp"), devices=jax.devices()[:4], shape=(2, 2))
    batch = jax.random.randint(jax.random.PRNGKey(93), (4, 9), 0, 64)
    cp_loss = make_cp_loss(cp_mesh, cfg, params)(params, batch)
    ref_loss = _loss_fn(params, cfg, batch)
    np.testing.assert_allclose(float(cp_loss), float(ref_loss), rtol=1e-5)


def test_cp_gptoss_trains_under_tp():
    """gpt-oss composes with cp x tp: fused expert stacks shard their
    EXPERT dim (replicated router, per-rank weighted expert math, routed
    sum on the body's row-parallel psum), sinks slice with the head
    split — loss AND grads equal the unsharded step."""
    import dataclasses

    from shardmerge_tpu.models.llama import init_params
    from shardmerge_tpu.parallel.train import _loss_fn, make_cp_loss

    cfg = dataclasses.replace(
        _pp_cfg(layers=2),
        model_type="gpt_oss",
        sliding_window=6,
        layer_types=("sliding_attention", "full_attention"),
        num_local_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(95), dtype=jnp.float32)
    for li, layer in enumerate(params["layers"]):
        layer["sinks"] = (
            jax.random.normal(
                jax.random.PRNGKey(96 + li),
                (cfg.num_attention_heads,),
                jnp.float32,
            )
            * 0.5
        )
    mesh = make_mesh(
        ("dp", "cp", "tp"), devices=jax.devices()[:8], shape=(2, 2, 2)
    )
    batch = jax.random.randint(jax.random.PRNGKey(97), (4, 17), 0, 64)

    loss_fn = make_cp_loss(mesh, cfg, params)
    cp_loss, cp_grads = jax.value_and_grad(loss_fn)(params, batch)
    ref_loss, ref_grads = jax.value_and_grad(_loss_fn)(params, cfg, batch)
    np.testing.assert_allclose(float(cp_loss), float(ref_loss), rtol=1e-5)
    for key in ("gate_up", "down", "gate_up_bias", "down_bias"):
        np.testing.assert_allclose(
            np.asarray(cp_grads["layers"][0]["gptoss_experts"][key]),
            np.asarray(ref_grads["layers"][0]["gptoss_experts"][key]),
            rtol=5e-4,
            atol=5e-5,
        )
    np.testing.assert_allclose(
        np.asarray(cp_grads["layers"][1]["sinks"]),
        np.asarray(ref_grads["layers"][1]["sinks"]),
        rtol=5e-4,
        atol=5e-5,
    )
    # indivisible expert counts refuse loudly
    import pytest as _pytest

    bad = dataclasses.replace(cfg, num_local_experts=3)
    with _pytest.raises(ValueError, match="experts must divide"):
        make_cp_loss(mesh, bad, params)
