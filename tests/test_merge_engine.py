"""End-to-end merge engine tests on tiny synthetic models (the coverage the
reference lacks — its `_merge_layer`/`merge()` are never executed in tests,
SURVEY.md §4)."""

import asyncio
import json

import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest
import torch

from shardmerge_tpu.config import MergeConfig, MergeModel
from shardmerge_tpu.io.index import OfflineMultiModelIndex
from shardmerge_tpu.io.safetensors_io import SafeTensorsReader
from shardmerge_tpu.merge import (
    AdditionMerge,
    FourierMerge,
    LegacyFourierMerge,
    TaskAdditionMerge,
)

from . import oracle_torch as oracle
from .conftest import TINY_SHAPES, TINY_SHARD_MAP


def _run_merge(merger):
    asyncio.run(merger.merge())


def _make_config(tmp_path, base_path, ft_entries, **kw):
    return MergeConfig(
        finetune_merge=[MergeModel(**e) for e in ft_entries],
        output_base_model=str(base_path),
        output_dir=str(tmp_path / "merged"),
        cache_dir=str(tmp_path / "cache"),
        storage_dir=str(tmp_path / "storage"),
        **kw,
    )


def _offline_index(*paths):
    index = OfflineMultiModelIndex()
    for p in paths:
        index.add_model(p)
    return index


def _read_output(out_dir):
    tensors = {}
    for shard in set(TINY_SHARD_MAP.values()):
        with SafeTensorsReader(out_dir / shard) as r:
            for k in r.keys():
                tensors[k] = r.get_tensor(k, copy=True)
    return tensors


def _oracle_fourier_pair(base, ft1, ft2, alpha1, alpha2, cull_start=0.20):
    """Torch oracle of fast_fourier._merge_layer for a 2-model stack
    (single reduction round), including the unswapped-weights quirk."""
    base = torch.from_numpy(base).float()
    d1 = torch.from_numpy(ft1).float() - base
    d2 = torch.from_numpy(ft2).float() - base
    norms = [d1.norm(), d2.norm()]
    target = torch.tensor(norms).mean().item() + 1e-10
    a, b = d1, d2
    aw, bw = alpha1, alpha2
    na, nb = norms[0].item(), norms[1].item()
    if abs(na) < abs(nb):
        a, b, na, nb = b, a, nb, na  # weights NOT swapped (reference quirk)
    cna, cnb = abs(na / target), abs(nb / target)
    ratio = cnb / (cna + 1e-10)
    if cna < 1e-6:
        merged = a + b
    elif cnb < 1e-6 or ratio < 0.1:
        ns = target / na
        ws = bw / (aw + 1e-10)
        merged = oracle.task_arithmetic_fft2(a * ns, b * ws * ns, t=1.0)
    else:
        ap = aw / (aw + bw)
        merged, _, _ = oracle.merge_tensors_fft2_slerp(
            a, b, t=ap, t_sum=1.0, cutoff_pct=0.08, cull_pct=cull_start
        )
        merged = merged * target
    out = base + merged
    out = torch.where(torch.isnan(out), torch.zeros_like(out), out)
    return out.to(torch.bfloat16).float().numpy()


def _mostly_close(ours, theirs, rtol, atol, max_flip_frac=0.03, max_flips=2):
    """Elementwise closeness with a bounded set of threshold-boundary flips.

    A "flip" is an element that landed on the other side of a cutoff/cull
    order statistic because of FFT-library rounding (NUMERICS.md §4). Two
    bounds so the check does work at every size: the FRACTION bound for
    large tensors and an ABSOLUTE bound for small ones (3% of a 256-element
    layernorm would be 7 free passes — VERDICT r1 weak #6). Flipped elements
    must still be magnitude-bounded: a flip moves a value by at most the
    relevant threshold, never to an arbitrary value.
    """
    close = np.isclose(ours, theirs, rtol=rtol, atol=atol)
    n_bad = int((~close).sum())
    limit = max(max_flips, int(np.ceil(max_flip_frac * close.size)))
    assert n_bad <= limit, f"{n_bad}/{close.size} mismatched (limit {limit})"
    if n_bad:
        scale = max(np.abs(theirs).max(), 1e-12)
        worst = float(np.abs(ours - theirs)[~close].max())
        assert worst <= 0.5 * scale, (
            f"flip magnitude {worst:.3e} exceeds half the output scale "
            f"{scale:.3e} — not a threshold-boundary flip"
        )


def test_single_finetune_merge(tmp_path, tiny_model_factory):
    """One finetune: the reduction loop is skipped and output == base + delta
    == finetune (alpha is NOT applied — reference apply_alpha=False)."""
    base_path, base_t = tiny_model_factory("base", seed=10)
    ft_path, ft_t = tiny_model_factory("ft1", seed=11)

    config = _make_config(
        tmp_path,
        base_path,
        [{"model": str(ft_path), "base": str(base_path), "alpha": 0.5}],
    )
    merger = FourierMerge(
        config, index_manager=_offline_index(base_path, ft_path)
    )
    _run_merge(merger)

    out_dir = tmp_path / "merged"
    assert (out_dir / "model.safetensors.index.json").exists()
    assert (out_dir / "README.md").exists()
    index = json.load(open(out_dir / "model.safetensors.index.json"))
    assert index["weight_map"] == TINY_SHARD_MAP

    out = _read_output(out_dir)
    assert set(out) == set(TINY_SHAPES)
    for name, arr in out.items():
        assert arr.dtype == np.dtype(ml_dtypes.bfloat16)

    # middle layers: base + (ft - base) == ft (within bf16)
    name = "model.layers.0.mlp.gate_proj.weight"
    np.testing.assert_allclose(
        out[name].astype(np.float32), ft_t[name], rtol=1e-2, atol=1e-2
    )
    # input/output passthrough falls back to... the base? No: no is_input
    # model is configured, so passthrough uses the BASE model's tensors.
    np.testing.assert_allclose(
        out["model.embed_tokens.weight"].astype(np.float32),
        base_t["model.embed_tokens.weight"],
        rtol=1e-2,
        atol=1e-2,
    )
    np.testing.assert_allclose(
        out["lm_head.weight"].astype(np.float32),
        base_t["lm_head.weight"],
        rtol=1e-2,
        atol=1e-2,
    )


def test_two_finetune_merge_matches_oracle(tmp_path, tiny_model_factory):
    base_path, base_t = tiny_model_factory("base", seed=20)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=21)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=22)

    config = _make_config(
        tmp_path,
        base_path,
        [
            {"model": str(ft1_path), "base": str(base_path), "alpha": 0.8},
            {"model": str(ft2_path), "base": str(base_path), "alpha": 0.4},
        ],
    )
    merger = FourierMerge(
        config, index_manager=_offline_index(base_path, ft1_path, ft2_path)
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    for name in [
        "model.layers.0.self_attn.q_proj.weight",
        "model.layers.1.mlp.down_proj.weight",
        "model.layers.0.input_layernorm.weight",  # 1-D path
    ]:
        expect = _oracle_fourier_pair(
            base_t[name], ft1_t[name], ft2_t[name], 0.8, 0.4
        )
        got = out[name].astype(np.float32)
        scale = max(np.abs(expect).max(), 1.0)
        _mostly_close(got, expect, rtol=2e-2, atol=2e-2 * scale)


DEEPSEEK_SHAPES = {
    "model.embed_tokens.weight": (32, 16),
    "model.layers.0.self_attn.q_a_proj.weight": (12, 16),
    "model.layers.0.self_attn.q_a_layernorm.weight": (12,),
    "model.layers.0.self_attn.q_b_proj.weight": (24, 12),
    "model.layers.0.self_attn.kv_a_proj_with_mqa.weight": (20, 16),
    "model.layers.0.self_attn.kv_a_layernorm.weight": (16,),
    "model.layers.0.self_attn.kv_b_proj.weight": (32, 16),
    "model.layers.0.self_attn.o_proj.weight": (16, 16),
    "model.layers.0.mlp.gate.weight": (8, 16),
    "model.layers.0.mlp.gate.e_score_correction_bias": (8,),
    **{
        f"model.layers.0.mlp.experts.{e}.{w}.weight": (
            (8, 16) if w in ("gate_proj", "up_proj") else (16, 8)
        )
        for e in range(4)
        for w in ("gate_proj", "up_proj", "down_proj")
    },
    "model.layers.0.mlp.shared_experts.gate_proj.weight": (8, 16),
    "model.layers.0.mlp.shared_experts.up_proj.weight": (8, 16),
    "model.layers.0.mlp.shared_experts.down_proj.weight": (16, 8),
    "model.layers.0.input_layernorm.weight": (16,),
    "model.layers.0.post_attention_layernorm.weight": (16,),
    "model.norm.weight": (16,),
    "lm_head.weight": (32, 16),
}


def _make_deepseek_model(path, seed):
    """Tiny sharded checkpoint with DeepSeek-MoE naming: MLA attention
    projections, per-expert mlp.experts.N.*, shared_experts, and the fp32
    router bias — the 'MoE / irregular indexes' hard part of SURVEY.md §7
    (ordered-weights discovery and shard mirroring must not assume llama
    component names or balanced shards)."""
    from shardmerge_tpu.io import safetensors_io as stio

    gen = np.random.default_rng(seed)
    tensors = {
        name: gen.standard_normal(shape).astype(np.float32)
        for name, shape in DEEPSEEK_SHAPES.items()
    }
    path.mkdir(parents=True, exist_ok=True)
    # deliberately unbalanced shard split: experts+router in shard 2
    shard_map = {
        name: (
            "model-00002-of-00002.safetensors"
            if ".mlp." in name
            else "model-00001-of-00002.safetensors"
        )
        for name in tensors
    }
    shards = {}
    for name, shard in shard_map.items():
        shards.setdefault(shard, {})[name] = tensors[name]
    for shard, content in shards.items():
        stio.save_file(content, path / shard, metadata={"format": "pt"})
    index = {
        "metadata": {
            "total_size": int(sum(t.nbytes for t in tensors.values()))
        },
        "weight_map": shard_map,
    }
    with open(path / "model.safetensors.index.json", "w") as f:
        json.dump(index, f)
    return tensors, shard_map


def test_deepseek_moe_shaped_merge(tmp_path):
    """End-to-end merge over DeepSeek-MoE-named checkpoints: the pipeline
    is architecture-agnostic (index discovery, shard mirroring, reduction,
    writer) and the output matches the pair oracle per tensor."""
    base_t, shard_map = _make_deepseek_model(tmp_path / "base", 70)
    ft1_t, _ = _make_deepseek_model(tmp_path / "ft1", 71)
    ft2_t, _ = _make_deepseek_model(tmp_path / "ft2", 72)

    config = _make_config(
        tmp_path,
        tmp_path / "base",
        [
            {"model": str(tmp_path / "ft1"), "base": str(tmp_path / "base"), "alpha": 0.7},
            {"model": str(tmp_path / "ft2"), "base": str(tmp_path / "base"), "alpha": 0.5},
        ],
    )
    merger = FourierMerge(
        config,
        index_manager=_offline_index(
            tmp_path / "base", tmp_path / "ft1", tmp_path / "ft2"
        ),
    )
    _run_merge(merger)

    out_dir = tmp_path / "merged"
    index = json.load(open(out_dir / "model.safetensors.index.json"))
    assert index["weight_map"] == shard_map  # layout mirrored exactly

    out = {}
    for shard in set(shard_map.values()):
        with SafeTensorsReader(out_dir / shard) as r:
            for kname in r.keys():
                out[kname] = r.get_tensor(kname, copy=True)
    assert set(out) == set(DEEPSEEK_SHAPES)

    for name in [
        "model.layers.0.self_attn.kv_a_proj_with_mqa.weight",
        "model.layers.0.mlp.experts.2.gate_proj.weight",
        "model.layers.0.mlp.gate.e_score_correction_bias",  # 1-D fp32 bias
    ]:
        expect = _oracle_fourier_pair(
            base_t[name], ft1_t[name], ft2_t[name], 0.7, 0.5
        )
        got = out[name].astype(np.float32)
        scale = max(np.abs(expect).max(), 1.0)
        _mostly_close(got, expect, rtol=2e-2, atol=2e-2 * scale)

    from shardmerge_tpu.tools.verify_safetensors import main as verify_main

    assert verify_main(out_dir, None, False)


def test_is_input_is_output_gates(tmp_path, tiny_model_factory):
    base_path, base_t = tiny_model_factory("base", seed=30)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=31)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=32)

    config = _make_config(
        tmp_path,
        base_path,
        [
            {
                "model": str(ft1_path),
                "base": str(base_path),
                "is_input": True,
            },
            {
                "model": str(ft2_path),
                "base": str(base_path),
                "is_output": True,
            },
        ],
    )
    merger = FourierMerge(
        config, index_manager=_offline_index(base_path, ft1_path, ft2_path)
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    np.testing.assert_allclose(
        out["model.embed_tokens.weight"].astype(np.float32),
        ft1_t["model.embed_tokens.weight"],
        rtol=1e-2,
        atol=1e-2,
    )
    for name in ["model.norm.weight", "lm_head.weight"]:
        np.testing.assert_allclose(
            out[name].astype(np.float32), ft2_t[name], rtol=1e-2, atol=1e-2
        )


def test_layer_gating(tmp_path, tiny_model_factory):
    """ft2 only covers layer 1; layer 0 must be pure ft1 delta."""
    base_path, base_t = tiny_model_factory("base", seed=40)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=41)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=42)

    config = _make_config(
        tmp_path,
        base_path,
        [
            {"model": str(ft1_path), "base": str(base_path)},
            {"model": str(ft2_path), "base": str(base_path), "start_layer": 1},
        ],
    )
    merger = FourierMerge(
        config, index_manager=_offline_index(base_path, ft1_path, ft2_path)
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    name = "model.layers.0.self_attn.o_proj.weight"
    np.testing.assert_allclose(
        out[name].astype(np.float32), ft1_t[name], rtol=1e-2, atol=1e-2
    )
    # layer 1 is a 2-way merge: different from both fts
    name1 = "model.layers.1.self_attn.o_proj.weight"
    assert not np.allclose(out[name1].astype(np.float32), ft1_t[name1], atol=1e-3)


def test_three_way_merge_runs(tmp_path, tiny_model_factory):
    """Odd stack exercises the leftover-carry path and 2 reduction rounds."""
    paths = {}
    tensors = {}
    for i, name in enumerate(["base", "f1", "f2", "f3"]):
        paths[name], tensors[name] = tiny_model_factory(name, seed=50 + i)

    config = _make_config(
        tmp_path,
        paths["base"],
        [
            {"model": str(paths[f"f{i}"]), "base": str(paths["base"]), "alpha": a}
            for i, a in [(1, 1.0), (2, 0.7), (3, 0.3)]
        ],
    )
    merger = FourierMerge(
        config, index_manager=_offline_index(*paths.values())
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")
    for name, arr in out.items():
        f = arr.astype(np.float32)
        assert np.all(np.isfinite(f)), name
    # deterministic: rerunning from scratch gives identical bytes
    config2 = _make_config(
        tmp_path.joinpath("again"),
        paths["base"],
        [
            {"model": str(paths[f"f{i}"]), "base": str(paths["base"]), "alpha": a}
            for i, a in [(1, 1.0), (2, 0.7), (3, 0.3)]
        ],
    )
    config2.output_dir = str(tmp_path / "again" / "merged")
    merger2 = FourierMerge(
        config2, index_manager=_offline_index(*paths.values())
    )
    _run_merge(merger2)
    out2 = _read_output(tmp_path / "again" / "merged")
    for name in out:
        np.testing.assert_array_equal(
            out[name].view(np.uint16), out2[name].view(np.uint16)
        )
    # The stepwise (>2-model) path fetches the shared base once per delta
    # plus once as the output base; the per-layer placement cache collapses
    # those to ONE device_put per (model, tensor). Byte invariant: uploads
    # == 4 models x the merged (non-passthrough) tensors exactly —
    # passthrough tensors copy host-side and never reach _fetch.
    passthrough = {"model.embed_tokens.weight", "model.norm.weight",
                   "lm_head.weight"}
    merged_bytes = sum(
        t.nbytes for n, t in tensors["base"].items() if n not in passthrough
    )
    assert merger2.stats.h2d_bytes == 4 * merged_bytes
    # and the dedupe demonstrably fired (>=2 extra base fetches per matrix)
    assert merger2.stats.h2d_dedup_hits >= 2 * merger2.stats.tensors_merged


def test_resume_skips_written_layers(tmp_path, tiny_model_factory):
    base_path, _ = tiny_model_factory("base", seed=60)
    ft_path, _ = tiny_model_factory("ft1", seed=61)
    entries = [{"model": str(ft_path), "base": str(base_path)}]

    config = _make_config(tmp_path, base_path, entries)
    merger = FourierMerge(config, index_manager=_offline_index(base_path, ft_path))
    _run_merge(merger)
    out1 = _read_output(tmp_path / "merged")
    mtimes = {
        s: (tmp_path / "merged" / s).stat().st_mtime_ns
        for s in set(TINY_SHARD_MAP.values())
    }

    # second run: everything already written -> files untouched
    config2 = _make_config(tmp_path, base_path, entries)
    merger2 = FourierMerge(config2, index_manager=_offline_index(base_path, ft_path))
    _run_merge(merger2)
    for s, t in mtimes.items():
        assert (tmp_path / "merged" / s).stat().st_mtime_ns == t
    out2 = _read_output(tmp_path / "merged")
    for name in out1:
        np.testing.assert_array_equal(
            out1[name].view(np.uint16), out2[name].view(np.uint16)
        )


def test_addition_merge_semantics(tmp_path, tiny_model_factory):
    base_path, base_t = tiny_model_factory("base", seed=70)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=71)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=72)
    entries = [
        {"model": str(ft1_path), "base": str(base_path)},
        {"model": str(ft2_path), "base": str(base_path)},
    ]

    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    merger = AdditionMerge(
        config, index_manager=_offline_index(base_path, ft1_path, ft2_path)
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")
    name = "model.layers.0.mlp.up_proj.weight"
    # REF-QUIRK: delta sum WITHOUT base added back
    expect = (ft1_t[name] - base_t[name]) + (ft2_t[name] - base_t[name])
    np.testing.assert_allclose(out[name], expect, rtol=1e-5, atol=1e-5)


def test_task_addition_merge_semantics(tmp_path, tiny_model_factory):
    base_path, base_t = tiny_model_factory("base", seed=80)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=81)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=82)
    entries = [
        {"model": str(ft1_path), "base": str(base_path)},
        {"model": str(ft2_path), "base": str(base_path)},
    ]

    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    merger = TaskAdditionMerge(
        config, index_manager=_offline_index(base_path, ft1_path, ft2_path)
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    name = "model.layers.1.mlp.gate_proj.weight"
    d = np.stack(
        [ft1_t[name] - base_t[name], ft2_t[name] - base_t[name]], axis=0
    )
    signs = np.sign(d)
    majority = np.sign(signs.sum(axis=0))
    expect = (d * (signs == majority[None])).sum(axis=0)
    np.testing.assert_allclose(out[name], expect, rtol=1e-5, atol=1e-5)


def test_legacy_fourier_runs(tmp_path, tiny_model_factory):
    base_path, _ = tiny_model_factory("base", seed=90)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=91)
    ft2_path, _ = tiny_model_factory("ft2", seed=92)
    entries = [
        {"model": str(ft1_path), "base": str(base_path), "is_input": True,
         "is_output": True},
        {"model": str(ft2_path), "base": str(base_path)},
    ]
    config = _make_config(tmp_path, base_path, entries)
    merger = LegacyFourierMerge(
        config, index_manager=_offline_index(base_path, ft1_path, ft2_path)
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")
    for name, arr in out.items():
        assert np.all(np.isfinite(arr.astype(np.float32))), name
    np.testing.assert_allclose(
        out["model.embed_tokens.weight"].astype(np.float32),
        ft1_t["model.embed_tokens.weight"],
        rtol=1e-2,
        atol=1e-2,
    )


def test_legacy_fourier_ignores_per_model_bases(tmp_path, tiny_model_factory):
    """The reference legacy engine subtracts the OUTPUT base tensor and never
    reads model.base (reference fourier.py:88-113). Two runs differing only
    in the configured per-model bases must produce bit-identical output."""
    base_path, _ = tiny_model_factory("base", seed=190)
    other_base_path, _ = tiny_model_factory("otherbase", seed=193)
    ft1_path, _ = tiny_model_factory("ft1", seed=191)
    ft2_path, _ = tiny_model_factory("ft2", seed=192)

    outputs = []
    for tag, ft_base in (("own", base_path), ("foreign", other_base_path)):
        entries = [
            {"model": str(ft1_path), "base": str(ft_base), "is_input": True,
             "is_output": True},
            {"model": str(ft2_path), "base": str(ft_base)},
        ]
        sub = tmp_path / tag
        sub.mkdir()
        config = _make_config(sub, base_path, entries)
        merger = LegacyFourierMerge(
            config,
            index_manager=_offline_index(
                base_path, other_base_path, ft1_path, ft2_path
            ),
        )
        _run_merge(merger)
        outputs.append(_read_output(sub / "merged"))

    for name in outputs[0]:
        np.testing.assert_array_equal(
            outputs[0][name].view(np.uint16),
            outputs[1][name].view(np.uint16),
            err_msg=name,
        )


def test_legacy_fourier_requires_input_model(tmp_path, tiny_model_factory):
    base_path, _ = tiny_model_factory("base", seed=95)
    ft1_path, _ = tiny_model_factory("ft1", seed=96)
    config = _make_config(
        tmp_path, base_path, [{"model": str(ft1_path), "base": str(base_path)}]
    )
    merger = LegacyFourierMerge(
        config, index_manager=_offline_index(base_path, ft1_path)
    )
    with pytest.raises(ValueError, match="No (in|out)put model"):
        _run_merge(merger)


def test_initialize_rejects_mismatched_architectures(
    tmp_path, tiny_model_factory
):
    base_path, _ = tiny_model_factory("base", seed=100)
    ft_path, _ = tiny_model_factory("ft1", seed=101)
    # corrupt the finetune's index: drop a key
    idx_path = ft_path / "model.safetensors.index.json"
    idx = json.load(open(idx_path))
    removed = dict(idx["weight_map"])
    removed.pop("model.norm.weight")
    idx["weight_map"] = removed
    json.dump(idx, open(idx_path, "w"))

    config = _make_config(
        tmp_path, base_path, [{"model": str(ft_path), "base": str(base_path)}]
    )
    merger = FourierMerge(config, index_manager=_offline_index(base_path, ft_path))
    with pytest.raises(ValueError, match="architecture mismatch"):
        _run_merge(merger)


def test_hbm_budget_spill_identical_output(tmp_path, tiny_model_factory):
    """hbm_budget_bytes=0 spills every stack entry to host RAM between pair
    merges; outputs must be bit-identical to the resident run."""
    base_path, _ = tiny_model_factory("base", seed=120)
    f1_path, _ = tiny_model_factory("f1", seed=121)
    f2_path, _ = tiny_model_factory("f2", seed=122)
    f3_path, _ = tiny_model_factory("f3", seed=123)
    entries = [
        {"model": str(f1_path), "base": str(base_path), "alpha": 1.0},
        {"model": str(f2_path), "base": str(base_path), "alpha": 0.6},
        {"model": str(f3_path), "base": str(base_path), "alpha": 0.4},
    ]

    outs = {}
    for tag, kwargs in [("resident", {}), ("spill", {"hbm_budget_bytes": 0})]:
        config = _make_config(tmp_path / tag, base_path, entries)
        config.output_dir = str(tmp_path / tag / "merged")
        merger = FourierMerge(
            config,
            index_manager=_offline_index(base_path, f1_path, f2_path, f3_path),
            **kwargs,
        )
        _run_merge(merger)
        outs[tag] = _read_output(tmp_path / tag / "merged")

    for name in outs["resident"]:
        np.testing.assert_array_equal(
            outs["resident"][name].view(np.uint16),
            outs["spill"][name].view(np.uint16),
        )


def test_exact_imag_mode_runs(tmp_path, tiny_model_factory):
    """exact_imag=True forces the literal double-FFT noise path everywhere."""
    base_path, _ = tiny_model_factory("base", seed=130)
    f1_path, _ = tiny_model_factory("f1", seed=131)
    f2_path, _ = tiny_model_factory("f2", seed=132)
    entries = [
        {"model": str(f1_path), "base": str(base_path)},
        {"model": str(f2_path), "base": str(base_path)},
    ]
    config = _make_config(tmp_path, base_path, entries)
    merger = FourierMerge(
        config,
        index_manager=_offline_index(base_path, f1_path, f2_path),
        exact_imag=True,
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")
    for name, arr in out.items():
        assert np.all(np.isfinite(arr.astype(np.float32))), name


def test_float16_output_dtype(tmp_path, tiny_model_factory):
    base_path, _ = tiny_model_factory("base", seed=140)
    ft_path, ft_t = tiny_model_factory("ft", seed=141)
    config = _make_config(
        tmp_path,
        base_path,
        [{"model": str(ft_path), "base": str(base_path)}],
        output_dtype="float16",
    )
    merger = FourierMerge(config, index_manager=_offline_index(base_path, ft_path))
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")
    name = "model.layers.0.mlp.up_proj.weight"
    assert out[name].dtype == np.float16
    np.testing.assert_allclose(
        out[name].astype(np.float32), ft_t[name], rtol=1e-2, atol=1e-2
    )


def test_fused_path_matches_stepwise(tmp_path, tiny_model_factory):
    """The one-dispatch fused 2-model merge equals the stepwise engine
    (up to fp rounding of the host-vs-device target_norm computation)."""
    base_path, _ = tiny_model_factory("base", seed=150)
    f1_path, _ = tiny_model_factory("f1", seed=151)
    f2_path, _ = tiny_model_factory("f2", seed=152)
    entries = [
        {"model": str(f1_path), "base": str(base_path), "alpha": 0.8},
        {"model": str(f2_path), "base": str(base_path), "alpha": 0.4},
    ]

    outs = {}
    for tag, kwargs in [
        ("fused", {}),
        # an (unreachable) huge budget forces the stepwise path with no spill
        ("stepwise", {"hbm_budget_bytes": 1 << 62}),
    ]:
        config = _make_config(tmp_path / tag, base_path, entries)
        config.output_dir = str(tmp_path / tag / "merged")
        merger = FourierMerge(
            config,
            index_manager=_offline_index(base_path, f1_path, f2_path),
            **kwargs,
        )
        _run_merge(merger)
        outs[tag] = _read_output(tmp_path / tag / "merged")

    for name in outs["fused"]:
        a = outs["fused"][name].astype(np.float32)
        b = outs["stepwise"][name].astype(np.float32)
        close = np.isclose(a, b, rtol=1e-2, atol=1e-2 * max(np.abs(b).max(), 1e-3))
        assert close.mean() > 0.99, (name, 1 - close.mean())


def _oracle_fourier_multi(base, fts, alphas, cull_start=0.20, offset=1e-10):
    """Torch oracle of the FULL fast_fourier reduction loop for N models:
    norm-product pairing from stale first-round norms (fast_fourier.py:178),
    unswapped pair weights, name-hash stack, cull halving, weight averaging."""
    import hashlib

    from shardmerge_tpu.ops.pairing import correlated_pairs, norm_product_matrix

    base_t = torch.from_numpy(base).float()
    cache = {}
    stack, weights, norms0 = [], [], []
    for i, (ft, alpha) in enumerate(zip(fts, alphas)):
        d = torch.from_numpy(ft).float() - base_t
        name = f"m{i}"
        cache[name] = d
        stack.append(name)
        weights.append(alpha)
        norms0.append(float(d.norm()))

    target = float(torch.tensor(norms0).mean().item()) + offset
    cull = cull_start

    def name_hash(n):
        subs = "_".join(p[:4] for p in n.split("_"))
        return subs + "::" + hashlib.sha256(n.encode()).hexdigest()[:8]

    while len(stack) > 1:
        corr = norm_product_matrix(norms0[: len(stack)])
        nstack, nweights = [], []
        for x, y, _c in correlated_pairs(corr, way="least"):
            if y < 0:
                nstack.append(stack[x])
                nweights.append(weights[x])
                continue
            am, bm = stack[x], stack[y]
            aw, bw = weights[x], weights[y]
            a, b = cache[am], cache[bm]
            na, nb = float(a.norm()), float(b.norm())
            if abs(na) < abs(nb):
                a, b, na, nb = b, a, nb, na
            cna, cnb = abs(na / target), abs(nb / target)
            nr = cnb / (cna + 1e-10)
            if cna < 1e-6:
                merged = a + b
            elif cnb < 1e-6 or nr < 0.1:
                merged = oracle.task_arithmetic_fft2(
                    a * (target / na), b * (bw / (aw + 1e-10)) * (target / na), t=1.0
                )
            else:
                ap = aw / (aw + bw)
                merged, _, _ = oracle.merge_tensors_fft2_slerp(
                    a, b, t=ap, t_sum=1.0, cutoff_pct=0.08, cull_pct=cull
                )
                merged = merged * target
            nm = name_hash(f"{am}_{bm}")
            nstack.append(nm)
            nweights.append((aw + bw) / 2.0)
            cache[nm] = merged
        stack, weights = nstack, nweights
        cull = cull / 2.0

    out = base_t + cache[stack[0]]
    out = torch.where(torch.isnan(out), torch.zeros_like(out), out)
    return out.to(torch.bfloat16).float().numpy()


def test_four_way_merge_matches_multi_round_oracle(tmp_path, tiny_model_factory):
    """4 models = 2 reduction rounds exercising regimes (a), (b) and (c):
    locks pairing/cull-halving/weight-averaging semantics against the torch
    oracle. Delta scales are chosen far apart so every data-dependent
    decision (pairing, swap-by-norm, regime selection) is robust to
    FFT-library rounding — with near-equal norms the reference algorithm
    itself is chaotic across FFT implementations."""
    import json as _json

    from shardmerge_tpu.io import safetensors_io as stio

    from .conftest import TINY_SHARD_MAP

    base_path, base_t = tiny_model_factory("base", seed=160)
    f0_path, f0_t = tiny_model_factory("f0", seed=161)
    f1_path, f1_t = tiny_model_factory("f1", seed=162)

    # f2, f3 = base + tiny perturbations -> near-zero deltas (regime a then b)
    def perturbed(name, seed, eps):
        gen = np.random.default_rng(seed)
        tensors = {
            k: (v + eps * gen.standard_normal(v.shape)).astype(np.float32)
            for k, v in base_t.items()
        }
        path = tmp_path / name
        path.mkdir(parents=True, exist_ok=True)
        shards = {}
        for k, sh in TINY_SHARD_MAP.items():
            shards.setdefault(sh, {})[k] = tensors[k]
        for sh, content in shards.items():
            stio.save_file(content, path / sh, metadata={"format": "pt"})
        _json.dump(
            {"metadata": {}, "weight_map": dict(TINY_SHARD_MAP)},
            open(path / "model.safetensors.index.json", "w"),
        )
        return path, tensors

    f2_path, f2_t = perturbed("f2", 163, 1e-9)
    f3_path, f3_t = perturbed("f3", 164, 1e-9)

    paths = [f0_path, f1_path, f2_path, f3_path]
    tensors = [f0_t, f1_t, f2_t, f3_t]
    alphas = [1.0, 0.5, 0.8, 0.8]

    entries = [
        {"model": str(p), "base": str(base_path), "alpha": a}
        for p, a in zip(paths, alphas)
    ]
    config = _make_config(tmp_path, base_path, entries)
    merger = FourierMerge(
        config, index_manager=_offline_index(base_path, *paths)
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")
    assert merger.stats.pair_merges.get("add", 0) > 0
    assert merger.stats.pair_merges.get("arith", 0) > 0
    assert merger.stats.pair_merges.get("slerp", 0) > 0
    # <=1 blocking host fetch per reduction round (VERDICT r1 #4): 21 merged
    # tensors x 2 rounds each; only round 2 has device-scalar norms to fetch.
    assert merger.stats.host_syncs <= 21

    for name in [
        "model.layers.0.self_attn.q_proj.weight",
        "model.layers.1.mlp.gate_proj.weight",
    ]:
        expect = _oracle_fourier_multi(
            base_t[name], [t[name] for t in tensors], alphas
        )
        got = out[name].astype(np.float32)
        scale = max(np.abs(expect).max(), 1.0)
        _mostly_close(got, expect, rtol=3e-2, atol=3e-2 * scale, max_flip_frac=0.05)


def test_batched_rounds_match_per_pair_dispatch(tmp_path, tiny_model_factory):
    """A 4-model merge with vmapped per-round dispatch must produce
    bit-identical output to the per-pair dispatch path (batch_rounds=False):
    vmap batches the same FFT/select/blend programs over a leading axis."""
    base_path, _ = tiny_model_factory("base", seed=270)
    paths = [tiny_model_factory(f"m{i}", seed=271 + i)[0] for i in range(4)]
    entries = [
        {"model": str(p), "base": str(base_path), "alpha": a}
        for p, a in zip(paths, [1.0, 0.7, 0.5, 0.3])
    ]

    outputs = []
    for tag, batch in (("batched", True), ("perpair", False)):
        sub = tmp_path / tag
        sub.mkdir()
        config = _make_config(sub, base_path, entries)
        merger = FourierMerge(
            config,
            index_manager=_offline_index(base_path, *paths),
            batch_rounds=batch,
        )
        _run_merge(merger)
        outputs.append(_read_output(sub / "merged"))

    for name in outputs[0]:
        np.testing.assert_array_equal(
            outputs[0][name].view(np.uint16),
            outputs[1][name].view(np.uint16),
            err_msg=name,
        )


def test_three_way_merge_then_verify_tool(tmp_path, tiny_model_factory):
    """BASELINE config-3 shape: 3-way multi-finetune merge chained with the
    verify_safetensors check."""
    from shardmerge_tpu.tools.verify_safetensors import main as verify_main

    base_path, _ = tiny_model_factory("base", seed=170)
    paths = [tiny_model_factory(f"q{i}", seed=171 + i)[0] for i in range(3)]
    entries = [
        {"model": str(p), "base": str(base_path), "alpha": a}
        for p, a in zip(paths, [1.0, 0.6, 0.3])
    ]
    config = _make_config(tmp_path, base_path, entries)
    merger = FourierMerge(config, index_manager=_offline_index(base_path, *paths))
    _run_merge(merger)
    assert verify_main(tmp_path / "merged") is True


def test_per_model_base_differs_from_output_base(tmp_path, tiny_model_factory):
    """finetune_merge entries carry their own base: deltas are computed
    against model.base while the delta is applied onto output_base_model
    (reference base.py:121-137 semantics)."""
    out_base_path, out_base_t = tiny_model_factory("outbase", seed=180)
    own_base_path, own_base_t = tiny_model_factory("ownbase", seed=181)
    ft_path, ft_t = tiny_model_factory("ft", seed=182)

    config = _make_config(
        tmp_path,
        out_base_path,
        [{"model": str(ft_path), "base": str(own_base_path)}],
    )
    merger = FourierMerge(
        config,
        index_manager=_offline_index(out_base_path, own_base_path, ft_path),
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    name = "model.layers.0.mlp.down_proj.weight"
    expect = out_base_t[name] + (ft_t[name] - own_base_t[name])
    np.testing.assert_allclose(
        out[name].astype(np.float32), expect, rtol=1e-2, atol=1e-2
    )


def test_per_model_base_two_finetunes(tmp_path, tiny_model_factory):
    """Fused pair path with distinct per-model bases, checked against the
    torch oracle with own-base deltas."""
    out_base_path, out_base_t = tiny_model_factory("outbase", seed=190)
    base1_path, base1_t = tiny_model_factory("base1", seed=191)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=192)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=193)

    config = _make_config(
        tmp_path,
        out_base_path,
        [
            {"model": str(ft1_path), "base": str(base1_path), "alpha": 0.7},
            {"model": str(ft2_path), "base": str(out_base_path), "alpha": 0.3},
        ],
    )
    merger = FourierMerge(
        config,
        index_manager=_offline_index(
            out_base_path, base1_path, ft1_path, ft2_path
        ),
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    name = "model.layers.1.self_attn.o_proj.weight"
    # oracle with own-base deltas: shift ft1 so (ft1' - out_base) equals
    # (ft1 - base1), then reuse the pair oracle
    ft1_shifted = ft1_t[name] - base1_t[name] + out_base_t[name]
    expect = _oracle_fourier_pair(
        out_base_t[name], ft1_shifted, ft2_t[name], 0.7, 0.3
    )
    got = out[name].astype(np.float32)
    scale = max(np.abs(expect).max(), 1.0)
    _mostly_close(got, expect, rtol=2e-2, atol=2e-2 * scale)


def test_fused_pair_at_fast_imag_activation_size(tmp_path):
    """Engine-level check at >= _FAST_IMAG_MIN_NUMEL: the fused 2-finetune
    dispatch takes the rfft fast-imag branch on a (1024, 1024) tensor and
    matches the torch oracle of the full layer algorithm (round-1 VERDICT:
    the suite previously never ran the gate-active path at size)."""
    import json as _json

    from shardmerge_tpu.io import safetensors_io as stio
    from shardmerge_tpu.merge.fourier import _FAST_IMAG_MIN_NUMEL

    shapes = {
        "model.embed_tokens.weight": (8, 8),
        "model.layers.0.mlp.gate_proj.weight": (1024, 1024),
        "model.norm.weight": (8,),
        "lm_head.weight": (8, 8),
    }
    assert 1024 * 1024 >= _FAST_IMAG_MIN_NUMEL

    def write(name, seed):
        gen = np.random.default_rng(seed)
        tensors = {
            k: gen.standard_normal(s).astype(np.float32) for k, s in shapes.items()
        }
        d = tmp_path / name
        d.mkdir()
        stio.save_file(tensors, d / "model-00001-of-00001.safetensors",
                       metadata={"format": "pt"})
        _json.dump(
            {"metadata": {}, "weight_map": {
                k: "model-00001-of-00001.safetensors" for k in shapes}},
            open(d / "model.safetensors.index.json", "w"),
        )
        return tensors

    base_t = write("base", 500)
    ft1_t = write("ft1", 501)
    ft2_t = write("ft2", 502)

    config = _make_config(
        tmp_path,
        tmp_path / "base",
        [
            {"model": str(tmp_path / "ft1"), "base": str(tmp_path / "base"),
             "alpha": 0.8},
            {"model": str(tmp_path / "ft2"), "base": str(tmp_path / "base"),
             "alpha": 0.4},
        ],
    )
    merger = FourierMerge(
        config,
        index_manager=_offline_index(
            tmp_path / "base", tmp_path / "ft1", tmp_path / "ft2"
        ),
    )
    _run_merge(merger)

    name = "model.layers.0.mlp.gate_proj.weight"
    with SafeTensorsReader(
        tmp_path / "merged" / "model-00001-of-00001.safetensors"
    ) as r:
        got = r.get_tensor(name, copy=True).astype(np.float32)
    expect = _oracle_fourier_pair(
        base_t[name], ft1_t[name], ft2_t[name], 0.8, 0.4
    )
    # large shape: cross-library noise is diffuse (NUMERICS.md §4); at bf16
    # output quantization the two agree except for threshold-boundary flips
    scale = max(np.abs(expect).max(), 1e-6)
    _mostly_close(got, expect, rtol=2e-2, atol=2e-2 * scale,
                  max_flip_frac=0.002)


def test_prefetch_depth_invariance_and_spans(tmp_path, tiny_model_factory):
    """prefetch_depth only changes WHEN host reads happen, never the output;
    the span counters populate (VERDICT r2 #3 instrumentation)."""
    base_path, _ = tiny_model_factory("base", seed=70)
    ft1_path, _ = tiny_model_factory("ft1", seed=71)
    ft2_path, _ = tiny_model_factory("ft2", seed=72)

    outs = {}
    for depth in (0, 3):
        out_dir = tmp_path / f"d{depth}"
        out_dir.mkdir()
        config = _make_config(
            out_dir,
            base_path,
            [
                {"model": str(ft1_path), "base": str(base_path), "alpha": 0.8},
                {"model": str(ft2_path), "base": str(base_path), "alpha": 0.4},
            ],
        )
        merger = FourierMerge(
            config,
            index_manager=_offline_index(base_path, ft1_path, ft2_path),
            prefetch_depth=depth,
        )
        _run_merge(merger)
        outs[depth] = _read_output(out_dir / "merged")
        assert merger.stats.span_merge_s > 0
        assert merger.stats.span_fetch_s >= 0
        assert merger.stats.span_flush_s > 0
        assert "spans" in merger.stats.summary()

    assert set(outs[0]) == set(outs[3])
    for name in outs[0]:
        np.testing.assert_array_equal(
            outs[0][name].view(np.uint16), outs[3][name].view(np.uint16)
        )


def test_gather_cross_host_blocks(tmp_path, tiny_model_factory, monkeypatch):
    """_gather_cross_host assembles row blocks identically to a whole-tensor
    gather, and non-primary processes keep no data (zero-stride result)."""
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    base_path, _ = tiny_model_factory("base", seed=80)
    ft_path, _ = tiny_model_factory("ft1", seed=81)
    config = _make_config(
        tmp_path, base_path,
        [{"model": str(ft_path), "base": str(base_path), "alpha": 0.5}],
    )
    merger = FourierMerge(
        config, index_manager=_offline_index(base_path, ft_path)
    )

    calls = []
    real = multihost_utils.process_allgather

    def counting(t, tiled=False):
        calls.append(t.shape)
        return real(t, tiled=tiled)

    monkeypatch.setattr(multihost_utils, "process_allgather", counting)
    monkeypatch.setenv("SHARDMERGE_GATHER_BLOCK_BYTES", "256")

    x = jnp.arange(16 * 8, dtype=jnp.float32).reshape(16, 8)
    got = merger._gather_cross_host(x)
    np.testing.assert_array_equal(got, np.asarray(x))
    # 256-byte blocks of 32-byte rows -> 8-row blocks -> 2 gather calls
    assert calls == [(8, 8), (8, 8)], calls

    # non-primary: participates in every collective, retains nothing
    calls.clear()
    monkeypatch.setattr(merger, "_is_primary", lambda: False)
    ghost = merger._gather_cross_host(x)
    assert calls == [(8, 8), (8, 8)], calls
    assert ghost.shape == x.shape and ghost.nbytes == x.nbytes
    assert ghost.strides == (0, 0)  # zero-stride: no retained copy
    assert not ghost.any()


def test_device_routing_small_and_huge(tmp_path, tiny_model_factory):
    """Size-based placement: small and huge tensors pin to the CPU backend
    (huge = merge working set exceeds device HBM, measured at 70B embed
    scale on a v5e; scripts/kernel70b_probe.py), mid-size stay default."""
    base_path, _ = tiny_model_factory("base", seed=90)
    ft_path, _ = tiny_model_factory("ft1", seed=91)
    config = _make_config(
        tmp_path, base_path,
        [{"model": str(ft_path), "base": str(base_path), "alpha": 0.5}],
    )
    merger = FourierMerge(
        config, index_manager=_offline_index(base_path, ft_path)
    )

    class Fake:
        def __init__(self, size):
            self.size = size

    # on the CPU test harness the default device IS cpu, so _device_for
    # returns None everywhere; assert the routing PREDICATE directly
    small = Fake(merger.small_tensor_numel - 1)
    mid = Fake(merger.small_tensor_numel)
    huge = Fake(merger.huge_tensor_numel)
    on_default = (
        lambda t: merger.small_tensor_numel <= t.size
        < merger.huge_tensor_numel
    )
    assert not on_default(small)
    assert on_default(mid)
    assert not on_default(huge)
    # and the real method keeps returning None (implicit placement) when
    # the default device is already the CPU
    assert merger._device_for(np.zeros(4, np.float32)) is None


def test_prefetch_targets_per_layer_kind(tmp_path, tiny_model_factory):
    """_prefetch_layer's read set: passthrough layers preload ONLY the
    chosen source (the is_input/is_output finetune, else the output base —
    anything else is wasted IO since fourier.py _passthrough host-copies one
    tensor); merge layers preload each distinct model exactly once."""
    from shardmerge_tpu.io.writer import ShardLayer

    base_path, _ = tiny_model_factory("base", seed=95)
    ft1_path, _ = tiny_model_factory("ft1", seed=96)
    ft2_path, _ = tiny_model_factory("ft2", seed=97)
    config = _make_config(
        tmp_path,
        base_path,
        [
            {"model": str(ft1_path), "base": str(base_path), "alpha": 0.5,
             "is_output": True},
            {"model": str(ft2_path), "base": str(base_path), "alpha": 0.5},
        ],
    )
    merger = FourierMerge(
        config, index_manager=_offline_index(base_path, ft1_path, ft2_path)
    )

    calls = []

    async def recording_preload(uri, name):
        calls.append((uri, name))

    merger.index_manager.preload_tensor = recording_preload

    def prefetched(layer_name):
        calls.clear()

        async def drive():
            merger._prefetch_layer(
                ShardLayer(0, "s", layer_name, False), to_device=False
            )
            # drain the fire-and-forget tasks
            for _ in range(4):
                await asyncio.sleep(0)

        asyncio.run(drive())
        return calls[:]

    # input passthrough, no is_input flag anywhere -> base only
    got = prefetched("model.embed_tokens.weight")
    assert got == [(str(base_path), "model.embed_tokens.weight")], got

    # output passthrough -> only the is_output finetune
    got = prefetched("lm_head.weight")
    assert got == [(str(ft1_path), "lm_head.weight")], got

    # merge layer -> base + each finetune (per-model bases == output base
    # dedupe away), each exactly once
    got = prefetched("model.layers.0.self_attn.q_proj.weight")
    assert [u for u, _ in got] == [
        str(base_path), str(ft1_path), str(ft2_path)
    ], got
    assert all(n == "model.layers.0.self_attn.q_proj.weight" for _, n in got)


# ---------------------------------------------------------------------------
# TIES / DARE engines (post-reference methods; merge/ties.py, merge/dare.py)
# ---------------------------------------------------------------------------


def _np_ties(base, deltas, density, lam):
    """Independent numpy realization of trim/elect/disjoint-mean."""
    trimmed = []
    for d in deltas:
        flat = np.abs(d).ravel()
        n = flat.size
        k_keep = max(1, min(n, int(round(density * n))))
        thr = np.sort(flat)[n - k_keep] if k_keep < n else -1.0
        trimmed.append(np.where(np.abs(d) >= thr, d, 0.0))
    stack = np.stack(trimmed)
    gamma = np.sign(stack.sum(axis=0))
    agree = (np.sign(stack) == gamma[None]) & (stack != 0.0)
    total = np.where(agree, stack, 0.0).sum(axis=0)
    count = agree.sum(axis=0)
    merged = np.where(count > 0, total / np.maximum(count, 1), 0.0)
    return base + lam * merged


def test_ties_merge_semantics(tmp_path, tiny_model_factory):
    from shardmerge_tpu.merge import TiesMerge

    base_path, base_t = tiny_model_factory("base", seed=170)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=171)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=172)
    ft3_path, ft3_t = tiny_model_factory("ft3", seed=173)
    entries = [
        {"model": str(ft1_path), "base": str(base_path), "alpha": 1.0},
        {"model": str(ft2_path), "base": str(base_path), "alpha": 2.0},
        {"model": str(ft3_path), "base": str(base_path), "alpha": 0.5},
    ]
    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    merger = TiesMerge(
        config,
        index_manager=_offline_index(base_path, ft1_path, ft2_path, ft3_path),
        density=0.5,
        lam=0.7,
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    for name in (
        "model.layers.0.mlp.up_proj.weight",  # 2-D
        "model.layers.1.input_layernorm.weight",  # 1-D
    ):
        deltas = [
            1.0 * (ft1_t[name] - base_t[name]),
            2.0 * (ft2_t[name] - base_t[name]),
            0.5 * (ft3_t[name] - base_t[name]),
        ]
        expect = _np_ties(base_t[name], deltas, density=0.5, lam=0.7)
        np.testing.assert_allclose(out[name], expect, rtol=1e-5, atol=1e-6)


def test_ties_trim_keeps_threshold_ties():
    """trim_stack's threshold is the exact order statistic and is inclusive:
    entries equal to it all survive, even past k_keep."""
    from shardmerge_tpu.merge.ties import keep_count, trim_stack

    # six entries, top-2 requested, but three share the |.|=3.0 threshold
    row = np.array([[3.0, -3.0, 3.0, 1.0, -0.5, 0.25]], np.float32)
    k = keep_count(row.size, 2 / 6)
    assert k == 2
    got = np.asarray(trim_stack(row, k))
    np.testing.assert_array_equal(
        got, np.array([[3.0, -3.0, 3.0, 0.0, 0.0, 0.0]], np.float32)
    )


def test_ties_full_density_keeps_everything():
    from shardmerge_tpu.merge.ties import keep_count, trim_stack

    row = np.array([[0.0, -1.0, 2.0]], np.float32)
    got = np.asarray(trim_stack(row, keep_count(row.size, 1.0)))
    np.testing.assert_array_equal(got, row)


def test_dare_merge_deterministic_and_elementwise(tmp_path, tiny_model_factory):
    from shardmerge_tpu.merge import DareMerge

    base_path, base_t = tiny_model_factory("base", seed=180)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=181)
    entries = [{"model": str(ft1_path), "base": str(base_path)}]

    def run(outdir, seed):
        config = _make_config(
            tmp_path, base_path, entries, output_dtype="float32"
        )
        config.output_dir = str(tmp_path / outdir)
        merger = DareMerge(
            config,
            index_manager=_offline_index(base_path, ft1_path),
            drop_rate=0.5,
            seed=seed,
        )
        _run_merge(merger)
        return _read_output(tmp_path / outdir)

    out1 = run("m1", seed=3)
    name = "model.layers.0.self_attn.q_proj.weight"
    delta = out1[name] - base_t[name]
    scaled = (ft1_t[name] - base_t[name]) / 0.5
    # every element is either dropped (0) or the rescaled delta
    dropped = np.isclose(delta, 0.0, atol=1e-7)
    kept = np.isclose(delta, scaled, rtol=1e-5, atol=1e-7)
    assert np.all(dropped | kept)
    keep_frac = kept.mean()
    assert 0.3 < keep_frac < 0.7, keep_frac

    # same seed, fresh engine -> bit-identical output (resume contract)
    out2 = run("m2", seed=3)
    for k in out1:
        np.testing.assert_array_equal(
            out1[k].view(np.uint32), out2[k].view(np.uint32)
        )

    # different seed -> different masks
    out3 = run("m3", seed=4)
    assert any(not np.array_equal(out1[k], out3[k]) for k in out1)


def test_dare_ties_combine_matches_mask_replay(tmp_path, tiny_model_factory):
    """combine='ties' equals an independent recomputation that replays the
    documented key-derivation contract (fold_in(fold_in(key(seed),
    crc32(name)), m))."""
    import zlib

    import jax

    from shardmerge_tpu.merge import DareMerge

    base_path, base_t = tiny_model_factory("base", seed=190)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=191)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=192)
    entries = [
        {"model": str(ft1_path), "base": str(base_path)},
        {"model": str(ft2_path), "base": str(base_path)},
    ]
    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    merger = DareMerge(
        config,
        index_manager=_offline_index(base_path, ft1_path, ft2_path),
        drop_rate=0.4,
        combine="ties",
        seed=11,
        lam=1.5,
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    name = "model.layers.1.mlp.down_proj.weight"
    root = jax.random.key(11)
    named = jax.random.fold_in(root, zlib.crc32(name.encode()) & 0x7FFFFFFF)
    kept_rows = []
    for m, ft_t in enumerate((ft1_t, ft2_t)):
        mask = np.asarray(
            jax.random.bernoulli(
                jax.random.fold_in(named, m), p=0.6, shape=ft_t[name].shape
            )
        )
        d = ft_t[name] - base_t[name]
        kept_rows.append(np.where(mask, d / np.float32(0.6), 0.0))
    stack = np.stack(kept_rows)
    gamma = np.sign(stack.sum(axis=0))
    agree = (np.sign(stack) == gamma[None]) & (stack != 0.0)
    total = np.where(agree, stack, 0.0).sum(axis=0)
    count = agree.sum(axis=0)
    merged = np.where(count > 0, total / np.maximum(count, 1), 0.0)
    expect = base_t[name] + 1.5 * merged
    np.testing.assert_allclose(out[name], expect, rtol=1e-5, atol=1e-6)


def test_ties_passthrough_and_gating(tmp_path, tiny_model_factory):
    from shardmerge_tpu.merge import TiesMerge

    base_path, base_t = tiny_model_factory("base", seed=200)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=201)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=202)
    entries = [
        {"model": str(ft1_path), "base": str(base_path), "is_input": True,
         "is_output": True},
        # gated to layer 1 only
        {"model": str(ft2_path), "base": str(base_path), "start_layer": 1},
    ]
    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    merger = TiesMerge(
        config,
        index_manager=_offline_index(base_path, ft1_path, ft2_path),
        density=1.0,
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    # sentinel layers pass the flagged model through verbatim
    np.testing.assert_allclose(
        out["model.embed_tokens.weight"], ft1_t["model.embed_tokens.weight"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        out["model.norm.weight"], ft1_t["model.norm.weight"], rtol=1e-6
    )
    # layer 0: only ft1 contributes (ft2 gated out)
    name0 = "model.layers.0.mlp.gate_proj.weight"
    d0 = [ft1_t[name0] - base_t[name0]]
    np.testing.assert_allclose(
        out[name0], _np_ties(base_t[name0], d0, 1.0, 1.0),
        rtol=1e-5, atol=1e-6,
    )
    # layer 1: both contribute
    name1 = "model.layers.1.mlp.gate_proj.weight"
    d1 = [ft1_t[name1] - base_t[name1], ft2_t[name1] - base_t[name1]]
    np.testing.assert_allclose(
        out[name1], _np_ties(base_t[name1], d1, 1.0, 1.0),
        rtol=1e-5, atol=1e-6,
    )


def test_method_options_validation(tmp_path, tiny_model_factory):
    import asyncio as _asyncio

    from shardmerge_tpu.cli import run_merge
    from shardmerge_tpu.config import ConfigError

    base_path, base_t = tiny_model_factory("base", seed=210)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=211)
    entries = [{"model": str(ft1_path), "base": str(base_path)}]

    # a typo'd knob fails loudly before any weight is read
    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    config.merge_method = "ties"
    config.method_options = {"densty": 0.5}
    with pytest.raises(ConfigError, match="densty"):
        _asyncio.run(run_merge(config))

    # valid knobs flow through run_merge to the engine
    config2 = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    config2.merge_method = "ties"
    config2.method_options = {"density": 1.0, "lam": 2.0}
    config2.shard_tensors = False
    _asyncio.run(run_merge(config2))
    out = _read_output(tmp_path / "merged")
    name = "model.layers.0.self_attn.v_proj.weight"
    expect = _np_ties(
        base_t[name], [ft1_t[name] - base_t[name]], density=1.0, lam=2.0
    )
    np.testing.assert_allclose(out[name], expect, rtol=1e-5, atol=1e-6)


def test_linear_merge_weighted_mean(tmp_path, tiny_model_factory):
    from shardmerge_tpu.merge import LinearMerge

    base_path, base_t = tiny_model_factory("base", seed=220)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=221)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=222)
    entries = [
        {"model": str(ft1_path), "base": str(base_path), "alpha": 3.0},
        {"model": str(ft2_path), "base": str(base_path), "alpha": 1.0},
    ]
    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    merger = LinearMerge(
        config, index_manager=_offline_index(base_path, ft1_path, ft2_path)
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")
    name = "model.layers.0.self_attn.o_proj.weight"
    d1 = ft1_t[name] - base_t[name]
    d2 = ft2_t[name] - base_t[name]
    expect = base_t[name] + (3.0 * d1 + 1.0 * d2) / 4.0
    np.testing.assert_allclose(out[name], expect, rtol=1e-5, atol=1e-6)

    # normalize=False -> raw alpha-scaled task arithmetic on top of base
    config2 = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    config2.output_dir = str(tmp_path / "merged_raw")
    merger2 = LinearMerge(
        config2,
        index_manager=_offline_index(base_path, ft1_path, ft2_path),
        normalize=False,
    )
    _run_merge(merger2)
    out2 = _read_output(tmp_path / "merged_raw")
    expect2 = base_t[name] + 3.0 * d1 + 1.0 * d2
    np.testing.assert_allclose(out2[name], expect2, rtol=1e-5, atol=1e-6)


def _np_slerp(v0, v1, t):
    v0 = v0.astype(np.float64).ravel()
    v1 = v1.astype(np.float64).ravel()
    n0, n1 = np.linalg.norm(v0), np.linalg.norm(v1)
    dot = np.clip(v0 @ v1 / max(n0 * n1, 1e-24), -1.0, 1.0)
    if abs(dot) > 0.9995 or n0 == 0.0 or n1 == 0.0:
        return (1 - t) * v0 + t * v1
    theta = np.arccos(dot)
    out_dir = (
        np.sin((1 - t) * theta) * v0 / n0 + np.sin(t * theta) * v1 / n1
    ) / np.sin(theta)
    return out_dir * ((1 - t) * n0 + t * n1)


def test_slerp_merge_two_models(tmp_path, tiny_model_factory):
    from shardmerge_tpu.merge import SlerpMerge

    base_path, base_t = tiny_model_factory("base", seed=230)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=231)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=232)
    entries = [
        {"model": str(ft1_path), "base": str(base_path)},
        {"model": str(ft2_path), "base": str(base_path)},
    ]
    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    merger = SlerpMerge(
        config,
        index_manager=_offline_index(base_path, ft1_path, ft2_path),
        t=0.3,
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")
    name = "model.layers.1.self_attn.q_proj.weight"
    expect = _np_slerp(ft1_t[name], ft2_t[name], 0.3).reshape(out[name].shape)
    np.testing.assert_allclose(out[name], expect, rtol=1e-4, atol=1e-6)
    # endpoint sanity: t respects direction (closer to ft1 at t=0.3)
    a = np.linalg.norm(out[name] - ft1_t[name])
    b = np.linalg.norm(out[name] - ft2_t[name])
    assert a < b


def test_slerp_merge_base_to_single_ft_and_colinear(tmp_path, tiny_model_factory):
    from shardmerge_tpu.merge import SlerpMerge
    from shardmerge_tpu.merge.slerp import _slerp_pair

    base_path, base_t = tiny_model_factory("base", seed=240)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=241)
    entries = [{"model": str(ft1_path), "base": str(base_path)}]
    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    merger = SlerpMerge(
        config, index_manager=_offline_index(base_path, ft1_path), t=0.5
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")
    name = "model.layers.0.mlp.down_proj.weight"
    expect = _np_slerp(base_t[name], ft1_t[name], 0.5).reshape(out[name].shape)
    np.testing.assert_allclose(out[name], expect, rtol=1e-4, atol=1e-6)

    # colinear endpoints take the lerp branch exactly
    v = np.arange(1, 9, dtype=np.float32)
    got = np.asarray(_slerp_pair(v, 2.0 * v, np.float32(0.25)))
    np.testing.assert_allclose(got, 1.25 * v, rtol=1e-6)
    # identical endpoints come back unchanged
    got = np.asarray(_slerp_pair(v, v, np.float32(0.7)))
    np.testing.assert_allclose(got, v, rtol=1e-6)
    # zero endpoint -> lerp
    z = np.zeros_like(v)
    got = np.asarray(_slerp_pair(z, v, np.float32(0.5)))
    np.testing.assert_allclose(got, 0.5 * v, rtol=1e-6)


def test_slerp_rejects_wrong_model_count(tmp_path, tiny_model_factory):
    from shardmerge_tpu.merge import SlerpMerge

    base_path, _ = tiny_model_factory("base", seed=250)
    ft1_path, _ = tiny_model_factory("ft1", seed=251)
    ft2_path, _ = tiny_model_factory("ft2", seed=252)
    ft3_path, _ = tiny_model_factory("ft3", seed=253)
    entries = [
        {"model": str(p), "base": str(base_path)}
        for p in (ft1_path, ft2_path, ft3_path)
    ]
    config = _make_config(tmp_path, base_path, entries)
    with pytest.raises(ValueError, match="exactly two"):
        SlerpMerge(config, index_manager=_offline_index(base_path))


def _np_elect(stack):
    gamma = np.sign(stack.sum(axis=0))
    agree = (np.sign(stack) == gamma[None]) & (stack != 0.0)
    total = np.where(agree, stack, 0.0).sum(axis=0)
    count = agree.sum(axis=0)
    return np.where(count > 0, total / np.maximum(count, 1), 0.0)


def test_della_keep_probs_rank_monotone():
    """MAGPRUNE probabilities: mean == density, larger |d| -> larger keep
    prob, epsilon=0 degenerates to uniform DARE probabilities."""
    from shardmerge_tpu.merge.della import keep_probs

    d = np.array([[[0.5, -3.0, 1.0, 0.0, -2.0]]], np.float32)
    p = np.asarray(keep_probs(jnp.asarray(d), density=0.5, epsilon=0.2))
    np.testing.assert_allclose(p.mean(), 0.5, atol=1e-6)
    order = np.argsort(-np.abs(d[0, 0]))
    assert list(np.argsort(-p[0, 0])) == list(order)
    np.testing.assert_allclose(p[0, 0, 1], 0.6, atol=1e-6)  # largest |.|
    np.testing.assert_allclose(p[0, 0, 3], 0.4, atol=1e-6)  # smallest |.|

    p0 = np.asarray(keep_probs(jnp.asarray(d), density=0.3, epsilon=0.0))
    np.testing.assert_allclose(p0, 0.3, atol=1e-7)

    # single-entry rows have no rank spread: EXACTLY density, not
    # density + epsilon/2 (the review-caught off-by-half)
    one = np.array([[[2.0]], [[0.5]]], np.float32)
    p1 = np.asarray(keep_probs(jnp.asarray(one), density=0.5, epsilon=0.4))
    np.testing.assert_allclose(p1, 0.5, atol=1e-7)


def test_della_merge_matches_prob_replay(tmp_path, tiny_model_factory):
    """The engine output equals an independent replay of the documented
    contract: numpy ranks -> linear keep probs -> the same fold_in'd
    Bernoulli draws -> rescale -> sign election."""
    import zlib

    import jax

    from shardmerge_tpu.merge import DellaMerge

    base_path, base_t = tiny_model_factory("base", seed=260)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=261)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=262)
    entries = [
        {"model": str(ft1_path), "base": str(base_path), "alpha": 1.0},
        {"model": str(ft2_path), "base": str(base_path), "alpha": 0.5},
    ]
    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    merger = DellaMerge(
        config,
        index_manager=_offline_index(base_path, ft1_path, ft2_path),
        density=0.5,
        epsilon=0.3,
        combine="ties",
        seed=7,
        lam=1.2,
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    for name in (
        "model.layers.0.mlp.up_proj.weight",  # 2-D: per-row ranks
        "model.layers.1.input_layernorm.weight",  # 1-D: one row
    ):
        named = jax.random.fold_in(
            jax.random.key(7), zlib.crc32(name.encode()) & 0x7FFFFFFF
        )
        kept = []
        for m, (ft_t, alpha) in enumerate(((ft1_t, 1.0), (ft2_t, 0.5))):
            d = np.float32(alpha) * (ft_t[name] - base_t[name])
            rows = d.reshape(-1, d.shape[-1])
            ranks = np.argsort(np.argsort(-np.abs(rows), axis=-1), axis=-1)
            frac = ranks / max(rows.shape[-1] - 1, 1)
            probs = np.float32(0.5) + np.float32(0.3) * (
                np.float32(0.5) - frac.astype(np.float32)
            )
            mask = np.asarray(
                jax.random.bernoulli(
                    jax.random.fold_in(named, m), p=jnp.asarray(probs)
                )
            )
            kept.append(np.where(mask, rows / probs, 0.0).reshape(d.shape))
        merged = _np_elect(np.stack([k.reshape(-1) for k in kept]))
        expect = base_t[name] + 1.2 * merged.reshape(base_t[name].shape)
        np.testing.assert_allclose(out[name], expect, rtol=1e-5, atol=1e-6)

    # resume determinism: a fresh engine with the same seed is bit-identical
    config2 = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    config2.output_dir = str(tmp_path / "merged2")
    merger2 = DellaMerge(
        config2,
        index_manager=_offline_index(base_path, ft1_path, ft2_path),
        density=0.5,
        epsilon=0.3,
        combine="ties",
        seed=7,
        lam=1.2,
    )
    _run_merge(merger2)
    out2 = _read_output(tmp_path / "merged2")
    for k in out:
        np.testing.assert_array_equal(
            out[k].view(np.uint32), out2[k].view(np.uint32)
        )


def test_della_validates_probability_window(tmp_path, tiny_model_factory):
    from shardmerge_tpu.merge import DellaMerge

    base_path, _ = tiny_model_factory("base", seed=265)
    ft1_path, _ = tiny_model_factory("ft1", seed=266)
    entries = [{"model": str(ft1_path), "base": str(base_path)}]
    config = _make_config(tmp_path, base_path, entries)

    def make(**kw):
        return DellaMerge(config, index_manager=_offline_index(base_path), **kw)

    with pytest.raises(ValueError, match="outside"):
        make(density=0.1, epsilon=0.3)  # density - eps/2 <= 0
    with pytest.raises(ValueError, match="outside"):
        make(density=0.95, epsilon=0.2)  # density + eps/2 > 1
    with pytest.raises(ValueError, match="combine"):
        make(combine="median")
    with pytest.raises(ValueError, match="epsilon"):
        make(epsilon=-0.1)


def test_breadcrumbs_mask_tails_tie_semantics():
    """Two-tail mask with the documented tie policy: lower threshold
    inclusive (survives), upper threshold exclusive (dropped)."""
    from shardmerge_tpu.merge.breadcrumbs import mask_tails, tail_counts

    # |.| ascending: 0.25 0.5 1.0 2.0 3.0 3.0 — drop bottom 2, top 2;
    # BOTH 3.0s fall (the upper threshold value s[n-k_top]=3.0 is dropped)
    row = np.array([[3.0, -0.5, 1.0, 2.0, -3.0, 0.25]], np.float32)
    k_low, k_top = tail_counts(6, beta=2 / 6, gamma=2 / 6)
    assert (k_low, k_top) == (2, 2)
    got = np.asarray(mask_tails(jnp.asarray(row), k_low, k_top))
    np.testing.assert_array_equal(
        got, np.array([[0.0, 0.0, 1.0, 2.0, 0.0, 0.0]], np.float32)
    )

    # beta=0, gamma=0: identity
    got = np.asarray(mask_tails(jnp.asarray(row), 0, 0))
    np.testing.assert_array_equal(got, row)


def test_breadcrumbs_merge_matches_numpy(tmp_path, tiny_model_factory):
    from shardmerge_tpu.merge import BreadcrumbsMerge

    base_path, base_t = tiny_model_factory("base", seed=270)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=271)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=272)
    entries = [
        {"model": str(ft1_path), "base": str(base_path), "alpha": 0.8},
        {"model": str(ft2_path), "base": str(base_path), "alpha": 0.4},
    ]
    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    merger = BreadcrumbsMerge(
        config,
        index_manager=_offline_index(base_path, ft1_path, ft2_path),
        beta=0.4,
        gamma=0.1,
        lam=0.9,
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    def oracle(base, deltas, beta, gamma, lam):
        banded = []
        for d in deltas:
            flat = np.abs(d).ravel()
            n = flat.size
            k_low = int(round(beta * n))
            k_top = int(round(gamma * n))
            s = np.sort(flat)
            keep = np.ones(d.shape, bool)
            if k_top > 0:
                keep &= np.abs(d) < s[n - k_top]
            if k_low > 0:
                keep &= np.abs(d) >= s[k_low]
            banded.append(np.where(keep, d, 0.0))
        return base + lam * np.stack(banded).sum(axis=0)

    for name in (
        "model.layers.0.mlp.up_proj.weight",
        "model.layers.1.input_layernorm.weight",
    ):
        deltas = [
            0.8 * (ft1_t[name] - base_t[name]),
            0.4 * (ft2_t[name] - base_t[name]),
        ]
        expect = oracle(base_t[name], deltas, 0.4, 0.1, 0.9)
        np.testing.assert_allclose(out[name], expect, rtol=1e-5, atol=1e-6)


def test_breadcrumbs_ties_combine_and_validation(tmp_path, tiny_model_factory):
    from shardmerge_tpu.merge import BreadcrumbsMerge

    base_path, base_t = tiny_model_factory("base", seed=280)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=281)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=282)
    entries = [
        {"model": str(ft1_path), "base": str(base_path)},
        {"model": str(ft2_path), "base": str(base_path)},
    ]
    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    with pytest.raises(ValueError, match="empty"):
        BreadcrumbsMerge(
            config,
            index_manager=_offline_index(base_path),
            beta=0.8,
            gamma=0.2,
        )
    merger = BreadcrumbsMerge(
        config,
        index_manager=_offline_index(base_path, ft1_path, ft2_path),
        beta=0.3,
        gamma=0.1,
        combine="ties",
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    name = "model.layers.1.mlp.down_proj.weight"
    banded = []
    for ft_t in (ft1_t, ft2_t):
        d = ft_t[name] - base_t[name]
        flat = np.abs(d).ravel()
        n = flat.size
        s = np.sort(flat)
        k_low, k_top = int(round(0.3 * n)), int(round(0.1 * n))
        keep = (np.abs(d) < s[n - k_top]) & (np.abs(d) >= s[k_low])
        banded.append(np.where(keep, d, 0.0).ravel())
    merged = _np_elect(np.stack(banded)).reshape(base_t[name].shape)
    np.testing.assert_allclose(
        out[name], base_t[name] + merged, rtol=1e-5, atol=1e-6
    )


def test_model_stock_geometry():
    """The ratio math on constructed geometries: identical deltas -> t=1
    (output = the finetunes), orthogonal deltas -> t=0 (output = base),
    anti-aligned pathologies clamp instead of extrapolating."""
    from shardmerge_tpu.merge.modelstock import _stock_reduce

    base = jnp.zeros((2, 2), jnp.float32)
    d = jnp.asarray([[1.0, 2.0], [3.0, 4.0]], jnp.float32)

    out, t = _stock_reduce(base, jnp.stack([d, d]))
    np.testing.assert_allclose(float(t), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(d), rtol=1e-6)

    d1 = jnp.asarray([[1.0, 0.0], [0.0, 0.0]], jnp.float32)
    d2 = jnp.asarray([[0.0, 1.0], [0.0, 0.0]], jnp.float32)
    out, t = _stock_reduce(base, jnp.stack([d1, d2]))
    np.testing.assert_allclose(float(t), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)

    # anti-aligned: cos=-1 -> paper formula diverges; clamped to t=0
    out, t = _stock_reduce(base, jnp.stack([d1, -d1]))
    assert 0.0 <= float(t) <= 1.0
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_model_stock_merge_matches_numpy(tmp_path, tiny_model_factory):
    from shardmerge_tpu.merge import ModelStockMerge

    base_path, base_t = tiny_model_factory("base", seed=290)
    ft1_path, ft1_t = tiny_model_factory("ft1", seed=291)
    ft2_path, ft2_t = tiny_model_factory("ft2", seed=292)
    ft3_path, ft3_t = tiny_model_factory("ft3", seed=293)
    entries = [
        {"model": str(p), "base": str(base_path)}
        for p in (ft1_path, ft2_path, ft3_path)
    ]
    config = _make_config(tmp_path, base_path, entries, output_dtype="float32")
    merger = ModelStockMerge(
        config,
        index_manager=_offline_index(base_path, ft1_path, ft2_path, ft3_path),
    )
    _run_merge(merger)
    out = _read_output(tmp_path / "merged")

    for name in (
        "model.layers.0.self_attn.q_proj.weight",
        "model.layers.1.input_layernorm.weight",
    ):
        deltas = np.stack(
            [
                (t[name] - base_t[name]).reshape(-1)
                for t in (ft1_t, ft2_t, ft3_t)
            ]
        ).astype(np.float32)
        n = deltas.shape[0]
        norms = np.linalg.norm(deltas, axis=1)
        cos = np.zeros((n, n), np.float32)
        for i in range(n):
            for j in range(n):
                if i != j and norms[i] > 0 and norms[j] > 0:
                    cos[i, j] = deltas[i] @ deltas[j] / (norms[i] * norms[j])
        cos_theta = cos.sum() / (n * n - n)
        t_ratio = n * cos_theta / (1 + (n - 1) * cos_theta)
        t_ratio = min(max(t_ratio, 0.0), 1.0)
        expect = base_t[name] + t_ratio * deltas.mean(axis=0).reshape(
            base_t[name].shape
        )
        np.testing.assert_allclose(out[name], expect, rtol=1e-4, atol=1e-6)


def test_model_stock_rejects_single_finetune(tmp_path, tiny_model_factory):
    from shardmerge_tpu.config import ConfigError
    from shardmerge_tpu.merge import ModelStockMerge

    base_path, _ = tiny_model_factory("base", seed=295)
    ft1_path, _ = tiny_model_factory("ft1", seed=296)
    entries = [{"model": str(ft1_path), "base": str(base_path)}]
    config = _make_config(tmp_path, base_path, entries)
    with pytest.raises(ConfigError, match="at least two"):
        ModelStockMerge(config, index_manager=_offline_index(base_path))


def test_merge_with_lora_adapter_entry(tmp_path, tiny_model_factory):
    """A finetune_merge entry pointing at a PEFT adapter DIRECTORY merges
    byte-identically to pre-fusing that adapter to disk with fuse-lora:
    the offline index fuses base + (alpha/r)*B@A on the fly, so LoRA
    finetunes enter the merge pipeline with no intermediate full
    checkpoint doubling disk."""
    from shardmerge_tpu.io.safetensors_io import save_file
    from shardmerge_tpu.tools.fuse_lora import fuse_lora

    base_path, base_t = tiny_model_factory("base", seed=300)
    ft_path, _ = tiny_model_factory("ft", seed=301)

    adapter = tmp_path / "adapter"
    adapter.mkdir()
    gen = np.random.default_rng(17)
    targets = [
        "model.layers.0.self_attn.q_proj.weight",
        "model.layers.1.mlp.down_proj.weight",
    ]
    aw = {}
    for t in targets:
        od, idim = base_t[t].shape
        mod = t[: -len(".weight")]
        aw[f"base_model.model.{mod}.lora_A.weight"] = gen.standard_normal(
            (2, idim)
        ).astype(np.float32)
        aw[f"base_model.model.{mod}.lora_B.weight"] = gen.standard_normal(
            (od, 2)
        ).astype(np.float32)
    save_file(aw, adapter / "adapter_model.safetensors")
    (adapter / "adapter_config.json").write_text(
        json.dumps(
            {
                "r": 2,
                "lora_alpha": 4,
                "peft_type": "LORA",
                "base_model_name_or_path": str(base_path),
            }
        )
    )

    fused_dir = tmp_path / "fused"
    fuse_lora(base_path, adapter, fused_dir)

    def run(model_ref, outdir, index_paths):
        entries = [
            {"model": str(model_ref), "base": str(base_path), "alpha": 0.7},
            {"model": str(ft_path), "base": str(base_path), "alpha": 0.3},
        ]
        config = _make_config(
            tmp_path, base_path, entries, output_dtype="float32"
        )
        config.output_dir = str(tmp_path / outdir)
        merger = FourierMerge(
            config, index_manager=_offline_index(*index_paths)
        )
        _run_merge(merger)
        return _read_output(tmp_path / outdir)

    via_adapter = run(adapter, "m_adapter", (base_path, adapter, ft_path))
    via_fused = run(fused_dir, "m_fused", (base_path, fused_dir, ft_path))
    for k in via_fused:
        np.testing.assert_array_equal(
            via_adapter[k].view(np.uint32),
            via_fused[k].view(np.uint32),
            err_msg=k,
        )

    # a dangling base reference fails loudly at registration
    bad = tmp_path / "bad_adapter"
    bad.mkdir()
    save_file(aw, bad / "adapter_model.safetensors")
    (bad / "adapter_config.json").write_text(
        json.dumps(
            {
                "r": 2,
                "lora_alpha": 4,
                "base_model_name_or_path": "org/nonexistent-model",
            }
        )
    )
    with pytest.raises(FileNotFoundError, match="base_model_name_or_path"):
        _offline_index(bad)


def _write_adapter(dirpath, base_t, base_ref, targets, rank=2, seed=17):
    """PEFT adapter dir with rank-`rank` pairs on `targets`."""
    from shardmerge_tpu.io.safetensors_io import save_file

    dirpath.mkdir(parents=True, exist_ok=True)
    gen = np.random.default_rng(seed)
    aw = {}
    for t in targets:
        od, idim = base_t[t].shape
        mod = t[: -len(".weight")]
        aw[f"base_model.model.{mod}.lora_A.weight"] = gen.standard_normal(
            (rank, idim)
        ).astype(np.float32)
        aw[f"base_model.model.{mod}.lora_B.weight"] = gen.standard_normal(
            (od, rank)
        ).astype(np.float32)
    save_file(aw, dirpath / "adapter_model.safetensors")
    (dirpath / "adapter_config.json").write_text(
        json.dumps(
            {
                "r": rank,
                "lora_alpha": 2 * rank,
                "peft_type": "LORA",
                "base_model_name_or_path": str(base_ref),
            }
        )
    )


def test_adapter_implicit_base_evicts_after_fuse(tmp_path, tiny_model_factory):
    """A base checkpoint registered ONLY via an adapter's
    base_model_name_or_path must not pin itself in the host tensor cache:
    the merge loop's per-layer eviction releases config-listed models
    only, so the fuse path drops each implicit base tensor after use.
    Untargeted tensors pass the base array through by reference — those
    keep their cache entry (popping would free nothing). A base the user
    registered explicitly keeps its entries (the merge owns them)."""
    base_path, base_t = tiny_model_factory("base", seed=320)
    target = "model.layers.0.self_attn.q_proj.weight"
    untargeted = "model.layers.1.mlp.up_proj.weight"
    adapter = tmp_path / "adapter"
    _write_adapter(adapter, base_t, base_path, [target])

    # implicit base: only the adapter is added; its registration pulls
    # the base in behind the scenes
    index = OfflineMultiModelIndex()
    index.add_model(adapter)
    base_id = index._adapters["adapter"]["base"]
    assert index._adapters["adapter"]["evict_base"]

    async def fetch(name):
        return await index.get_tensor("adapter", name).get()

    fused = asyncio.run(fetch(target))
    assert (base_id, target) not in index._tensor_cache
    assert ("adapter", target) in index._tensor_cache
    # the fused result is real (base + delta, not the raw base)
    assert not np.array_equal(fused, base_t[target])

    passthrough = asyncio.run(fetch(untargeted))
    np.testing.assert_array_equal(passthrough, base_t[untargeted])
    assert (base_id, untargeted) in index._tensor_cache

    # explicit base: user registered it first -> never popped
    index2 = OfflineMultiModelIndex()
    index2.add_model(base_path)
    adapter2 = tmp_path / "adapter2"
    _write_adapter(adapter2, base_t, base_path, [target])
    index2.add_model(adapter2)
    assert not index2._adapters["adapter2"]["evict_base"]

    async def fetch2(name):
        return await index2.get_tensor("adapter2", name).get()

    asyncio.run(fetch2(target))
    assert (index2._adapters["adapter2"]["base"], target) in index2._tensor_cache


def test_adapter_registration_rolls_back_on_bad_targets(
    tmp_path, tiny_model_factory
):
    """A failed adapter validation (targets absent from the base) must not
    leave a half-registered model: the same directory NAME must remain
    registrable afterwards — mirroring add_model's packed-path rollback."""
    base_path, base_t = tiny_model_factory("base", seed=330)
    bad = tmp_path / "x" / "contender"
    _write_adapter(bad, base_t, base_path, [
        "model.layers.0.self_attn.q_proj.weight",
    ])
    # point a pair at a tensor the base does not have
    aw_dir = bad / "adapter_model.safetensors"
    from shardmerge_tpu.io.safetensors_io import save_file

    gen = np.random.default_rng(5)
    save_file(
        {
            "base_model.model.model.layers.9.ghost.lora_A.weight": (
                gen.standard_normal((2, 8)).astype(np.float32)
            ),
            "base_model.model.model.layers.9.ghost.lora_B.weight": (
                gen.standard_normal((8, 2)).astype(np.float32)
            ),
        },
        aw_dir,
    )

    index = OfflineMultiModelIndex()
    with pytest.raises(KeyError, match="absent from its base"):
        index.add_model(bad)
    assert "contender" not in index.model_paths
    assert "contender" not in index._adapters

    # the name is free again: a real checkpoint dir with the same name
    # registers cleanly
    good_parent = tmp_path / "y"
    good_parent.mkdir()
    from .conftest import make_tiny_model

    make_tiny_model(good_parent / "contender", seed=331)
    index.add_model(good_parent / "contender")
    assert "contender" in index.model_indexes


def test_merge_with_gptq_finetune(tmp_path, tiny_model_factory):
    """A finetune_merge entry naming a local GPTQ checkpoint merges
    byte-identically to merging its dequantized raw twin: the offline
    index registers a virtual .weight-keyed view over the packed
    qweight/qzeros/scales/g_idx parts and decodes per tensor on demand,
    so key-set validation against the base passes untouched."""
    from shardmerge_tpu.io.safetensors_io import save_file
    from shardmerge_tpu.merge import LinearMerge

    base_path, base_t = tiny_model_factory("base", seed=310)

    group, bits = 8, 4
    per = 32 // bits
    rng = np.random.default_rng(311)

    def pack_rows(vals):
        v = vals.astype(np.uint32).reshape(vals.shape[0] // per, per, -1)
        out = np.zeros((v.shape[0], v.shape[2]), np.uint32)
        for k in range(per):
            out |= v[:, k, :] << np.uint32(bits * k)
        return out.astype(np.int32)

    gq_tensors = {}
    raw_tensors = {}
    for k, v in base_t.items():
        if k.endswith("proj.weight"):
            out_dim, in_dim = v.shape
            root = k[: -len(".weight")]
            q = rng.integers(0, 16, (in_dim, out_dim))
            zeros = rng.integers(1, 16, (in_dim // group, out_dim))
            scales = (
                rng.standard_normal((in_dim // group, out_dim)) * 0.05
            ).astype(np.float16)
            g_idx = (np.arange(in_dim, dtype=np.int32) // group).astype(
                np.int32
            )
            w = scales.astype(np.float32)[g_idx] * (
                q.astype(np.float32) - zeros.astype(np.float32)[g_idx]
            )
            gq_tensors[f"{root}.qweight"] = pack_rows(q)
            gq_tensors[f"{root}.qzeros"] = pack_rows((zeros - 1).T).T.copy()
            gq_tensors[f"{root}.scales"] = scales
            gq_tensors[f"{root}.g_idx"] = g_idx
            raw_tensors[k] = np.ascontiguousarray(w.T)
        else:
            gq_tensors[k] = v
            raw_tensors[k] = v

    gq_dir = tmp_path / "ft_gptq"
    raw_dir = tmp_path / "ft_raw"
    for d, t in ((gq_dir, gq_tensors), (raw_dir, raw_tensors)):
        d.mkdir()
        save_file(t, d / "model.safetensors")
    (gq_dir / "config.json").write_text(
        json.dumps(
            {
                "model_type": "llama",
                "quantization_config": {
                    "quant_method": "gptq",
                    "bits": bits,
                    "group_size": group,
                },
            }
        )
    )

    def run(ft_dir, outdir):
        entries = [
            {"model": str(ft_dir), "base": str(base_path), "alpha": 0.6}
        ]
        config = _make_config(
            tmp_path, base_path, entries, output_dtype="float32"
        )
        config.output_dir = str(tmp_path / outdir)
        merger = LinearMerge(
            config, index_manager=_offline_index(base_path, ft_dir)
        )
        _run_merge(merger)
        return _read_output(tmp_path / outdir)

    via_gptq = run(gq_dir, "m_gptq")
    via_raw = run(raw_dir, "m_raw")
    for k in via_raw:
        np.testing.assert_array_equal(
            via_gptq[k].view(np.uint32),
            via_raw[k].view(np.uint32),
            err_msg=k,
        )

    # the virtual key set mirrors a raw checkpoint's
    index = _offline_index(gq_dir)
    assert index.get_model_keys("ft_gptq") == set(base_t)


def test_merge_with_awq_finetune(tmp_path, tiny_model_factory):
    """A finetune_merge entry naming a local AWQ (gemm) checkpoint merges
    byte-identically to merging its dequantized raw twin — same virtual
    .weight-keyed index machinery as GPTQ, three parts per module, AWQ's
    interleaved pack order, contiguous groups, true zeros."""
    from shardmerge_tpu.io.safetensors_io import save_file
    from shardmerge_tpu.merge import LinearMerge

    base_path, base_t = tiny_model_factory("base", seed=320)

    group = 8
    rng = np.random.default_rng(321)
    awq_order = [0, 2, 4, 6, 1, 3, 5, 7]

    def pack_awq(vals):
        rows, out = vals.shape
        packed = np.zeros((rows, out // 8), np.uint32)
        for k in range(8):
            packed |= vals[:, awq_order[k]::8].astype(np.uint32) << np.uint32(
                4 * k
            )
        return packed.astype(np.int32)

    awq_tensors = {}
    raw_tensors = {}
    for k, v in base_t.items():
        if k.endswith("proj.weight"):
            out_dim, in_dim = v.shape
            root = k[: -len(".weight")]
            q = rng.integers(0, 16, (in_dim, out_dim))
            zeros = rng.integers(0, 16, (in_dim // group, out_dim))
            scales = (
                rng.standard_normal((in_dim // group, out_dim)) * 0.05
            ).astype(np.float16)
            g = np.arange(in_dim) // group
            w = scales.astype(np.float32)[g] * (
                q.astype(np.float32) - zeros.astype(np.float32)[g]
            )
            awq_tensors[f"{root}.qweight"] = pack_awq(q)
            awq_tensors[f"{root}.qzeros"] = pack_awq(zeros)
            awq_tensors[f"{root}.scales"] = scales
            raw_tensors[k] = np.ascontiguousarray(w.T)
        else:
            awq_tensors[k] = v
            raw_tensors[k] = v

    awq_dir = tmp_path / "ft_awq"
    raw_dir = tmp_path / "ft_raw"
    for d, t in ((awq_dir, awq_tensors), (raw_dir, raw_tensors)):
        d.mkdir()
        save_file(t, d / "model.safetensors")
    (awq_dir / "config.json").write_text(
        json.dumps(
            {
                "model_type": "llama",
                "quantization_config": {
                    "quant_method": "awq",
                    "bits": 4,
                    "group_size": group,
                    "zero_point": True,
                    "version": "gemm",
                },
            }
        )
    )

    def run(ft_dir, outdir):
        entries = [
            {"model": str(ft_dir), "base": str(base_path), "alpha": 0.6}
        ]
        config = _make_config(
            tmp_path, base_path, entries, output_dtype="float32"
        )
        config.output_dir = str(tmp_path / outdir)
        merger = LinearMerge(
            config, index_manager=_offline_index(base_path, ft_dir)
        )
        _run_merge(merger)
        return _read_output(tmp_path / outdir)

    via_awq = run(awq_dir, "m_awq")
    via_raw = run(raw_dir, "m_raw")
    for k in via_raw:
        np.testing.assert_array_equal(
            via_awq[k].view(np.uint32),
            via_raw[k].view(np.uint32),
            err_msg=k,
        )

    # the virtual key set mirrors a raw checkpoint's; unsupported AWQ
    # serializations refuse at registration
    index = _offline_index(awq_dir)
    assert index.get_model_keys("ft_awq") == set(base_t)
    bad_dir = tmp_path / "ft_awq_exllama"
    bad_dir.mkdir()
    save_file(awq_tensors, bad_dir / "model.safetensors")
    (bad_dir / "config.json").write_text(
        json.dumps(
            {
                "model_type": "llama",
                "quantization_config": {
                    "quant_method": "awq",
                    "bits": 4,
                    "version": "exllama",
                },
            }
        )
    )
    with pytest.raises(ValueError, match="exllama"):
        _offline_index(bad_dir)


def test_fourier_merge_llama4_checkpoints(tmp_path):
    """The merge pipeline end-to-end on real Llama-4-shaped HF checkpoints:
    index discovery over feed_forward.* component names, the 3-D fused
    expert stacks (E, hidden, 2I) through the 2-D FFT blend (reference
    fft_transform fftn over the LAST TWO dims — leading dims are batch),
    and the router/shared-expert tensors. The fused expert tensor is
    oracle-checked against the torch realization of the full layer
    algorithm."""
    from .test_models import _tiny_llama4

    # distinct leaf names: the offline index keys models by directory name
    # (reference index.py:295 parity)
    paths = []
    for leaf, seed in (("l4base", 31), ("l4ft1", 32), ("l4ft2", 33)):
        m, _ = _tiny_llama4(tmp_path / leaf, seed=seed)
        p = tmp_path / leaf / leaf
        (tmp_path / leaf / "llama4").rename(p)
        # re-save sharded so the checkpoints carry an index (the index
        # layer's contract, like the reference's)
        m.save_pretrained(str(p), safe_serialization=True, max_shard_size="150KB")
        paths.append(p)
    base_path, ft1_path, ft2_path = paths

    def read_all(d):
        out = {}
        idx = json.loads((d / "model.safetensors.index.json").read_text())
        assert len(set(idx["weight_map"].values())) > 1  # really sharded
        for shard in set(idx["weight_map"].values()):
            with SafeTensorsReader(d / shard) as r:
                for k in r.keys():
                    out[k] = r.get_tensor(k, copy=True)
        return out

    base_t = read_all(base_path)
    ft1_t = read_all(ft1_path)
    ft2_t = read_all(ft2_path)

    config = _make_config(
        tmp_path,
        base_path,
        [
            {"model": str(ft1_path), "base": str(base_path), "alpha": 0.8},
            {"model": str(ft2_path), "base": str(base_path), "alpha": 0.4},
        ],
        output_dtype="float32",
    )
    merger = FourierMerge(
        config, index_manager=_offline_index(base_path, ft1_path, ft2_path)
    )
    _run_merge(merger)
    out = read_all(tmp_path / "merged")

    assert set(out) == set(base_t)
    for name, arr in out.items():
        assert np.all(np.isfinite(arr)), name
        assert arr.shape == base_t[name].shape, name

    for name in (
        "model.layers.1.feed_forward.experts.gate_up_proj",  # 3-D fused
        "model.layers.0.feed_forward.gate_proj.weight",  # dense 2-D
        "model.layers.1.feed_forward.router.weight",
    ):
        expect = _oracle_fourier_pair(
            base_t[name], ft1_t[name], ft2_t[name], 0.8, 0.4
        )
        scale = max(np.abs(expect).max(), 1.0)
        _mostly_close(out[name], expect, rtol=2e-2, atol=2e-2 * scale)
