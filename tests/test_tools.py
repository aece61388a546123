"""Tools tests: verify/repair, reorder/reshard, pytorch conversion, and the
CLI wiring (click runner, like the reference's tests/test_main.py)."""

import json
from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from shardmerge_tpu.io.safetensors_io import SafeTensorsReader, save_file
from shardmerge_tpu.tools.rewrite_reorder import (
    reshard_and_reorder,
    transformer_sort_key,
)
from shardmerge_tpu.tools.verify_safetensors import (
    audit_alignment,
    rebuild_index,
    scan_shard_keys,
)

from .conftest import TINY_SHARD_MAP


def test_verify_clean_model(tiny_model_factory):
    path, _ = tiny_model_factory("m", seed=1)
    index = json.load(open(path / "model.safetensors.index.json"))
    report = audit_alignment(index["weight_map"], scan_shard_keys(path))
    assert report.clean
    assert "agree" in report.render()
    assert report.keys_checked == len(index["weight_map"])


def test_verify_detects_and_repairs(tiny_model_factory):
    path, _ = tiny_model_factory("m", seed=2)
    index_path = path / "model.safetensors.index.json"
    index = json.load(open(index_path))
    # break the index: point a key at a nonexistent file
    index["weight_map"]["model.norm.weight"] = "model-00009-of-00009.safetensors"
    json.dump(index, open(index_path, "w"))

    shard_keys = scan_shard_keys(path)
    report = audit_alignment(index["weight_map"], shard_keys)
    assert not report.clean
    assert "model-00009-of-00009.safetensors" in report.phantom_shards
    # the real shard now holds a key the index no longer claims for it
    assert any("model.norm.weight" in d.unlisted for d in report.drift)
    assert "phantom shard" in report.render()

    backup = rebuild_index(shard_keys, index_path, index.get("metadata"))
    assert backup.exists()  # the stale index was kept
    repaired = json.load(open(index_path))
    assert audit_alignment(repaired["weight_map"], scan_shard_keys(path)).clean


def test_transformer_sort_key_order():
    names = [
        "lm_head.weight",
        "model.layers.10.mlp.down_proj.weight",
        "model.layers.2.self_attn.k_proj.weight",
        "model.layers.2.input_layernorm.weight",
        "model.layers.2.self_attn.q_proj.weight",
        "model.norm.weight",
        "model.embed_tokens.weight",
        "model.layers.2.mlp.gate_proj.weight",
    ]
    ordered = sorted(names, key=transformer_sort_key)
    assert ordered[0] == "model.embed_tokens.weight"
    assert ordered[-2:] == ["model.norm.weight", "lm_head.weight"]
    layer2 = [n for n in ordered if ".layers.2." in n]
    assert layer2 == [
        "model.layers.2.input_layernorm.weight",
        "model.layers.2.self_attn.q_proj.weight",
        "model.layers.2.self_attn.k_proj.weight",
        "model.layers.2.mlp.gate_proj.weight",
    ]
    # numeric layer sorting: layer 10 after layer 2
    assert ordered.index("model.layers.10.mlp.down_proj.weight") > ordered.index(
        "model.layers.2.mlp.gate_proj.weight"
    )


def test_reshard_and_reorder(tmp_path, tiny_model_factory):
    src, tensors = tiny_model_factory("src", seed=3)
    out = tmp_path / "resharded"
    (src / "config.json").write_text('{"model_type": "llama"}')
    reshard_and_reorder(src, out, num_shards=2)

    index = json.load(open(out / "model.safetensors.index.json"))
    assert index["metadata"]["num_shards_actual"] <= 2
    files = sorted(out.glob("model-*.safetensors"))
    assert len(files) == index["metadata"]["num_shards_actual"]
    assert (out / "config.json").exists()

    # all tensors present and bit-identical
    seen = {}
    for f in files:
        with SafeTensorsReader(f) as r:
            for k in r.keys():
                seen[k] = r.get_tensor(k, copy=True)
    assert set(seen) == set(tensors)
    for k in seen:
        np.testing.assert_array_equal(seen[k], tensors[k])

    # index order is the canonical transformer order
    keys = list(index["weight_map"].keys())
    assert keys == sorted(keys, key=transformer_sort_key)


def test_convert_single_bin(tmp_path):
    import torch

    from shardmerge_tpu.tools.convert_pytorch_to_hf import convert

    sd = {
        "model.embed_tokens.weight": torch.randn(8, 4),
        "model.layers.0.self_attn.q_proj.weight": torch.randn(4, 4).to(
            torch.bfloat16
        ),
        "lm_head.weight": torch.randn(8, 4),
    }
    bin_dir = tmp_path / "torch_model"
    bin_dir.mkdir()
    torch.save(sd, bin_dir / "pytorch_model.bin")

    out = tmp_path / "converted"
    convert(bin_dir, out, num_shards=2)
    index = json.load(open(out / "model.safetensors.index.json"))
    assert set(index["weight_map"]) == set(sd)
    for f in set(index["weight_map"].values()):
        assert (out / f).exists()
    with SafeTensorsReader(out / index["weight_map"]["model.embed_tokens.weight"]) as r:
        np.testing.assert_array_equal(
            r.get_tensor("model.embed_tokens.weight"),
            sd["model.embed_tokens.weight"].numpy(),
        )


def test_convert_sharded_bin(tmp_path):
    import torch

    from shardmerge_tpu.tools.convert_pytorch_to_hf import convert

    bin_dir = tmp_path / "torch_model"
    bin_dir.mkdir()
    sd1 = {"model.embed_tokens.weight": torch.randn(8, 4)}
    sd2 = {"lm_head.weight": torch.randn(8, 4)}
    torch.save(sd1, bin_dir / "pytorch_model-00001-of-00002.bin")
    torch.save(sd2, bin_dir / "pytorch_model-00002-of-00002.bin")
    index = {
        "metadata": {"total_size": 256},
        "weight_map": {
            "model.embed_tokens.weight": "pytorch_model-00001-of-00002.bin",
            "lm_head.weight": "pytorch_model-00002-of-00002.bin",
        },
    }
    json.dump(index, open(bin_dir / "pytorch_model.bin.index.json", "w"))

    out = tmp_path / "converted"
    convert(bin_dir, out)
    new_index = json.load(open(out / "model.safetensors.index.json"))
    assert (
        new_index["weight_map"]["model.embed_tokens.weight"]
        == "model-00001-of-00002.safetensors"
    )
    assert (out / "model-00002-of-00002.safetensors").exists()


def test_cli_verify_command(tiny_model_factory):
    from shardmerge_tpu.cli import cli

    path, _ = tiny_model_factory("m", seed=5)
    runner = CliRunner()
    result = runner.invoke(cli, ["verify-safetensors", "--model_dir", str(path)])
    assert result.exit_code == 0, result.output
    assert "agree" in result.output


def test_cli_merge_offline(tmp_path, tiny_model_factory):
    from shardmerge_tpu.cli import cli

    base_path, _ = tiny_model_factory("base", seed=6)
    ft_path, ft_t = tiny_model_factory("ft", seed=7)
    config = {
        "output_base_model": str(base_path),
        "finetune_merge": [{"model": str(ft_path), "base": str(base_path)}],
        "output_dir": str(tmp_path / "merged"),
        "cache_dir": str(tmp_path / "cache"),
        "storage_dir": str(tmp_path / "storage"),
    }
    import yaml

    config_path = tmp_path / "config.yaml"
    config_path.write_text(yaml.safe_dump(config))

    runner = CliRunner()
    result = runner.invoke(cli, ["merge", str(config_path)])
    assert result.exit_code == 0, result.output
    assert (tmp_path / "merged" / "model.safetensors.index.json").exists()
    assert (tmp_path / "merged" / "README.md").exists()
    out_shards = set(TINY_SHARD_MAP.values())
    for shard in out_shards:
        assert (tmp_path / "merged" / shard).exists()


def test_cli_merge_bad_config(tmp_path):
    from shardmerge_tpu.cli import cli

    config_path = tmp_path / "bad.yaml"
    config_path.write_text("output_dir: out\n")
    runner = CliRunner()
    result = runner.invoke(cli, ["merge", str(config_path)])
    assert result.exit_code != 0


def test_cli_merge_unknown_method(tmp_path, tiny_model_factory):
    from shardmerge_tpu.cli import cli

    base_path, _ = tiny_model_factory("base", seed=8)
    import yaml

    config_path = tmp_path / "config.yaml"
    config_path.write_text(
        yaml.safe_dump(
            {
                "output_base_model": str(base_path),
                "finetune_merge": [
                    {"model": str(base_path), "base": str(base_path)}
                ],
                "output_dir": str(tmp_path / "m"),
            }
        )
    )
    runner = CliRunner()
    result = runner.invoke(cli, ["merge", str(config_path), "--method", "bogus"])
    assert result.exit_code != 0


def test_cli_generate_command(monkeypatch, tmp_path):
    """generate wires CLI options through to the engine (engine mocked)."""
    from shardmerge_tpu import cli as cli_mod

    calls = {}

    class FakeEngine:
        @classmethod
        def from_pretrained(
            cls,
            path,
            load_in_4bit=False,
            load_in_8bit=False,
            draft_model=None,
            speculation_k=4,
            shard=False,
        ):
            calls["init"] = (path, load_in_4bit, load_in_8bit)
            return cls()

        def stream_generation(self, **kw):
            calls["gen"] = kw
            yield "hello"
            yield " world"

    import shardmerge_tpu.inference as inf

    monkeypatch.setattr(inf, "InferenceEngine", FakeEngine)
    (tmp_path / "model").mkdir()
    runner = CliRunner()
    result = runner.invoke(
        cli_mod.cli,
        [
            "generate",
            str(tmp_path / "model"),
            "hi there",
            "--max-tokens",
            "7",
            "--temperature",
            "0.5",
            "-4",
            "--greedy",
            "--decode-chunk",
            "8",
        ],
    )
    assert result.exit_code == 0, result.output
    assert "hello world" in result.output
    assert calls["init"] == (str(tmp_path / "model"), True, False)
    assert calls["gen"]["max_new_tokens"] == 7
    assert calls["gen"]["temperature"] == 0.5
    assert calls["gen"]["greedy"] is True
    assert calls["gen"]["decode_chunk"] == 8


def test_cli_copy_model(monkeypatch, tmp_path, tiny_model_factory):
    """copy-model downloads config files and builds a writer over the index."""
    import shardmerge_tpu.io.writer as writer_mod

    src_path, _ = tiny_model_factory("donor2", seed=11)

    def fake_snapshot_download(repo_id, revision, ignore_patterns, local_dir, token=None):
        import shutil

        assert "*.safetensors" in ignore_patterns
        shutil.copy(
            src_path / "model.safetensors.index.json",
            Path(local_dir) / "model.safetensors.index.json",
        )

    import huggingface_hub

    monkeypatch.setattr(
        huggingface_hub, "snapshot_download", fake_snapshot_download
    )

    from shardmerge_tpu.cli import cli

    import yaml

    config_path = tmp_path / "c.yaml"
    config_path.write_text(
        yaml.safe_dump(
            {
                "output_base_model": "org/base",
                "finetune_merge": [{"model": "org/ft", "base": "org/base"}],
                "output_dir": str(tmp_path / "copied"),
            }
        )
    )
    runner = CliRunner()
    result = runner.invoke(cli, ["copy-model", str(config_path)])
    assert result.exit_code == 0, result.output
    assert (tmp_path / "copied" / "model.safetensors.index.json").exists()


def test_cli_merge_write_through(tmp_path, tiny_model_factory):
    from shardmerge_tpu.cli import cli

    base_path, _ = tiny_model_factory("base", seed=20)
    ft_path, _ = tiny_model_factory("ft", seed=21)
    import yaml

    config_path = tmp_path / "config.yaml"
    config_path.write_text(
        yaml.safe_dump(
            {
                "output_base_model": str(base_path),
                "finetune_merge": [
                    {"model": str(ft_path), "base": str(base_path)}
                ],
                "output_dir": str(tmp_path / "merged"),
                "cache_dir": str(tmp_path / "cache"),
                "storage_dir": str(tmp_path / "storage"),
            }
        )
    )
    runner = CliRunner()
    result = runner.invoke(
        cli, ["merge", str(config_path), "--write-through"]
    )
    assert result.exit_code == 0, result.output
    for shard in set(TINY_SHARD_MAP.values()):
        assert (tmp_path / "merged" / shard).exists()


def test_cli_generate_end_to_end_real_tokenizer(tmp_path):
    """Full generate path: merged-model dir with a real (fabricated)
    tokenizer, driven through the CLI with the actual AutoTokenizer."""
    import torch
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(13)
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=512,
    )
    model_dir = tmp_path / "m"
    LlamaForCausalLM(config).eval().save_pretrained(
        str(model_dir), safe_serialization=True
    )

    vocab = {f"tok{i}": i for i in range(120)}
    vocab.update({"<unk>": 120, "hello": 121, "there": 122})
    tok = Tokenizer(tok_models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(model_dir / "tokenizer.json"))
    (model_dir / "tokenizer_config.json").write_text(
        json.dumps(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "unk_token": "<unk>",
                "eos_token": "tok0",
            }
        )
    )

    from shardmerge_tpu.cli import cli

    runner = CliRunner()
    result = runner.invoke(
        cli,
        ["generate", str(model_dir), "hello there", "--max-tokens", "6", "--greedy"],
    )
    assert result.exit_code == 0, result.output
    assert result.output.strip()  # produced some tokens


def test_inspect_and_compare(tmp_path, tiny_model_factory, capsys):
    from shardmerge_tpu.tools.inspect_model import compare_models, inspect_model

    path_a, t_a = tiny_model_factory("a", seed=30)
    path_b, t_b = tiny_model_factory("bm", seed=31)

    summary = inspect_model(path_a)
    assert summary["tensors"] == len(TINY_SHARD_MAP)
    assert summary["num_layers"] == 2
    assert "float32" in summary["dtypes"]

    # identical dirs -> all bit-identical
    stats, oa, ob = compare_models(path_a, path_a)
    assert not oa and not ob
    assert all(s["identical"] for s in stats)

    # different models -> differences reported
    stats, _, _ = compare_models(path_a, path_b)
    assert any(not s["identical"] for s in stats)
    assert stats[0]["max_rel"] >= stats[-1].get("max_rel", 0)


def test_cli_compare_gate(tmp_path, tiny_model_factory):
    from shardmerge_tpu.cli import cli

    path_a, _ = tiny_model_factory("a2", seed=32)
    path_b, _ = tiny_model_factory("b2", seed=33)
    runner = CliRunner()
    ok = runner.invoke(cli, ["compare", str(path_a), str(path_a), "--max-rel", "0"])
    assert ok.exit_code == 0, ok.output
    bad = runner.invoke(
        cli, ["compare", str(path_a), str(path_b), "--max-rel", "1e-6"]
    )
    assert bad.exit_code != 0
    shown = runner.invoke(cli, ["inspect", str(path_a)])
    assert shown.exit_code == 0 and "tensors:" in shown.output


def test_merge_dry_run_prints_plan(tmp_path, tiny_model_factory):
    """--dry-run resolves indexes and prints the plan without writing any
    weights (only the output index is materialized by writer init)."""
    from click.testing import CliRunner

    from shardmerge_tpu.cli import cli

    base_path, _ = tiny_model_factory("base", seed=400)
    ft_path, _ = tiny_model_factory("ft", seed=401)
    out_dir = tmp_path / "merged"
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        f"""output_base_model: "{base_path}"
finetune_merge:
  - {{model: "{ft_path}", base: "{base_path}", alpha: 0.9}}
output_dir: "{out_dir}"
cache_dir: "{tmp_path}/cache"
storage_dir: "{tmp_path}/storage"
"""
    )
    result = CliRunner().invoke(cli, ["merge", str(cfg), "--dry-run"])
    assert result.exit_code == 0, result.output
    assert "merge plan: fourier of 1 finetunes" in result.output
    assert "plan OK" in result.output
    # a dry run must leave NO trace in the output location: a stale index
    # written here would be loaded instead of the base index on the real run
    assert not out_dir.exists()


def test_fuse_lora_matches_oracle(tmp_path):
    """fuse-lora: targeted tensors gain exactly scale*(B@A), untargeted
    tensors stream through byte-identical, the shard layout/index is
    preserved, and malformed adapters fail loudly."""
    import numpy as np

    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader, save_file
    from shardmerge_tpu.tools.fuse_lora import LoraFormatError, fuse_lora

    from .conftest import make_tiny_model

    base = tmp_path / "base"
    tensors = make_tiny_model(base, seed=5)

    # synthetic PEFT adapter: rank-2 pairs on both layers' q_proj + layer-0
    # down_proj, standard alpha/r scaling
    r, alpha = 2, 8
    gen = np.random.default_rng(9)
    targets = [
        "model.layers.0.self_attn.q_proj.weight",
        "model.layers.1.self_attn.q_proj.weight",
        "model.layers.0.mlp.down_proj.weight",
    ]
    adapter = tmp_path / "adapter"
    adapter.mkdir()
    aw = {}
    for t in targets:
        out_dim, in_dim = tensors[t].shape
        mod = t[: -len(".weight")]
        aw[f"base_model.model.{mod}.lora_A.weight"] = gen.standard_normal(
            (r, in_dim)
        ).astype(np.float32)
        aw[f"base_model.model.{mod}.lora_B.weight"] = gen.standard_normal(
            (out_dim, r)
        ).astype(np.float32)
    save_file(aw, adapter / "adapter_model.safetensors")
    (adapter / "adapter_config.json").write_text(
        json.dumps({"r": r, "lora_alpha": alpha, "peft_type": "LORA"})
    )

    out = tmp_path / "fused"
    summary = fuse_lora(base, adapter, out)
    assert summary["fused_tensors"] == 3
    assert summary["scale"] == alpha / r

    index = json.loads((out / "model.safetensors.index.json").read_text())
    assert index["weight_map"] == json.loads(
        (base / "model.safetensors.index.json").read_text()
    )["weight_map"]

    for shard in sorted(set(index["weight_map"].values())):
        with SafeTensorsReader(out / shard) as reader:
            for key in reader.keys():
                got = np.asarray(reader.get_tensor(key))
                if key in targets:
                    mod = key[: -len(".weight")]
                    a = aw[f"base_model.model.{mod}.lora_A.weight"]
                    b = aw[f"base_model.model.{mod}.lora_B.weight"]
                    want = tensors[key] + (alpha / r) * (b @ a)
                    np.testing.assert_allclose(got, want, rtol=1e-6)
                else:
                    np.testing.assert_array_equal(got, tensors[key])

    # --scale override
    out2 = tmp_path / "fused2"
    s2 = fuse_lora(base, adapter, out2, scale=0.0)
    assert s2["scale"] == 0.0
    with SafeTensorsReader(
        out2 / index["weight_map"][targets[0]]
    ) as reader:
        np.testing.assert_array_equal(
            np.asarray(reader.get_tensor(targets[0])), tensors[targets[0]]
        )

    # failure modes: dangling target, incomplete pair, bad rank
    bad = tmp_path / "bad"
    bad.mkdir()
    save_file(
        {
            "base_model.model.model.layers.9.self_attn.q_proj.lora_A.weight":
                np.zeros((r, 16), np.float32),
            "base_model.model.model.layers.9.self_attn.q_proj.lora_B.weight":
                np.zeros((16, r), np.float32),
        },
        bad / "adapter_model.safetensors",
    )
    (bad / "adapter_config.json").write_text(json.dumps({"r": r, "lora_alpha": 4}))
    with pytest.raises(LoraFormatError, match="absent from the base"):
        fuse_lora(base, bad, tmp_path / "nope")

    half = tmp_path / "half"
    half.mkdir()
    save_file(
        {
            "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
                np.zeros((r, 16), np.float32),
        },
        half / "adapter_model.safetensors",
    )
    (half / "adapter_config.json").write_text(json.dumps({"r": r, "lora_alpha": 4}))
    with pytest.raises(LoraFormatError, match="incomplete"):
        fuse_lora(base, half, tmp_path / "nope2")


def test_cli_fuse_lora_command(tmp_path):
    import numpy as np

    from shardmerge_tpu.io.safetensors_io import save_file

    from .conftest import make_tiny_model

    base = tmp_path / "b"
    tensors = make_tiny_model(base, seed=6)
    adapter = tmp_path / "a"
    adapter.mkdir()
    t = "model.layers.0.self_attn.q_proj.weight"
    out_dim, in_dim = tensors[t].shape
    save_file(
        {
            "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
                np.ones((1, in_dim), np.float32),
            "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight":
                np.ones((out_dim, 1), np.float32),
        },
        adapter / "adapter_model.safetensors",
    )
    (adapter / "adapter_config.json").write_text(
        json.dumps({"r": 1, "lora_alpha": 1})
    )
    from click.testing import CliRunner

    from shardmerge_tpu.cli import cli as cli_root

    result = CliRunner().invoke(
        cli_root,
        ["fuse-lora", str(base), str(adapter), str(tmp_path / "o")],
    )
    assert result.exit_code == 0, result.output
    assert "Fused 1 tensors" in result.output


def test_extract_lora_roundtrip_full_rank(tmp_path):
    """extract-lora -> fuse-lora roundtrip: at a rank covering every
    target's true delta rank, fusing the extracted adapter reproduces the
    finetune (the two tools are exact inverses up to fp32 SVD rounding);
    untargeted tensors stay the base's."""
    import numpy as np

    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader
    from shardmerge_tpu.tools.extract_lora import extract_lora
    from shardmerge_tpu.tools.fuse_lora import fuse_lora

    from .conftest import make_tiny_model

    base = tmp_path / "base"
    base_t = make_tiny_model(base, seed=40)
    ft = tmp_path / "ft"
    ft_t = make_tiny_model(ft, seed=41)

    adapter = tmp_path / "adapter"
    summary = extract_lora(base, ft, adapter, rank=16)
    # 7 projections x 2 layers targeted by default; full capture at r=16
    assert summary["tensors"] == 14
    assert summary["capture_min"] > 0.999999

    cfg = json.loads((adapter / "adapter_config.json").read_text())
    assert cfg["r"] == cfg["lora_alpha"] == 16  # scale alpha/r == 1

    fused = tmp_path / "fused"
    fuse_lora(base, adapter, fused)
    index = json.loads((fused / "model.safetensors.index.json").read_text())
    for shard in sorted(set(index["weight_map"].values())):
        with SafeTensorsReader(fused / shard) as reader:
            for key in reader.keys():
                got = np.asarray(reader.get_tensor(key))
                if any(
                    key.endswith(f"{suf}.weight")
                    for suf in (
                        "q_proj", "k_proj", "v_proj", "o_proj",
                        "gate_proj", "up_proj", "down_proj",
                    )
                ):
                    np.testing.assert_allclose(
                        got, ft_t[key], rtol=1e-4, atol=1e-5, err_msg=key
                    )
                else:  # embed/norm/lm_head: untargeted, stay base
                    np.testing.assert_array_equal(got, base_t[key])


def test_extract_lora_truncated_matches_torch_svd(tmp_path):
    """Truncated extraction is the Eckart-Young optimum: fusing the rank-2
    adapter equals base + the torch-computed rank-2 SVD reconstruction
    (cross-library oracle), and the capture ratios report the discarded
    energy honestly."""
    import numpy as np
    import torch

    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader
    from shardmerge_tpu.tools.extract_lora import extract_lora
    from shardmerge_tpu.tools.fuse_lora import fuse_lora

    from .conftest import make_tiny_model

    base = tmp_path / "base"
    base_t = make_tiny_model(base, seed=42)
    ft = tmp_path / "ft"
    ft_t = make_tiny_model(ft, seed=43)

    adapter = tmp_path / "adapter"
    summary = extract_lora(
        base, ft, adapter, rank=2, target_modules=("q_proj", "down_proj")
    )
    assert summary["tensors"] == 4
    assert summary["capture_min"] < 0.999  # random deltas are full-rank

    fused = tmp_path / "fused"
    fuse_lora(base, adapter, fused)
    index = json.loads((fused / "model.safetensors.index.json").read_text())
    for key in (
        "model.layers.0.self_attn.q_proj.weight",
        "model.layers.1.mlp.down_proj.weight",
    ):
        delta = torch.from_numpy(ft_t[key] - base_t[key]).to(torch.float32)
        u, s, vh = torch.linalg.svd(delta, full_matrices=False)
        want = base_t[key] + (
            u[:, :2] @ torch.diag(s[:2]) @ vh[:2]
        ).numpy()
        cap = float((s[:2] ** 2).sum() / (s**2).sum())
        np.testing.assert_allclose(summary["capture"][key], cap, rtol=1e-5)
        with SafeTensorsReader(fused / index["weight_map"][key]) as reader:
            np.testing.assert_allclose(
                np.asarray(reader.get_tensor(key)), want,
                rtol=1e-4, atol=1e-5,
            )


def test_extract_lora_suffix_matching_is_component_anchored():
    """'v_proj' must not capture Phi-3's fused 'qkv_proj', nor 'up_proj'
    its 'gate_up_proj' — suffix matches anchor on a module-path component
    boundary."""
    from shardmerge_tpu.constants import LORA_TARGET_PROJECTIONS
    from shardmerge_tpu.tools.extract_lora import _matches_target

    t = LORA_TARGET_PROJECTIONS
    assert _matches_target("model.layers.0.self_attn.q_proj", t)
    assert _matches_target("model.layers.3.mlp.down_proj", t)
    assert not _matches_target("model.layers.0.self_attn.qkv_proj", t)
    assert not _matches_target("model.layers.0.mlp.gate_up_proj", t)
    # explicit fused targets still opt in
    assert _matches_target(
        "model.layers.0.self_attn.qkv_proj", ("qkv_proj",)
    )


def test_extract_lora_validation_and_cli(tmp_path):
    import numpy as np  # noqa: F401

    import pytest

    from shardmerge_tpu.tools.extract_lora import (
        LoraExtractError,
        extract_lora,
    )

    from .conftest import make_tiny_model

    base = tmp_path / "base"
    make_tiny_model(base, seed=44)
    ft = tmp_path / "ft"
    make_tiny_model(ft, seed=45)

    with pytest.raises(LoraExtractError, match="matched"):
        extract_lora(base, ft, tmp_path / "x", target_modules=("nope",))
    with pytest.raises(LoraExtractError, match="rank"):
        extract_lora(base, ft, tmp_path / "x", rank=0)

    from click.testing import CliRunner

    from shardmerge_tpu.cli import cli as cli_root

    result = CliRunner().invoke(
        cli_root,
        [
            "extract-lora", str(base), str(ft), str(tmp_path / "ad"),
            "--rank", "4", "--target", "q_proj",
        ],
    )
    assert result.exit_code == 0, result.output
    assert "rank-4 adapter: 2 tensor pairs" in result.output
    assert (tmp_path / "ad" / "adapter_model.safetensors").is_file()


def test_quantize_checkpoint_gptq_v2_roundtrip(tmp_path, tiny_model_factory):
    """The GPTQ-v2 artifact decodes (via the repo's OWN GPTQ load math)
    to exactly the serving quantization of the source weights, up to fp16
    scale rounding; excluded tensors pass through bit-identical."""
    import numpy as np

    from shardmerge_tpu.io.safetensors_io import load_file
    from shardmerge_tpu.models.quant import dequant, dequant_gptq, quantize
    from shardmerge_tpu.tools.quantize_checkpoint import quantize_checkpoint

    src_path, tensors = tiny_model_factory("qsrc", seed=31)
    for bits in (4, 8):
        dst = tmp_path / f"qdst{bits}"
        report = quantize_checkpoint(src_path, dst, bits=bits)
        assert report["tensors_quantized"] == 14  # 7 projections x 2 layers
        assert report["compression"] > (1.5 if bits == 8 else 2.0)
        assert report["worst_roundtrip_relL2_vs_serving_quant"] < 2e-3

        index = json.loads(
            (dst / "model.safetensors.index.json").read_text()
        )
        arrays = {}
        for shard in set(index["weight_map"].values()):
            arrays.update(load_file(str(dst / shard)))
        name = "model.layers.0.mlp.down_proj.weight"
        root = name[: -len(".weight")]
        back = dequant_gptq(
            arrays[root + ".qweight"],
            arrays[root + ".qzeros"],
            arrays[root + ".scales"],
            arrays[root + ".g_idx"],
            bits,
            v1_zero_offset=False,  # gptq_v2: true zeros
        )
        ours = np.asarray(
            dequant(quantize(np.array(tensors[name]), bits), np.float32)
        )
        np.testing.assert_allclose(back, ours, rtol=2e-3, atol=2e-4)
        # excluded tensors are byte-identical
        np.testing.assert_array_equal(
            arrays["model.embed_tokens.weight"],
            tensors["model.embed_tokens.weight"],
        )
        np.testing.assert_array_equal(
            arrays["model.norm.weight"], tensors["model.norm.weight"]
        )
        qc = json.loads((dst / "config.json").read_text())[
            "quantization_config"
        ]
        assert qc["quant_method"] == "gptq"
        assert qc["checkpoint_format"] == "gptq_v2"
        assert qc["bits"] == bits


def test_cli_merge_output_quant_artifact(tmp_path, tiny_model_factory):
    """merge --output-quant int4 writes a sibling GPTQ-v2 artifact that
    REGISTERS AS A MERGE INPUT again (the full loop: merge -> quantized
    artifact -> downstream merge/load)."""
    import asyncio

    import numpy as np

    from shardmerge_tpu.cli import cli
    from shardmerge_tpu.io.index import OfflineMultiModelIndex
    from shardmerge_tpu.models.quant import dequant, quantize

    base_path, _ = tiny_model_factory("base", seed=33)
    ft_path, _ = tiny_model_factory("ft", seed=34)
    config = {
        "output_base_model": str(base_path),
        "finetune_merge": [{"model": str(ft_path), "base": str(base_path)}],
        "output_dir": str(tmp_path / "merged"),
        "cache_dir": str(tmp_path / "cache"),
        "storage_dir": str(tmp_path / "storage"),
    }
    import yaml

    config_path = tmp_path / "config.yaml"
    config_path.write_text(yaml.safe_dump(config))

    runner = CliRunner()
    result = runner.invoke(
        cli, ["merge", str(config_path), "--output-quant", "int4"]
    )
    assert result.exit_code == 0, result.output
    art = tmp_path / "merged-int4"
    assert (art / "model.safetensors.index.json").exists()
    assert "quantized artifact" in result.output

    # the artifact registers as a model (virtual .weight keys) and its
    # decoded tensors equal load-time quantization of the bf16 output
    async def check():
        index = OfflineMultiModelIndex()
        index.add_model(art)
        name = "model.layers.1.self_attn.q_proj.weight"
        keys = index.get_model_keys(str(art))
        assert name in keys  # virtualized from qweight parts
        got = await index.get_tensor(str(art), name).get()

        bf16_index = OfflineMultiModelIndex()
        bf16_index.add_model(tmp_path / "merged")
        bf16_w = await bf16_index.get_tensor(str(tmp_path / "merged"), name).get()
        want = np.asarray(
            dequant(quantize(np.array(bf16_w), 4), np.float32)
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), want, rtol=2e-2, atol=2e-3
        )

    asyncio.run(check())


def test_generate_serves_quantized_artifact(tmp_path):
    """The quantized artifact SERVES: generate on the GPTQ-v2 dir matches
    greedy generation on the bf16 checkpoint quantized at load (the two
    sides hold the same int grid; only fp16 scale rounding differs)."""
    import torch
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
    from transformers import LlamaConfig, LlamaForCausalLM

    from shardmerge_tpu.inference import InferenceEngine
    from shardmerge_tpu.tools.quantize_checkpoint import quantize_checkpoint

    torch.manual_seed(23)
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=512,
    )
    model_dir = tmp_path / "m"
    LlamaForCausalLM(config).eval().save_pretrained(
        str(model_dir), safe_serialization=True
    )
    vocab = {f"tok{i}": i for i in range(120)}
    vocab.update({"<unk>": 120, "hello": 121, "there": 122})
    tok = Tokenizer(tok_models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(model_dir / "tokenizer.json"))
    (model_dir / "tokenizer_config.json").write_text(
        json.dumps(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "unk_token": "<unk>",
                "eos_token": "tok0",
            }
        )
    )

    art = tmp_path / "m-int4"
    quantize_checkpoint(model_dir, art, bits=4)
    assert (art / "tokenizer.json").exists()  # tokenizer rides along

    def gen(path, **kw):
        eng = InferenceEngine.from_pretrained(str(path), **kw)
        return "".join(
            eng.stream_generation(
                "hello there tok3",
                max_new_tokens=6,
                greedy=True,
                use_template=False,
            )
        )

    assert gen(art) == gen(model_dir, load_in_4bit=True)
