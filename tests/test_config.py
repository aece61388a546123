import numpy as np
import pytest

from shardmerge_tpu.config import ConfigError, MergeConfig, MergeModel, resolve_dtype
from shardmerge_tpu.constants import INPUT_LAYER, OUTPUT_LAYER


def test_constants():
    # Parity: reference shard/constants.py:4-5
    assert INPUT_LAYER == -1
    assert OUTPUT_LAYER == -2


def test_use_layer_index():
    # Parity: reference shard/config.py:35-40
    m = MergeModel(model="m", base="b", start_layer=2, end_layer=5)
    assert not m.use_layer_index(1)
    assert m.use_layer_index(2)
    assert m.use_layer_index(5)
    assert not m.use_layer_index(6)
    default = MergeModel(model="m", base="b")
    assert default.use_layer_index(0)
    assert default.use_layer_index(10**6)
    # sentinel input/output layers excluded by default start_layer=0
    assert not default.use_layer_index(INPUT_LAYER)
    assert not default.use_layer_index(OUTPUT_LAYER)


def test_from_yaml_roundtrip(tmp_path):
    yaml_text = """
output_base_model: "org/base"
finetune_merge:
  - model: "org/ft1"
    base: "org/base"
    alpha: 0.8
  - model: "org/ft2"
    base: "org/base"
    alpha: 0.5
    is_input: true
    start_layer: 2
    end_layer: 10
output_dir: "out"
output_dtype: "bfloat16"
clean_cache: true
"""
    path = tmp_path / "config.yaml"
    path.write_text(yaml_text)
    cfg = MergeConfig.from_yaml(path)
    assert cfg.output_base_model == "org/base"
    assert len(cfg.finetune_merge) == 2
    assert cfg.finetune_merge[0].alpha == 0.8
    assert cfg.input_model is cfg.finetune_merge[1]
    assert cfg.output_model is None
    assert cfg.clean_cache is True
    assert cfg.output_astype.itemsize == 2
    assert str(cfg.output_path) == "out"


def test_from_yaml_missing_fields(tmp_path):
    path = tmp_path / "bad.yaml"
    path.write_text("output_dir: out\n")
    with pytest.raises(ConfigError, match="Missing required"):
        MergeConfig.from_yaml(path)


def test_from_yaml_bad_finetune_type(tmp_path):
    path = tmp_path / "bad.yaml"
    path.write_text(
        "output_base_model: b\nfinetune_merge: notalist\noutput_dir: out\n"
    )
    with pytest.raises(ConfigError, match="must be a list"):
        MergeConfig.from_yaml(path)


def test_update_ignores_unknown():
    cfg = MergeConfig(
        finetune_merge=[], output_base_model="b", output_dir="out"
    )
    cfg.update({"device": "cpu", "bogus": 1}, clean_cache=True)
    assert cfg.device == "cpu"
    assert cfg.clean_cache is True
    assert not hasattr(cfg, "bogus")


def test_resolve_dtype():
    assert resolve_dtype("float32") == np.dtype(np.float32)
    assert resolve_dtype("bf16").itemsize == 2
    with pytest.raises(ConfigError):
        resolve_dtype("int7")


def test_to_dict_flattens_models():
    # Parity: reference shard/config.py:92-101
    cfg = MergeConfig(
        finetune_merge=[MergeModel(model="m1", base="b"), MergeModel(model="m2", base="b")],
        output_base_model="b",
        output_dir="out",
    )
    d = cfg.to_dict()
    assert d["finetune_merge"] == ["m1", "m2"]
    assert "output_dtype" not in d


def test_exact_imag_config_flag(tmp_path):
    """exact_imag rides the YAML config into the engine (bit-parity mode)."""
    import yaml

    from shardmerge_tpu.config import MergeConfig

    cfg_dict = {
        "output_base_model": "b",
        "finetune_merge": [{"model": "m", "base": "b"}],
        "output_dir": str(tmp_path / "out"),
        "exact_imag": True,
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg_dict))
    cfg = MergeConfig.from_yaml(p)
    assert cfg.exact_imag is True

    from shardmerge_tpu.merge import FourierMerge
    from shardmerge_tpu.io.index import OfflineMultiModelIndex

    merger = FourierMerge(
        cfg, index_manager=OfflineMultiModelIndex(), exact_imag=cfg.exact_imag
    )
    assert merger.exact_imag is True
