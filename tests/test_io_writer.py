"""ModelWriter tests: index mirroring, buffered/write-through writes, resume,
finalize, and error cleanup (mirrors reference tests/test_writer.py coverage)."""

import json

import ml_dtypes
import numpy as np
import pytest

from shardmerge_tpu.constants import INPUT_LAYER, OUTPUT_LAYER
from shardmerge_tpu.io.safetensors_io import SafeTensorsReader
from shardmerge_tpu.io.writer import ModelWriter, ShardLayer

from .conftest import TINY_SHAPES, TINY_SHARD_MAP


def _base_index():
    return {
        "metadata": {"total_size": 123},
        "weight_map": dict(TINY_SHARD_MAP),
    }


def _layer_order():
    from shardmerge_tpu.io.index import ordered_weights

    return ordered_weights(TINY_SHARD_MAP)


def _writer(tmp_path, **kw):
    kw.setdefault("output_astype", np.dtype(ml_dtypes.bfloat16))
    return ModelWriter(
        base_index=_base_index(),
        output_path=tmp_path / "out",
        layer_order=_layer_order(),
        **kw,
    )


def test_shard_layer_numbers():
    # Parity: reference writer.py:39-57
    assert ShardLayer(0, "s", "model.embed_tokens.weight", False).layer_number == INPUT_LAYER
    assert ShardLayer(0, "s", "model.norm.weight", False).layer_number == OUTPUT_LAYER
    assert ShardLayer(0, "s", "lm_head.weight", False).layer_number == OUTPUT_LAYER
    assert ShardLayer(0, "s", "model.layers.7.mlp.up_proj.weight", False).layer_number == 7
    with pytest.raises(ValueError):
        _ = ShardLayer(0, "s", "transformer.h.0.attn", False).layer_number


def test_index_copied_and_maps_built(tmp_path):
    writer = _writer(tmp_path)
    index_path = tmp_path / "out" / "model.safetensors.index.json"
    assert index_path.exists()
    assert json.load(open(index_path))["weight_map"] == TINY_SHARD_MAP
    assert set(writer.shard_to_tensors) == set(TINY_SHARD_MAP.values())


def test_buffered_write_one_file_per_shard(tmp_path, rng):
    writer = _writer(tmp_path)
    shard = "model-00001-of-00003.safetensors"
    names = sorted(n for n, s in TINY_SHARD_MAP.items() if s == shard)
    for name in names[:-1]:
        writer.add_tensor(name, rng.standard_normal(TINY_SHAPES[name]).astype(np.float32))
        assert not (tmp_path / "out" / shard).exists()  # buffered, not written
    writer.add_tensor(
        names[-1], rng.standard_normal(TINY_SHAPES[names[-1]]).astype(np.float32)
    )
    assert (tmp_path / "out" / shard).exists()  # complete -> flushed once

    with SafeTensorsReader(tmp_path / "out" / shard) as reader:
        keys = list(reader.keys())
        assert set(keys) == set(names)
        # ordered by layer_order
        order = _layer_order()
        assert keys == [n for n in order if n in set(names)]
        # cast to bf16
        assert reader.get_dtype(names[0]) == np.dtype(ml_dtypes.bfloat16)


def test_write_through_mode_rewrites(tmp_path, rng):
    writer = _writer(tmp_path, write_through=True)
    shard = "model-00003-of-00003.safetensors"
    name = "model.embed_tokens.weight"
    writer.add_tensor(name, rng.standard_normal(TINY_SHAPES[name]).astype(np.float32))
    assert (tmp_path / "out" / shard).exists()  # written immediately


def test_full_model_write_and_finalize(tmp_path, rng):
    writer = _writer(tmp_path)
    with pytest.raises(RuntimeError, match="Incomplete"):
        writer.finalize()
    for name, shape in TINY_SHAPES.items():
        writer.add_tensor(name, rng.standard_normal(shape).astype(np.float32))
    writer.finalize()
    for shard in set(TINY_SHARD_MAP.values()):
        assert (tmp_path / "out" / shard).exists()


def test_resume_skips_written(tmp_path, rng):
    writer = _writer(tmp_path)
    values = {}
    for name, shape in TINY_SHAPES.items():
        values[name] = rng.standard_normal(shape).astype(np.float32)
        writer.add_tensor(name, values[name])
    writer.finalize()

    # a fresh writer over the same output marks everything written
    writer2 = _writer(tmp_path)
    assert writer2.written_shard_layers == {
        (s, n) for n, s in TINY_SHARD_MAP.items()
    }
    for layers in writer2.shard_layers():
        assert all(sl.written for sl in layers)
    # add_tensor on a written layer is a no-op (does not clobber)
    name = "model.norm.weight"
    writer2.add_tensor(name, np.zeros(TINY_SHAPES[name], np.float32))
    with SafeTensorsReader(tmp_path / "out" / TINY_SHARD_MAP[name]) as reader:
        got = reader.get_tensor(name).astype(np.float32)
    np.testing.assert_allclose(
        got, values[name].astype(ml_dtypes.bfloat16).astype(np.float32)
    )


def test_partial_resume_merges_disk_content(tmp_path, rng):
    # write one tensor of a shard in write_through mode (simulates a crash)
    writer = _writer(tmp_path, write_through=True)
    shard = "model-00002-of-00003.safetensors"
    names = sorted(n for n, s in TINY_SHARD_MAP.items() if s == shard)
    first = names[0]
    v_first = rng.standard_normal(TINY_SHAPES[first]).astype(np.float32)
    writer.add_tensor(first, v_first)

    # resume with a buffered writer: the remaining tensors complete the shard
    writer2 = _writer(tmp_path)
    assert (shard, first) in writer2.written_shard_layers
    for name in names[1:]:
        writer2.add_tensor(
            name, rng.standard_normal(TINY_SHAPES[name]).astype(np.float32)
        )
    with SafeTensorsReader(tmp_path / "out" / shard) as reader:
        assert set(reader.keys()) == set(names)
        got = reader.get_tensor(first).astype(np.float32)
    np.testing.assert_allclose(
        got, v_first.astype(ml_dtypes.bfloat16).astype(np.float32)
    )


def test_foreign_tensor_in_output_rejected(tmp_path, rng):
    writer = _writer(tmp_path)
    del writer
    # drop a shard containing an unexpected tensor into the output dir
    from shardmerge_tpu.io.safetensors_io import save_file

    save_file(
        {"alien.weight": np.zeros((2, 2), np.float32)},
        tmp_path / "out" / "model-00001-of-00003.safetensors",
    )
    with pytest.raises(ValueError, match="not in base model"):
        _writer(tmp_path)


def test_shard_layers_iteration_order(tmp_path):
    writer = _writer(tmp_path)
    groups = list(writer.shard_layers())
    assert [g[0].shard_name for g in groups] == sorted(set(TINY_SHARD_MAP.values()))
    order = _layer_order()
    for group in groups:
        idxs = [sl.layer_order_idx for sl in group]
        assert idxs == sorted(idxs)
        for sl in group:
            assert order[sl.layer_order_idx] == sl.layer_name


def test_like_model(tmp_path, tiny_model_factory):
    path, _ = tiny_model_factory("donor", seed=9)
    writer = ModelWriter.like_model(path, tmp_path / "out2")
    assert set(writer.layer_order) == set(TINY_SHARD_MAP)
    assert writer.output_astype == np.dtype(ml_dtypes.bfloat16)


def test_background_flush_identical(tmp_path, rng):
    values = {
        name: rng.standard_normal(shape).astype(np.float32)
        for name, shape in TINY_SHAPES.items()
    }
    outs = {}
    for tag, bg in [("sync", False), ("bg", True)]:
        writer = ModelWriter(
            base_index={"metadata": {}, "weight_map": dict(TINY_SHARD_MAP)},
            output_path=tmp_path / tag,
            layer_order=sorted(TINY_SHARD_MAP),
            output_astype=np.dtype(ml_dtypes.bfloat16),
            background_flush=bg,
        )
        for name, v in values.items():
            writer.add_tensor(name, v)
        writer.finalize()
        outs[tag] = {}
        for shard in set(TINY_SHARD_MAP.values()):
            with SafeTensorsReader(tmp_path / tag / shard) as r:
                for k in r.keys():
                    outs[tag][k] = r.get_tensor(k, copy=True)
    for k in outs["sync"]:
        np.testing.assert_array_equal(
            outs["sync"][k].view(np.uint16), outs["bg"][k].view(np.uint16)
        )


def test_read_only_writer_never_touches_disk(tmp_path):
    """Multi-host non-primary processes: read_only writers track staged
    completeness and derive resume state, but write no files."""
    import numpy as np

    from shardmerge_tpu.io.writer import ModelWriter

    base_index = {
        "metadata": {},
        "weight_map": {"a": "model-00001-of-00001.safetensors",
                       "b": "model-00001-of-00001.safetensors"},
    }
    out = tmp_path / "out"
    w = ModelWriter(
        base_index=base_index,
        output_path=out,
        layer_order=["a", "b"],
        output_astype=np.dtype(np.float32),
        read_only=True,
    )
    w.add_tensor("a", np.zeros((2, 2), np.float32))
    w.add_tensor("b", np.ones((2, 2), np.float32))
    w.finalize()  # completeness tracked
    assert not out.exists()  # no directory, no index, no shards

    # and it derives the skip-list from shards a primary writer wrote
    w2 = ModelWriter(
        base_index=base_index,
        output_path=out,
        layer_order=["a", "b"],
        output_astype=np.dtype(np.float32),
    )
    w2.add_tensor("a", np.zeros((2, 2), np.float32))
    w2.add_tensor("b", np.ones((2, 2), np.float32))
    w2.finalize()
    w3 = ModelWriter(
        base_index=base_index,
        output_path=out,
        layer_order=["a", "b"],
        output_astype=np.dtype(np.float32),
        read_only=True,
    )
    assert ("model-00001-of-00001.safetensors", "a") in w3.written_shard_layers
    assert ("model-00001-of-00001.safetensors", "b") in w3.written_shard_layers
