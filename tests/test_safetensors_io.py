"""safetensors format round-trip tests, including cross-compat with the
official safetensors library (torch backend) and bf16 via ml_dtypes."""

import ml_dtypes
import numpy as np
import pytest

from shardmerge_tpu.io import safetensors_io as stio


def _sample_tensors(rng):
    return {
        "a.weight": rng.standard_normal((8, 16)).astype(np.float32),
        "b.weight": rng.standard_normal((4,)).astype(np.float32),
        "c.bf16": rng.standard_normal((8, 8))
        .astype(np.float32)
        .astype(ml_dtypes.bfloat16),
        "d.i64": rng.integers(0, 100, size=(3, 3)).astype(np.int64),
        "e.f16": rng.standard_normal((5, 2)).astype(np.float16),
        "f.scalar0d": np.array(3.5, dtype=np.float32),
    }


def test_roundtrip_own_reader(tmp_path, rng):
    tensors = _sample_tensors(rng)
    path = tmp_path / "model.safetensors"
    stio.save_file(tensors, path, metadata={"format": "pt"})

    with stio.SafeTensorsReader(path) as reader:
        assert set(reader.keys()) == set(tensors.keys())
        assert reader.metadata == {"format": "pt"}
        for name, expect in tensors.items():
            got = reader.get_tensor(name)
            assert got.dtype == expect.dtype
            assert got.shape == expect.shape
            np.testing.assert_array_equal(
                got.reshape(-1).view(np.uint8), expect.reshape(-1).view(np.uint8)
            )


def test_load_file_owns_data(tmp_path, rng):
    tensors = _sample_tensors(rng)
    path = tmp_path / "model.safetensors"
    stio.save_file(tensors, path)
    loaded = stio.load_file(path)
    path.unlink()  # data must survive file removal
    for name, expect in tensors.items():
        np.testing.assert_array_equal(
            loaded[name].reshape(-1).view(np.uint8),
            expect.reshape(-1).view(np.uint8),
        )


def test_official_lib_reads_our_output(tmp_path, rng):
    import torch
    from safetensors import safe_open

    tensors = _sample_tensors(rng)
    path = tmp_path / "ours.safetensors"
    stio.save_file(tensors, path, metadata={"format": "pt"})

    with safe_open(str(path), framework="pt") as f:
        assert set(f.keys()) == set(tensors.keys())
        for name in tensors:
            got = f.get_tensor(name)
            expect = tensors[name]
            if expect.dtype == np.dtype(ml_dtypes.bfloat16):
                assert got.dtype == torch.bfloat16
                np.testing.assert_array_equal(
                    got.view(torch.uint16).numpy().reshape(-1),
                    expect.view(np.uint16).reshape(-1),
                )
            else:
                np.testing.assert_array_equal(
                    got.numpy().reshape(-1), np.asarray(expect).reshape(-1)
                )


def test_we_read_official_lib_output(tmp_path, rng):
    import torch
    from safetensors.torch import save_file as torch_save

    torch_tensors = {
        "x": torch.randn(6, 7),
        "y": torch.randn(3, 4).to(torch.bfloat16),
        "z": torch.arange(10, dtype=torch.int32),
    }
    path = tmp_path / "theirs.safetensors"
    torch_save(torch_tensors, str(path), metadata={"format": "pt"})

    with stio.SafeTensorsReader(path) as reader:
        np.testing.assert_array_equal(
            reader.get_tensor("x"), torch_tensors["x"].numpy()
        )
        got_y = reader.get_tensor("y")
        assert got_y.dtype == np.dtype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(
            got_y.view(np.uint16),
            torch_tensors["y"].view(torch.uint16).numpy(),
        )
        np.testing.assert_array_equal(
            reader.get_tensor("z"), torch_tensors["z"].numpy()
        )


def test_corrupt_header_rejected(tmp_path):
    path = tmp_path / "bad.safetensors"
    path.write_bytes(b"\x00" * 4)
    with pytest.raises(stio.SafeTensorsFormatError):
        stio.read_header(path)

    path.write_bytes((10**9).to_bytes(8, "little") + b"{}")
    with pytest.raises(stio.SafeTensorsFormatError):
        stio.read_header(path)

    path.write_bytes((4).to_bytes(8, "little") + b"nope")
    with pytest.raises(stio.SafeTensorsFormatError):
        stio.read_header(path)


def test_offsets_out_of_bounds_rejected(tmp_path):
    import json

    header = {
        "t": {"dtype": "F32", "shape": [4], "data_offsets": [0, 16]},
    }
    raw = json.dumps(header).encode()
    path = tmp_path / "trunc.safetensors"
    # claim 16 bytes of data but provide only 8
    path.write_bytes(len(raw).to_bytes(8, "little") + raw + b"\x00" * 8)
    with pytest.raises(stio.SafeTensorsFormatError):
        stio.SafeTensorsReader(path)
