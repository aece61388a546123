"""Convert PyTorch ``.bin`` checkpoints to sharded safetensors.

Parity surface: reference scripts/convert_pytorch_to_hf.py — sharded
``pytorch_model-*.bin`` -> safetensors preserving the index (:11-109), and a
single ``pytorch_model.bin`` -> N sorted, size-balanced safetensors shards
(:173-320) using the same canonical transformer ordering as rewrite_reorder.

torch is imported lazily: it is only needed to unpickle ``.bin`` files (the
rest of the framework is torch-free).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..io.safetensors_io import save_file
from .rewrite_reorder import transformer_sort_key

__all__ = ["convert", "torch_state_dict_to_numpy"]


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Convert torch tensors to numpy, preserving bf16 via ml_dtypes."""
    import ml_dtypes
    import torch

    out = {}
    for name, tensor in state_dict.items():
        tensor = tensor.detach().contiguous().cpu()
        if tensor.dtype == torch.bfloat16:
            arr = tensor.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
        else:
            arr = tensor.numpy()
        out[name] = arr
    return out


def _convert_sharded(input_dir: Path, output_dir: Path):
    """pytorch_model-XXXXX-of-YYYYY.bin shards -> same-named safetensors,
    preserving the existing index layout (reference :11-109)."""
    import torch

    index_path = input_dir / "pytorch_model.bin.index.json"
    with open(index_path) as f:
        index = json.load(f)

    bin_to_st = {}
    new_weight_map = {}
    for tensor_name, bin_file in index["weight_map"].items():
        st_file = bin_file.replace("pytorch_model", "model").replace(
            ".bin", ".safetensors"
        )
        bin_to_st[bin_file] = st_file
        new_weight_map[tensor_name] = st_file

    for bin_file, st_file in sorted(bin_to_st.items()):
        print(f"Converting {bin_file} -> {st_file}")
        state_dict = torch.load(
            input_dir / bin_file, map_location="cpu", weights_only=True
        )
        save_file(
            torch_state_dict_to_numpy(state_dict),
            output_dir / st_file,
            metadata={"format": "pt"},
        )

    new_index = {
        "metadata": index.get("metadata", {}),
        "weight_map": new_weight_map,
    }
    with open(output_dir / "model.safetensors.index.json", "w") as f:
        json.dump(new_index, f, indent=2)
    print(f"Converted {len(bin_to_st)} shards")


def _convert_single(bin_path: Path, output_dir: Path, num_shards: int):
    """Single pytorch_model.bin -> N sorted safetensors shards (reference
    :173-320): canonical transformer ordering + greedy size balancing."""
    import torch

    state_dict = torch.load(bin_path, map_location="cpu", weights_only=True)
    tensors = torch_state_dict_to_numpy(state_dict)
    del state_dict

    sorted_names = sorted(tensors.keys(), key=transformer_sort_key)
    sizes = {name: tensors[name].nbytes for name in sorted_names}
    total_size = sum(sizes.values())
    target = total_size / num_shards

    assignments = [[] for _ in range(num_shards)]
    shard_sizes = [0] * num_shards
    current = 0
    for name in sorted_names:
        if (
            shard_sizes[current] > 0
            and shard_sizes[current] + sizes[name] > target
            and current < num_shards - 1
        ):
            current += 1
        assignments[current].append(name)
        shard_sizes[current] += sizes[name]

    non_empty = [a for a in assignments if a]
    actual = len(non_empty)
    weight_map = {}
    for i, names in enumerate(non_empty):
        filename = f"model-{i + 1:05d}-of-{actual:05d}.safetensors"
        save_file(
            {name: tensors[name] for name in names},
            output_dir / filename,
            metadata={"format": "pt"},
        )
        for name in names:
            weight_map[name] = filename
        print(f"  Saved {filename} ({len(names)} tensors)")

    index = {
        "metadata": {"total_size": total_size},
        "weight_map": {name: weight_map[name] for name in sorted_names},
    }
    with open(output_dir / "model.safetensors.index.json", "w") as f:
        json.dump(index, f, indent=2)
    print(f"Converted {bin_path.name} into {actual} shards")


def convert(input_path: Path, output_dir: Path, num_shards: Optional[int] = None):
    """Convert a .bin checkpoint (file or directory) to safetensors shards."""
    input_path = Path(input_path)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    if input_path.is_dir():
        if (input_path / "pytorch_model.bin.index.json").exists():
            _convert_sharded(input_path, output_dir)
            return
        single = input_path / "pytorch_model.bin"
        if single.exists():
            _convert_single(single, output_dir, num_shards or 1)
            return
        raise FileNotFoundError(
            f"No pytorch_model.bin or pytorch_model.bin.index.json in {input_path}"
        )
    _convert_single(input_path, output_dir, num_shards or 1)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(
        description="Convert PyTorch .bin checkpoints to sharded safetensors"
    )
    parser.add_argument("input_path", type=str)
    parser.add_argument("output_dir", type=str)
    parser.add_argument("--num-shards", type=int, default=None)
    args = parser.parse_args()
    convert(Path(args.input_path), Path(args.output_dir), args.num_shards)
