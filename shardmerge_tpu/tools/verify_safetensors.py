"""Verify / repair index <-> shard alignment for a safetensors model dir.

Parity surface: reference scripts/verify_safetensors.py — verify_alignment
(:39-87) reports missing/extra files and per-file key diffs; repair_index
(:89-112) rebuilds weight_map from actual files with a timestamped backup.
"""

from __future__ import annotations

import json
import shutil
from collections import defaultdict
from datetime import datetime
from pathlib import Path
from typing import Dict, Optional, Set

from ..io.safetensors_io import SafeTensorsReader

__all__ = ["load_index", "get_actual_keys", "verify_alignment", "repair_index", "main"]


def load_index(index_path: Path):
    with open(index_path) as f:
        index = json.load(f)
    return index["weight_map"], index


def get_actual_keys(safetensors_dir: Path) -> Dict[str, Set[str]]:
    file_keys = {}
    for file in sorted(Path(safetensors_dir).glob("*.safetensors")):
        with SafeTensorsReader(file) as reader:
            file_keys[file.name] = set(reader.keys())
    return file_keys


def verify_alignment(weight_map: Dict[str, str], file_keys: Dict[str, Set[str]]) -> bool:
    """Print a report; returns True when there ARE issues (reference :39-87)."""
    expected_file_keys = defaultdict(set)
    for key, file in weight_map.items():
        expected_file_keys[file].add(key)

    missing_files = set(expected_file_keys) - set(file_keys)
    if missing_files:
        print("Missing safetensors files:")
        for file in sorted(missing_files):
            print(f"  {file}")
        print()

    extra_files = set(file_keys) - set(expected_file_keys)
    if extra_files:
        print("Extra safetensors files not in index:")
        for file in sorted(extra_files):
            print(f"  {file}")
        print()

    has_mismatches = False
    for file in sorted(set(expected_file_keys) & set(file_keys)):
        expected = expected_file_keys[file]
        actual = file_keys[file]
        missing_keys = expected - actual
        extra_keys = actual - expected
        if missing_keys or extra_keys:
            has_mismatches = True
            print(f"Mismatches in {file}:")
            if missing_keys:
                print("  Missing keys (in index but not in file):")
                for key in sorted(missing_keys):
                    print(f"    {key}")
            if extra_keys:
                print("  Extra keys (in file but not in index):")
                for key in sorted(extra_keys):
                    print(f"    {key}")
            print()

    if not has_mismatches and not missing_files and not extra_files:
        print("All safetensors files align perfectly with the index!")

    return bool(has_mismatches or missing_files or extra_files)


def repair_index(
    file_keys: Dict[str, Set[str]], original_index: dict, output_path: Path
):
    """Rebuild weight_map from the actual files, backing up the old index."""
    new_weight_map = {}
    for file, keys in file_keys.items():
        for key in keys:
            new_weight_map[key] = file

    new_index = {
        "metadata": original_index.get("metadata", {}),
        "weight_map": new_weight_map,
    }

    output_path = Path(output_path)
    if output_path.exists():
        backup_path = Path(
            f"{output_path}.bak.{datetime.now().strftime('%Y%m%d_%H%M%S')}"
        )
        shutil.copy2(output_path, backup_path)
        print(f"Backed up original index to: {backup_path}")

    with open(output_path, "w") as f:
        json.dump(new_index, f, indent=2)
    print(f"Wrote repaired index to: {output_path}")


def main(
    model_dir: Path, index_path: Optional[Path] = None, repair: bool = False
) -> bool:
    """Returns True when the model verifies clean (possibly after repair)."""
    model_dir = Path(model_dir)
    if index_path is None:
        index_path = model_dir / "model.safetensors.index.json"
    weight_map, original_index = load_index(index_path)
    file_keys = get_actual_keys(model_dir)
    has_issues = verify_alignment(weight_map, file_keys)
    if repair:
        if has_issues:
            repair_index(file_keys, original_index, index_path)
            return True
        print("No repair needed - index is already correct!")
    return not has_issues


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(
        description="Verify and repair safetensors files against index"
    )
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--index_path", type=str, required=True)
    parser.add_argument("--repair", action="store_true")
    args = parser.parse_args()
    main(Path(args.model_dir), Path(args.index_path), args.repair)
