"""Extract a PEFT LoRA adapter from a full finetune: delta → SVD → (A, B).

Beyond-reference capability, the inverse of :mod:`.fuse_lora` (the
reference handles full checkpoints only — shard/merge/*). Given a base
checkpoint and a finetune of it, each targeted 2-D weight's delta
``D = W_ft − W_base`` is factored into the best rank-r approximation by
truncated SVD (Eckart–Young optimal in Frobenius norm)::

    D ≈ U_r S_r V_rᵀ     B = U_r √S_r (out, r)    A = √S_r V_rᵀ (r, in)

and written in PEFT layout (``adapter_model.safetensors`` +
``adapter_config.json`` with ``lora_alpha = r``, so PEFT's ``alpha/r``
scale is exactly 1 and ``fuse-lora`` of the extracted adapter reproduces
``base + Σ_r`` bit-for-operation). The √S split balances the factor
magnitudes (either factor alone stays O(√‖D‖)).

Policy decisions, documented:

- Targets default to the standard attention/MLP projections
  (q/k/v/o/gate/up/down_proj); embeddings and lm_head are excluded — PEFT
  represents embedding adapters differently (lora_embedding_A/B), and
  vocab-sized SVDs dwarf the adapter they produce. ``target_modules``
  overrides with explicit suffixes.
- PEFT has ONE adapter rank: tensors whose min dimension is below ``r``
  get zero-padded factors (B columns / A rows beyond the true rank are
  zero, so B @ A is unchanged) rather than a per-tensor rank the format
  cannot express.
- The SVD runs on host LAPACK (numpy): deterministic, no device-memory
  spike on wide matrices, and this is one-shot tooling, not a serving
  path (same host-compute rationale as models/quant.py quantization).
- Per-tensor Frobenius capture ratios are returned in the summary —
  an extraction that silently discarded most of a delta would otherwise
  look identical to a faithful one.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from ..constants import LORA_TARGET_PROJECTIONS as DEFAULT_TARGETS
from ..io.safetensors_io import SafeTensorsReader, save_file

logger = logging.getLogger(__name__)

__all__ = ["extract_lora", "DEFAULT_TARGETS"]



class LoraExtractError(ValueError):
    pass


def _shard_files(model_dir: Path):
    model_dir = Path(model_dir)
    index_path = model_dir / "model.safetensors.index.json"
    if index_path.is_file():
        weight_map = json.loads(index_path.read_text())["weight_map"]
        return sorted(set(weight_map.values()))
    shards = [p.name for p in sorted(model_dir.glob("*.safetensors"))]
    if not shards:
        raise FileNotFoundError(f"no safetensors in {model_dir}")
    return shards


def _iter_tensors(model_dir: Path):
    """Yield (key, np.ndarray) over a checkpoint's shards (index order,
    single-file fallback), one tensor materialized at a time."""
    model_dir = Path(model_dir)
    for shard in _shard_files(model_dir):
        with SafeTensorsReader(model_dir / shard) as reader:
            for key in reader.keys():
                yield key, np.asarray(reader.get_tensor(key))


class _TensorSource:
    """Random-access tensor reads over a sharded checkpoint WITHOUT
    materializing it: one mmap reader per shard, one tensor copied at a
    time. A 70B finetune must never sit fully resident next to the SVD
    working set (this host degrades catastrophically under concurrent
    memory pressure — CLAUDE.md)."""

    def __init__(self, model_dir: Path):
        self.dir = Path(model_dir)
        self._readers: Dict[str, SafeTensorsReader] = {}
        self._key_to_shard: Dict[str, str] = {}
        for shard in _shard_files(self.dir):
            reader = SafeTensorsReader(self.dir / shard)
            self._readers[shard] = reader
            for key in reader.keys():
                self._key_to_shard[key] = shard

    def __contains__(self, key: str) -> bool:
        return key in self._key_to_shard

    def get(self, key: str) -> np.ndarray:
        return np.asarray(
            self._readers[self._key_to_shard[key]].get_tensor(key)
        )

    def close(self):
        for reader in self._readers.values():
            reader.close()


def _matches_target(module: str, suffixes) -> bool:
    """Component-anchored suffix match: 'v_proj' must not capture a fused
    'qkv_proj' (Phi-3) nor 'up_proj' a fused 'gate_up_proj'."""
    return any(
        module == s or module.endswith("." + s) for s in suffixes
    )


def _module_of(key: str) -> Optional[str]:
    """'model.layers.0.self_attn.q_proj.weight' -> its module path, or
    None for keys that are not module weights."""
    if not key.endswith(".weight"):
        return None
    return key[: -len(".weight")]


def _factor(delta: np.ndarray, r: int):
    """Best rank-r factors (B (out, r), A (r, in)) of a 2-D delta, plus the
    captured Frobenius energy fraction. Ranks past min(out, in) are
    zero-padded (see module docstring)."""
    d32 = delta.astype(np.float32)
    u, s, vt = np.linalg.svd(d32, full_matrices=False)
    k = min(r, s.size)
    root = np.sqrt(s[:k])
    b = (u[:, :k] * root[None, :]).astype(np.float32)
    a = (root[:, None] * vt[:k]).astype(np.float32)
    if k < r:  # pad to the adapter-wide rank; B@A unchanged
        b = np.concatenate(
            [b, np.zeros((b.shape[0], r - k), np.float32)], axis=1
        )
        a = np.concatenate(
            [a, np.zeros((r - k, a.shape[1]), np.float32)], axis=0
        )
    total = float(np.sum(s**2))
    captured = float(np.sum(s[:k] ** 2))
    return b, a, (captured / total if total > 0.0 else 1.0)


def extract_lora(
    base_dir: Path,
    finetuned_dir: Path,
    output_dir: Path,
    rank: int = 16,
    target_modules: Optional[Sequence[str]] = None,
) -> dict:
    """Write ``output_dir`` as a PEFT adapter approximating
    ``finetuned − base`` at the given rank. Returns a summary with the
    per-tensor Frobenius capture ratios."""
    base_dir, finetuned_dir = Path(base_dir), Path(finetuned_dir)
    output_dir = Path(output_dir)
    if rank <= 0:
        raise LoraExtractError(f"rank must be positive, got {rank}")
    suffixes = tuple(target_modules or DEFAULT_TARGETS)

    ft = _TensorSource(finetuned_dir)
    adapter: Dict[str, np.ndarray] = {}
    capture: Dict[str, float] = {}
    matched_suffixes = set()
    try:
        for key, w_base in _iter_tensors(base_dir):
            module = _module_of(key)
            if module is None or not _matches_target(module, suffixes):
                continue
            if key not in ft:
                raise LoraExtractError(
                    f"target {key!r} missing from the finetuned checkpoint"
                )
            w_ft = ft.get(key)
            if w_ft.shape != w_base.shape or w_base.ndim != 2:
                raise LoraExtractError(
                    f"{key!r}: shapes {w_base.shape} vs {w_ft.shape} are "
                    "not a matching 2-D pair"
                )
            b, a, ratio = _factor(
                w_ft.astype(np.float32) - w_base.astype(np.float32), rank
            )
            adapter[f"base_model.model.{module}.lora_A.weight"] = a
            adapter[f"base_model.model.{module}.lora_B.weight"] = b
            capture[key] = ratio
            matched_suffixes.add(module.rsplit(".", 1)[-1])
    finally:
        ft.close()

    if not adapter:
        raise LoraExtractError(
            f"no base tensors matched target modules {list(suffixes)}"
        )

    output_dir.mkdir(parents=True, exist_ok=True)
    save_file(adapter, output_dir / "adapter_model.safetensors")
    config = {
        "peft_type": "LORA",
        "r": int(rank),
        # alpha == r -> PEFT scale alpha/r == 1: B @ A IS the delta
        "lora_alpha": int(rank),
        "lora_dropout": 0.0,
        "target_modules": sorted(matched_suffixes),
        "base_model_name_or_path": str(base_dir),
        "bias": "none",
        "task_type": "CAUSAL_LM",
    }
    (output_dir / "adapter_config.json").write_text(
        json.dumps(config, indent=2)
    )

    worst = min(capture.values())
    logger.info(
        "extracted rank-%d adapter: %d tensor pairs, Frobenius capture "
        "min %.4f / mean %.4f",
        rank,
        len(capture),
        worst,
        sum(capture.values()) / len(capture),
    )
    return {
        "tensors": len(capture),
        "rank": int(rank),
        "capture": capture,
        "capture_min": worst,
    }
