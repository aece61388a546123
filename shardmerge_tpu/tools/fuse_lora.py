"""Fuse a PEFT LoRA adapter into a base checkpoint: W' = W + s·(B @ A).

Beyond-reference capability (the reference merges full finetunes only —
shard/merge/*). LoRA finetunes ship as low-rank adapter pairs in PEFT
layout (``adapter_model.safetensors`` with ``...<module>.lora_A.weight``
(r, in) / ``...<module>.lora_B.weight`` (out, r) keys plus
``adapter_config.json``); fusing them produces an ordinary full
checkpoint that the merge engines, the inference stack, and plain HF
tooling all consume. The default scale follows PEFT:
``lora_alpha / r`` (``lora_alpha / sqrt(r)`` with ``use_rslora``).

TPU-first: each fused tensor is one jitted fp32 rank-r update —
W.f32 + s·(B @ A) — cast back to the base dtype (bit-exact for
untargeted tensors, which stream through untouched). Output keeps the
base checkpoint's shard layout and index so downstream resume/verify
tooling sees the same file structure.
"""

from __future__ import annotations

import json
import shutil
from functools import partial
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..io.safetensors_io import SafeTensorsReader, save_file

__all__ = ["fuse_lora", "load_adapter"]

_ADAPTER_WEIGHTS = ("adapter_model.safetensors",)
_ADAPTER_CONFIG = "adapter_config.json"
_AUX_FILES = [
    "config.json",
    "generation_config.json",
    "tokenizer.json",
    "tokenizer_config.json",
    "special_tokens_map.json",
    "tokenizer.model",
]


class LoraFormatError(ValueError):
    pass


def _base_key(adapter_key: str) -> Optional[tuple]:
    """Map an adapter tensor key to (base tensor key, 'A'|'B').

    PEFT prefixes module paths with ``base_model.model.`` and suffixes
    the pair as ``.lora_A.weight`` / ``.lora_B.weight`` (an optional
    ``.default`` adapter name may sit in between)."""
    key = adapter_key
    for prefix in ("base_model.model.", "base_model."):
        if key.startswith(prefix):
            key = key[len(prefix) :]
            break
    for side in ("A", "B"):
        for infix in (f".lora_{side}.weight", f".lora_{side}.default.weight"):
            if key.endswith(infix):
                return key[: -len(infix)] + ".weight", side
    return None


def load_adapter(adapter_dir: Path):
    """Read a PEFT adapter directory → (pairs, scale).

    pairs: base-tensor-key → {"A": (r, in) np.ndarray, "B": (out, r)}.
    Unrecognized adapter tensors are an error — silently dropping part
    of a finetune would corrupt the fusion."""
    adapter_dir = Path(adapter_dir)
    cfg_path = adapter_dir / _ADAPTER_CONFIG
    if not cfg_path.is_file():
        raise LoraFormatError(f"no {_ADAPTER_CONFIG} in {adapter_dir}")
    cfg = json.loads(cfg_path.read_text())
    r = int(cfg.get("r", 0))
    alpha = float(cfg.get("lora_alpha", r))
    if r <= 0:
        raise LoraFormatError(f"adapter rank r={r} is not positive")
    scale = alpha / (np.sqrt(r) if cfg.get("use_rslora") else r)

    weights = None
    for name in _ADAPTER_WEIGHTS:
        if (adapter_dir / name).is_file():
            weights = adapter_dir / name
            break
    if weights is None:
        raise LoraFormatError(
            f"no adapter weights ({'/'.join(_ADAPTER_WEIGHTS)}) in "
            f"{adapter_dir}"
        )

    pairs: Dict[str, dict] = {}
    with SafeTensorsReader(weights) as reader:
        for key in reader.keys():
            mapped = _base_key(key)
            if mapped is None:
                raise LoraFormatError(
                    f"unrecognized adapter tensor {key!r} (only "
                    "lora_A/lora_B pairs fuse; bias/modules_to_save "
                    "adapters are not supported)"
                )
            base, side = mapped
            pairs.setdefault(base, {})[side] = np.asarray(
                reader.get_tensor(key)
            )
    for base, ab in pairs.items():
        if set(ab) != {"A", "B"}:
            raise LoraFormatError(f"incomplete lora pair for {base!r}")
        if ab["A"].shape[0] != r or ab["B"].shape[1] != r:
            raise LoraFormatError(
                f"{base!r}: lora shapes {ab['A'].shape}/{ab['B'].shape} "
                f"do not match rank {r}"
            )
    return pairs, float(scale)


def _fused(w: np.ndarray, a: np.ndarray, b: np.ndarray, scale: float):
    """One rank-r update on device, fp32 accumulate, cast back."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=())
    def apply(wj, aj, bj, s):
        delta = bj.astype(jnp.float32) @ aj.astype(jnp.float32)
        return (wj.astype(jnp.float32) + s * delta).astype(wj.dtype)

    return np.asarray(apply(w, a, b, jnp.float32(scale)))


def fuse_lora(
    base_dir: Path,
    adapter_dir: Path,
    output_dir: Path,
    scale: Optional[float] = None,
) -> dict:
    """Write ``output_dir`` = base checkpoint with the adapter fused in.

    Keeps the base's shard layout and index; untargeted tensors stream
    through byte-identical. Returns a summary dict (tensors fused,
    scale, rank pairs)."""
    base_dir, output_dir = Path(base_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    pairs, cfg_scale = load_adapter(adapter_dir)
    s = cfg_scale if scale is None else float(scale)

    index_path = base_dir / "model.safetensors.index.json"
    if index_path.is_file():
        weight_map = json.loads(index_path.read_text())["weight_map"]
        shards = sorted(set(weight_map.values()))
    else:
        shards = [p.name for p in sorted(base_dir.glob("*.safetensors"))]
        if not shards:
            raise FileNotFoundError(f"no safetensors in {base_dir}")

    seen = set()
    fused_count = 0
    for shard in shards:
        out_tensors = {}
        with SafeTensorsReader(base_dir / shard) as reader:
            for key in reader.keys():
                w = reader.get_tensor(key)
                if key in pairs:
                    ab = pairs[key]
                    if (
                        w.shape[0] != ab["B"].shape[0]
                        or w.shape[-1] != ab["A"].shape[1]
                    ):
                        raise LoraFormatError(
                            f"{key!r}: base {w.shape} does not take a "
                            f"{ab['B'].shape} x {ab['A'].shape} update"
                        )
                    w = _fused(np.asarray(w), ab["A"], ab["B"], s)
                    seen.add(key)
                    fused_count += 1
                out_tensors[key] = np.asarray(w)
        save_file(out_tensors, output_dir / shard, metadata={"format": "pt"})

    missing = set(pairs) - seen
    if missing:
        raise LoraFormatError(
            f"adapter targets absent from the base checkpoint: "
            f"{sorted(missing)[:4]}{'...' if len(missing) > 4 else ''}"
        )

    if index_path.is_file():
        shutil.copyfile(
            index_path, output_dir / "model.safetensors.index.json"
        )
    for aux in _AUX_FILES:
        src = base_dir / aux
        if src.is_file():
            shutil.copyfile(src, output_dir / aux)

    return {
        "fused_tensors": fused_count,
        "scale": s,
        "shards": len(shards),
    }
