"""Quantized OUTPUT artifacts: convert a checkpoint to GPTQ-v2 on disk.

Closes the quantized-pipeline loop: GPTQ/AWQ/MXFP4 checkpoints already
decode at load (models/loader.py, io/index.py) and serving quantizes in
RAM (--load-in-4bit/8bit), but a merge always wrote bf16. This tool
writes the quantized artifact itself — in the AutoGPTQ/gptqmodel
``gptq_v2`` serialization, the Hub-standard packed format — so a merged
model ships at 1/4 (int4) or 1/2 (int8) the bytes and loads ANYWHERE
GPTQ loads: this repo's own generate/serve/merge paths (the round-trip
is tested against them) and third-party stacks (vLLM, AutoGPTQ, HF
transformers with gptqmodel).

Quantization scheme: symmetric per-output-channel absmax — exactly the
repo's serving quantization (models/quant.quantize) — expressed in GPTQ
terms as one group spanning the whole reduction dim (``group_size: -1``)
with the true zero at 2^(bits-1) (``sym: true``, v2 checkpoint format:
no zero−1 offset). Scales serialize as fp16 (the GPTQ convention); the
resulting weight error vs the repo's fp32-scale serving quantization is
bounded by fp16 rounding of the scale (≤ 2^-11 relative), far below the
int4 quantization error itself.

Eligible tensors: 2-D ``*.weight`` projections whose reduction dim packs
evenly — attention/MLP/expert matrices. Embeddings, lm_head, norms,
routers, and biases pass through raw (the standard GPTQ module set;
quantizing routers measurably hurts MoE routing).

Reference anchor: the reference has no quantized OUTPUT path at all —
its only quantization is bitsandbytes at load (shard/inference.py:
90-115); this closes SURVEY §2's serving story end-to-end.
"""

from __future__ import annotations

import json
import logging
import shutil
from pathlib import Path
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["quantize_checkpoint", "is_quantizable"]

_SHARD_BYTES = 2 * 1024**3  # ~2 GiB safetensors shards, HF-style
_COPY_FILES = (
    "config.json",
    "generation_config.json",
    "tokenizer.json",
    "tokenizer_config.json",
    "tokenizer.model",
    "special_tokens_map.json",
    "vocab.json",
    "merges.txt",
)
# never quantized: precision-sensitive or non-linear modules
_EXCLUDE_SUBSTRINGS = (
    "embed_tokens",
    "lm_head",
    "norm",  # input/post/q/k norms, rmsnorm variants
    ".gate.",  # mixtral/qwen3 router
    "router",  # gpt-oss / llama4 routers
    "shared_expert_gate",
)


def is_quantizable(name: str, shape, bits: int) -> bool:
    """GPTQ-eligible: a 2-D ``*.weight`` projection, not excluded, whose
    reduction dim packs evenly into int32 words."""
    if not name.endswith(".weight") or len(shape) != 2:
        return False
    if any(s in name for s in _EXCLUDE_SUBSTRINGS):
        return False
    per = 32 // bits
    # qweight packs the reduction dim; qzeros pack the output dim
    return shape[1] % per == 0 and shape[0] % per == 0


def _pack_cols(vals: np.ndarray, bits: int) -> np.ndarray:
    """Pack unsigned ints little-end-first along axis 0 into int32 words:
    (in, out) -> (in/per, out) — the AutoGPTQ qweight layout (the exact
    inverse of models/quant.dequant_gptq's unpack)."""
    per = 32 // bits
    v = vals.astype(np.uint32).reshape(vals.shape[0] // per, per, -1)
    out = np.zeros((v.shape[0], v.shape[2]), np.uint32)
    for k in range(per):
        out |= v[:, k, :] << np.uint32(bits * k)
    return out.view(np.int32)


def _quantize_gptq_v2(w: np.ndarray, bits: int) -> Dict[str, np.ndarray]:
    """(out, in) weight -> GPTQ-v2 tensor quartet, symmetric per-output-
    channel (group_size=-1). Matches models/quant.quantize's integer grid:
    q ∈ [−qmax, qmax] around the true zero 2^(bits−1)."""
    per = 32 // bits
    w32 = np.array(w).astype(np.float32)  # copy: mmap astype is slow
    out_dim, in_dim = w32.shape
    qmax = 127.0 if bits == 8 else 7.0
    zero = 1 << (bits - 1)
    absmax = np.max(np.abs(w32), axis=1, keepdims=True)
    scale = np.maximum(absmax / qmax, 1e-12).astype(np.float32)  # (out, 1)
    q = np.clip(np.round(w32 / scale), -qmax, qmax).astype(np.int64) + zero
    qweight = _pack_cols(q.T, bits)  # (in/per, out)
    zeros_row = np.full((1, out_dim), zero, np.uint32)
    qzeros = _pack_cols(zeros_row.T, bits).T  # (1, out/per)
    return {
        "qweight": qweight,
        "qzeros": qzeros,
        "scales": scale.T.astype(np.float16),  # (1, out)
        "g_idx": np.zeros((in_dim,), np.int32),
    }


def _iter_tensors(src: Path):
    """Yield (name, numpy array) for every tensor of a checkpoint dir
    (sharded index or single model.safetensors), shard by shard."""
    from ..io.safetensors_io import load_file  # handles bf16 via ml_dtypes

    index_path = src / "model.safetensors.index.json"
    if index_path.is_file():
        index = json.loads(index_path.read_text())
        shards = sorted(set(index["weight_map"].values()))
    elif (src / "model.safetensors").is_file():
        shards = ["model.safetensors"]
    else:
        raise FileNotFoundError(
            f"{src}: no model.safetensors.index.json or model.safetensors"
        )
    for shard in shards:
        tensors = load_file(str(src / shard))
        for name in sorted(tensors):
            yield name, tensors[name]
        del tensors


class _ShardWriter:
    """Accumulate tensors into ~shard_bytes safetensors files with the
    standard HF naming + index (same layout io/writer.py produces)."""

    def __init__(self, dst: Path, shard_bytes: int):
        self.dst = dst
        self.shard_bytes = shard_bytes
        self.pending: Dict[str, np.ndarray] = {}
        self.pending_bytes = 0
        self.weight_map: Dict[str, int] = {}
        self.total = 0
        self.n_flushed = 0
        self.tmp_names = []

    def add(self, name: str, arr: np.ndarray):
        self.pending[name] = arr
        self.pending_bytes += arr.nbytes
        self.total += arr.nbytes
        self.weight_map[name] = None  # chunk assigned at flush
        if self.pending_bytes >= self.shard_bytes:
            self.flush()

    def flush(self):
        if not self.pending:
            return
        from ..io.safetensors_io import save_file  # bf16-capable

        idx = self.n_flushed
        tmp = self.dst / f"shard-{idx}.tmp"
        save_file(self.pending, str(tmp))
        for name in self.pending:
            self.weight_map[name] = idx
        self.tmp_names.append(tmp)
        self.pending = {}
        self.pending_bytes = 0
        self.n_flushed += 1

    def finalize(self) -> int:
        self.flush()
        n = self.n_flushed
        names = [
            f"model-{i + 1:05d}-of-{n:05d}.safetensors" for i in range(n)
        ]
        for tmp, final in zip(self.tmp_names, names):
            tmp.rename(self.dst / final)
        index = {
            "metadata": {"total_size": self.total},
            "weight_map": {
                k: names[v] for k, v in sorted(self.weight_map.items())
            },
        }
        (self.dst / "model.safetensors.index.json").write_text(
            json.dumps(index, indent=2)
        )
        return n


def quantize_checkpoint(
    src_dir,
    dst_dir,
    bits: int = 4,
    shard_bytes: int = _SHARD_BYTES,
    check: bool = True,
) -> dict:
    """Write a GPTQ-v2 artifact of ``src_dir`` into ``dst_dir``.

    Returns a report dict: tensors quantized/passthrough, byte counts,
    and (with ``check``) the worst round-trip error of the serialization
    vs the repo's own serving quantization (fp16-scale rounding only).
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    src, dst = Path(src_dir), Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)

    from ..models.quant import dequant_gptq

    writer = _ShardWriter(dst, shard_bytes)
    n_quant = n_raw = 0
    src_bytes = 0
    worst_rel = 0.0
    for name, arr in _iter_tensors(src):
        src_bytes += arr.nbytes
        if is_quantizable(name, arr.shape, bits):
            root = name[: -len(".weight")]
            parts = _quantize_gptq_v2(arr, bits)
            for part, val in parts.items():
                writer.add(f"{root}.{part}", val)
            n_quant += 1
            if check:
                # serialization round-trip vs the repo's fp32-scale
                # serving quantization: only fp16 scale rounding may
                # differ (documented bound; quantization error itself is
                # common to both sides)
                from ..models.quant import dequant, quantize

                back = dequant_gptq(
                    parts["qweight"],
                    parts["qzeros"],
                    parts["scales"],
                    parts["g_idx"],
                    bits,
                    v1_zero_offset=False,
                )
                ours = np.asarray(
                    dequant(quantize(np.array(arr), bits), np.float32)
                )
                denom = np.linalg.norm(ours) or 1.0
                rel = float(np.linalg.norm(back - ours) / denom)
                worst_rel = max(worst_rel, rel)
                if rel > 2e-3:
                    raise AssertionError(
                        f"{name}: GPTQ-v2 round-trip relL2 {rel:.2e} "
                        "exceeds the fp16-scale bound"
                    )
        else:
            writer.add(name, np.array(arr))
            n_raw += 1
    n_shards = writer.finalize()

    # config.json: announce the format so every GPTQ loader (incl. this
    # repo's io/index.py + models/loader.py) recognizes the artifact
    cfg_path = src / "config.json"
    cfg = json.loads(cfg_path.read_text()) if cfg_path.is_file() else {}
    cfg["quantization_config"] = {
        "quant_method": "gptq",
        "bits": bits,
        "group_size": -1,
        "sym": True,
        "desc_act": False,
        "checkpoint_format": "gptq_v2",
        "meta": {"producer": "shardmerge_tpu", "scheme": "per-channel-absmax"},
    }
    (dst / "config.json").write_text(json.dumps(cfg, indent=2))
    for extra in _COPY_FILES[1:]:  # config.json handled above
        if (src / extra).is_file():
            shutil.copy2(src / extra, dst / extra)

    report = {
        "bits": bits,
        "tensors_quantized": n_quant,
        "tensors_passthrough": n_raw,
        "shards": n_shards,
        "src_bytes": src_bytes,
        "dst_bytes": writer.total,
        "compression": round(src_bytes / max(writer.total, 1), 2),
    }
    if check:
        report["worst_roundtrip_relL2_vs_serving_quant"] = worst_rel
    logger.info(
        "Quantized %d tensors (+%d raw) into %d shards: %.2f GiB -> "
        "%.2f GiB (%.1fx)",
        n_quant,
        n_raw,
        n_shards,
        src_bytes / 2**30,
        writer.total / 2**30,
        report["compression"],
    )
    return report
