"""Load HF llama-family safetensors checkpoints into the JAX param pytree.

Weight names follow the HF convention the merge pipeline preserves
(model.embed_tokens.weight, model.layers.N.self_attn.q_proj.weight, ...).
Reads are zero-copy mmap views; each tensor makes exactly one host->device
transfer. Optional int8/int4 weight-only quantization is applied to the
per-layer projection matrices (embeddings, norms and lm_head stay bf16, like
the reference's bitsandbytes setup keeps lm_head unquantized).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..io.safetensors_io import SafeTensorsReader
from .llama import ModelConfig, Params

logger = logging.getLogger(__name__)

__all__ = ["load_params", "load_model", "resolve_checkpoint_dir"]


def resolve_checkpoint_dir(model_path):
    """(weights_dir, adapter_or_None) for a checkpoint OR a PEFT LoRA
    adapter directory.

    An adapter dir (adapter_config.json, no full weights) resolves to its
    declared base checkpoint, with {"pairs", "scale"} describing the
    low-rank deltas to fuse at load — so ``generate``/``serve`` accept a
    LoRA finetune directly, no fuse-lora intermediate on disk. Mirrors
    the merge-side support in io/index.py OfflineMultiModelIndex."""
    model_path = Path(model_path)
    if (model_path / "adapter_config.json").is_file() and not (
        (model_path / "model.safetensors.index.json").exists()
        or (model_path / "model.safetensors").exists()
    ):
        from ..tools.fuse_lora import load_adapter

        pairs, scale = load_adapter(model_path)
        base_ref = str(
            json.loads(
                (model_path / "adapter_config.json").read_text()
            ).get("base_model_name_or_path")
            or ""
        )
        if not base_ref or not Path(base_ref).is_dir():
            raise FileNotFoundError(
                f"adapter {model_path} declares base_model_name_or_path="
                f"{base_ref!r}, which is not a local checkpoint directory; "
                "set it to the adapter's base checkpoint"
            )
        logger.info(
            "Loading LoRA adapter %s fused onto base %s (%d tensor "
            "pairs, scale %g)",
            model_path,
            base_ref,
            len(pairs),
            scale,
        )
        return Path(base_ref), {"pairs": pairs, "scale": float(scale)}
    return model_path, None


def _apply_lora_pair(arr, pair, scale: float) -> np.ndarray:
    """base + scale*B@A in fp32, cast back to the BASE dtype — identical
    math and rounding to tools/fuse_lora._fused, so loading an adapter
    equals loading its fuse-lora'd checkpoint byte-for-byte."""
    w32 = np.array(arr).astype(np.float32)  # copy the mmap view first
    delta = (
        pair["B"].astype(np.float32) @ pair["A"].astype(np.float32)
    ) * np.float32(scale)
    return (w32 + delta).astype(np.asarray(arr).dtype)

_LAYER_WEIGHTS = {
    "self_attn.q_proj.weight": "q_proj",
    "self_attn.k_proj.weight": "k_proj",
    "self_attn.v_proj.weight": "v_proj",
    "self_attn.o_proj.weight": "o_proj",
    "mlp.gate_proj.weight": "gate_proj",
    "mlp.up_proj.weight": "up_proj",
    "mlp.down_proj.weight": "down_proj",
    "input_layernorm.weight": "input_layernorm",
    "post_attention_layernorm.weight": "post_attention_layernorm",
    "self_attn.q_proj.bias": "q_bias",
    "self_attn.k_proj.bias": "k_bias",
    "self_attn.v_proj.bias": "v_bias",
    # gemma2 post-norm blocks
    "pre_feedforward_layernorm.weight": "pre_feedforward_layernorm",
    "post_feedforward_layernorm.weight": "post_feedforward_layernorm",
    # qwen3 per-head q/k norms
    "self_attn.q_norm.weight": "q_norm",
    "self_attn.k_norm.weight": "k_norm",
    # deepseek v2/v3 multi-head latent attention
    "self_attn.q_a_proj.weight": "q_a_proj",
    "self_attn.q_a_layernorm.weight": "q_a_layernorm",
    "self_attn.q_b_proj.weight": "q_b_proj",
    "self_attn.kv_a_proj_with_mqa.weight": "kv_a_proj",
    "self_attn.kv_a_layernorm.weight": "kv_a_layernorm",
    "self_attn.kv_b_proj.weight": "kv_b_proj",
    # deepseek MoE: always-on shared experts + V3 router selection bias
    "mlp.shared_experts.gate_proj.weight": "shared_gate_proj",
    "mlp.shared_experts.up_proj.weight": "shared_up_proj",
    "mlp.shared_experts.down_proj.weight": "shared_down_proj",
    "mlp.gate.e_score_correction_bias": "gate_bias",
    # llama4 names its FFN module feed_forward (dense layers + the MoE
    # layers' always-on shared expert, stored in the deepseek shared slots)
    "feed_forward.gate_proj.weight": "gate_proj",
    "feed_forward.up_proj.weight": "up_proj",
    "feed_forward.down_proj.weight": "down_proj",
    "feed_forward.shared_expert.gate_proj.weight": "shared_gate_proj",
    "feed_forward.shared_expert.up_proj.weight": "shared_up_proj",
    "feed_forward.shared_expert.down_proj.weight": "shared_down_proj",
}
# qwen3-moe expert weights use HF mlp names; the pytree keeps mixtral's w1/w3/w2
_EXPERT_WEIGHTS = {"gate_proj": "w1", "up_proj": "w3", "down_proj": "w2"}
# glm4 sandwich norms -> the gemma2-structure slot names (its
# post_attention_layernorm is the PRE-ffn norm)
_GLM4_NORMS = {
    "post_self_attn_layernorm.weight": "post_attention_layernorm",
    "post_attention_layernorm.weight": "pre_feedforward_layernorm",
    "post_mlp_layernorm.weight": "post_feedforward_layernorm",
}
# gpt-oss stacks ALL experts into single fused tensors
_GPTOSS_EXPERT_WEIGHTS = {
    "mlp.experts.gate_up_proj": "gate_up",
    "mlp.experts.gate_up_proj_bias": "gate_up_bias",
    "mlp.experts.down_proj": "down",
    "mlp.experts.down_proj_bias": "down_bias",
}
# llama4 also ships fused expert stacks (gate/up as contiguous halves,
# bias-free) plus a per-layer router
_LLAMA4_EXPERT_WEIGHTS = {
    "feed_forward.experts.gate_up_proj": "gate_up",
    "feed_forward.experts.down_proj": "down",
}
_QUANTIZABLE = {
    "q_proj",
    "k_proj",
    "v_proj",
    "o_proj",
    "gate_proj",
    "up_proj",
    "down_proj",
    # deepseek MLA projections (kv_b_proj is dequantized at use — it is
    # consumed via reshape for the absorbed einsums, not through matmul)
    "q_a_proj",
    "q_b_proj",
    "kv_a_proj",
    "kv_b_proj",
    "shared_gate_proj",
    "shared_up_proj",
    "shared_down_proj",
}


def _to_device(arr: np.ndarray, dtype, sharding=None) -> jnp.ndarray:
    x = jax.device_put(arr) if sharding is None else jax.device_put(arr, sharding)
    return x.astype(dtype) if x.dtype != dtype else x


class _StreamShardings:
    """Per-tensor placement for sharded loading: each weight goes STRAIGHT
    to its tensor-parallel sharding as it is read, so a checkpoint larger
    than one chip's HBM never stages on the default device. The rule table
    is shared with param_shardings (one source of truth). Dims that do not
    divide the mesh fall back to replicated."""

    def __init__(self, mesh):
        from ..parallel.train import loader_shardings

        self.layer_rules, self.top_rules, self.rep = loader_shardings(mesh)
        self.n = mesh.devices.size

    def _fits(self, rule, shape):
        for dim, name in zip(shape, rule.spec):
            if name is not None and dim % self.n != 0:
                return False
        return len(rule.spec) <= len(shape)

    def layer(self, key: str, shape) -> object:
        rule = self.layer_rules.get(key, self.rep)
        return rule if self._fits(rule, shape) else self.rep

    def top(self, key: str, shape) -> object:
        rule = self.top_rules.get(key, self.rep)
        return rule if self._fits(rule, shape) else self.rep


def load_params(
    model_path: Path,
    cfg: Optional[ModelConfig] = None,
    dtype=jnp.bfloat16,
    quant_bits: Optional[int] = None,
    mesh=None,
    resolved=None,
) -> Params:
    """Load all weights from a sharded (or single-file) safetensors dir.

    With ``mesh`` (a 1-D ('tp',) Mesh), every tensor is placed directly
    onto its tensor-parallel sharding as it is read (_StreamShardings) —
    required for checkpoints larger than one chip's HBM.

    ``model_path`` may be a PEFT LoRA adapter directory: weights stream
    from its base checkpoint with the low-rank deltas fused per tensor at
    read time (resolve_checkpoint_dir). Callers that already resolved it
    pass ``resolved=(weights_dir, adapter)`` so the adapter safetensors is
    not read twice."""
    if resolved is not None:
        model_path, adapter = resolved
    else:
        model_path, adapter = resolve_checkpoint_dir(model_path)
    if cfg is None:
        cfg = ModelConfig.from_pretrained(model_path)

    # GPTQ checkpoints (the dominant Hub weight-only quantization) decode
    # at load: config.json's quantization_config announces the format
    gptq = None
    awq = None
    cfg_path = model_path / "config.json"
    if cfg_path.is_file():
        from ..io.index import packed_quant_info

        qc = json.loads(cfg_path.read_text()).get("quantization_config") or {}
        method = qc.get("quant_method")
        try:
            # one shared normalization with the merge index — the two
            # surfaces must agree on format detection and defaults
            info = packed_quant_info(qc)
        except ValueError as e:
            raise ValueError(
                f"{model_path}: {e} — dequantize to bf16 first"
            ) from e
        if info is not None and info["fmt"] == "gptq":
            gptq = {"bits": info["bits"], "v1": info["v1"]}
            logger.info(
                "GPTQ checkpoint (bits=%d, %s format): decoding packed "
                "tensors at load",
                gptq["bits"],
                "v1" if gptq["v1"] else "v2",
            )
        elif info is not None and info["fmt"] == "awq":
            awq = {"bits": info["bits"]}
            logger.info(
                "AWQ checkpoint (bits=%d, gemm format): decoding packed "
                "tensors at load",
                awq["bits"],
            )
        elif info is None and method not in (None, "mxfp4"):
            raise ValueError(
                f"{model_path} uses quant_method {method!r}; supported "
                "quantized formats are GPTQ, AWQ (gemm) and MXFP4 "
                "(gpt-oss) — dequantize to bf16 first"
            )
    ss = _StreamShardings(mesh) if mesh is not None else None

    def place(arr, key=None, top=None):
        if ss is None:
            return _to_device(arr, dtype)
        sharding = ss.top(top, arr.shape) if top else ss.layer(key, arr.shape)
        return _to_device(arr, dtype, sharding)

    def place_quant(arr, key, stacked=False):
        """Quantize ON HOST (numpy) then place: quantizing after device_put
        would spike device memory with a transient fp32 copy of exactly the
        tensors quantization is supposed to shrink."""
        qd = (quantize_stacked if stacked else quantize)(arr, bits=quant_bits)
        qkey = "q3" if stacked else "q"
        if ss is None:
            return {k: jax.device_put(v) for k, v in qd.items()}
        return {
            qkey: jax.device_put(qd[qkey], ss.layer(key, qd[qkey].shape)),
            # the scale is tiny; replicate (shard_params may refine later)
            "scale": jax.device_put(qd["scale"], ss.rep),
        }

    index_path = model_path / "model.safetensors.index.json"
    if index_path.exists():
        with open(index_path) as f:
            weight_map = json.load(f)["weight_map"]
        shards = sorted(set(weight_map.values()))
    else:
        single = model_path / "model.safetensors"
        if not single.exists():
            raise FileNotFoundError(f"No safetensors weights in {model_path}")
        shards = ["model.safetensors"]

    params: Params = {
        "layers": [dict() for _ in range(cfg.num_hidden_layers)]
    }
    adapter_fused: set = set()
    mxfp4_pending: dict = {}  # (layer, gate_up_proj|down_proj) -> halves
    gptq_pending: dict = {}  # module root -> qweight/qzeros/scales/g_idx
    awq_pending: dict = {}  # module root -> qweight/qzeros/scales

    from .quant import (
        dequant_awq,
        dequant_gptq,
        dequant_mxfp4,
        quantize,
        quantize_stacked,
    )

    for shard in shards:
        with SafeTensorsReader(model_path / shard) as reader:
            for name in reader.keys():
                arr = reader.get_tensor(name)
                if name.startswith("language_model."):
                    # llama4 multimodal checkpoints nest the decoder under
                    # language_model.*; vision/projector tensors fall
                    # through to the unknown-weight warning below
                    name = name[len("language_model."):]
                if (
                    gptq is not None
                    and name.rsplit(".", 1)[-1]
                    in ("qweight", "qzeros", "scales", "g_idx")
                ):
                    # stage the four packed parts per module (COPYING off
                    # the mmap; parts may span shards) and decode to the
                    # raw (out, in) weight once complete — the decoded
                    # tensor then flows through the NORMAL dispatch below
                    # (incl. adapter fusion and int8/int4 re-quantization)
                    root, part = name.rsplit(".", 1)
                    pend = gptq_pending.setdefault(root, {})
                    pend[part] = np.array(arr)
                    if len(pend) < 4:
                        continue
                    arr = dequant_gptq(
                        pend["qweight"],
                        pend["qzeros"],
                        pend["scales"],
                        pend["g_idx"],
                        gptq["bits"],
                        v1_zero_offset=gptq["v1"],
                    )
                    del gptq_pending[root]
                    name = root + ".weight"
                if (
                    awq is not None
                    and name.rsplit(".", 1)[-1]
                    in ("qweight", "qzeros", "scales")
                ):
                    # same staged decode as GPTQ, three parts per module
                    # (AWQ gemm has no g_idx — groups are contiguous)
                    root, part = name.rsplit(".", 1)
                    pend = awq_pending.setdefault(root, {})
                    pend[part] = np.array(arr)
                    if len(pend) < 3:
                        continue
                    arr = dequant_awq(
                        pend["qweight"],
                        pend["qzeros"],
                        pend["scales"],
                        bits=awq["bits"],
                    )
                    del awq_pending[root]
                    name = root + ".weight"
                if adapter is not None:
                    pair = adapter["pairs"].get(name)
                    if pair is not None:
                        # fuse BEFORE quantization/placement: quantizing
                        # the fused weight is the correct adapter-serving
                        # semantic (identical to quantizing a fuse-lora'd
                        # checkpoint at load)
                        arr = _apply_lora_pair(arr, pair, adapter["scale"])
                        adapter_fused.add(name)
                if name == "model.embed_tokens.weight":
                    params["embed_tokens"] = place(arr, top="embed_tokens")
                elif name == "model.norm.weight":
                    params["norm"] = place(arr, top="norm")
                elif name == "lm_head.weight":
                    params["lm_head"] = place(arr, top="lm_head")
                elif name.startswith("model.layers."):
                    parts = name.split(".")
                    layer_idx = int(parts[2])
                    suffix = ".".join(parts[3:])
                    layer = params["layers"][layer_idx]
                    if suffix in ("block_sparse_moe.gate.weight", "mlp.gate.weight"):
                        # mixtral / qwen3-moe router
                        layer["moe_gate"] = place(arr, key="moe_gate")
                        continue
                    if suffix in ("mlp.router.weight", "mlp.router.bias"):
                        # gpt-oss router (biased linear)
                        key = (
                            "moe_gate"
                            if suffix.endswith("weight")
                            else "moe_gate_bias"
                        )
                        layer[key] = place(arr, key=key)
                        continue
                    if suffix == "feed_forward.router.weight":
                        # llama4 router (bias-free linear)
                        layer["moe_gate"] = place(arr, key="moe_gate")
                        continue
                    if suffix in _LLAMA4_EXPERT_WEIGHTS:
                        gk = _LLAMA4_EXPERT_WEIGHTS[suffix]
                        if quant_bits:
                            w = place_quant(arr, gk, stacked=True)
                        else:
                            w = place(arr, key=gk)
                        layer.setdefault("llama4_experts", {})[gk] = w
                        continue
                    if suffix in _GPTOSS_EXPERT_WEIGHTS:
                        gk = _GPTOSS_EXPERT_WEIGHTS[suffix]
                        if quant_bits and gk in ("gate_up", "down"):
                            # the fused stacks dominate a gpt-oss param
                            # count; quantize per (expert, output channel)
                            w = place_quant(arr, gk, stacked=True)
                        else:
                            w = place(arr, key=gk)
                        layer.setdefault("gptoss_experts", {})[gk] = w
                        continue
                    if suffix.startswith("mlp.experts.") and suffix.endswith(
                        ("_blocks", "_scales")
                    ):
                        # official gpt-oss releases ship MXFP4 expert
                        # tensors (gate_up_proj_blocks/_scales): stage the
                        # pair (COPYING — the mmap dies with the shard
                        # reader, and the halves may live in different
                        # shards) and decode once both halves arrive
                        root = suffix[len("mlp.experts."):]
                        stem, part = root.rsplit("_", 1)
                        pend = mxfp4_pending.setdefault(
                            (layer_idx, stem), {}
                        )
                        pend[part] = np.array(arr)
                        if len(pend) == 2:
                            w = dequant_mxfp4(
                                pend["blocks"], pend["scales"]
                            )
                            del mxfp4_pending[(layer_idx, stem)]
                            gk = _GPTOSS_EXPERT_WEIGHTS[
                                "mlp.experts." + stem
                            ]
                            if quant_bits:
                                w = place_quant(w, gk, stacked=True)
                            else:
                                w = place(w, key=gk)
                            layer.setdefault("gptoss_experts", {})[gk] = w
                        continue
                    if suffix == "self_attn.sinks":
                        layer["sinks"] = place(arr, key="sinks")
                        continue
                    if suffix == "self_attn.o_proj.bias":
                        layer["o_bias"] = place(arr, key="o_bias")
                        continue
                    if suffix.startswith(
                        ("block_sparse_moe.experts.", "mlp.experts.")
                    ):
                        # mixtral:   model.layers.N.block_sparse_moe.experts.E.w{1,2,3}.weight
                        # qwen3-moe: model.layers.N.mlp.experts.E.{gate,up,down}_proj.weight
                        expert_idx = int(parts[5])
                        wname = _EXPERT_WEIGHTS.get(parts[6], parts[6])
                        experts = layer.setdefault(
                            "experts",
                            [dict() for _ in range(cfg.num_local_experts)],
                        )
                        w = (
                            place_quant(arr, wname)
                            if quant_bits
                            else place(arr, key=wname)
                        )
                        experts[expert_idx][wname] = w
                        continue
                    if suffix == "self_attn.qkv_proj.weight":
                        # phi3 fuses q/k/v row-wise: split by head geometry
                        q_dim = cfg.num_attention_heads * cfg.head_dim
                        kv_dim = cfg.num_key_value_heads * cfg.head_dim
                        for key, part in zip(
                            ("q_proj", "k_proj", "v_proj"),
                            np.split(arr, [q_dim, q_dim + kv_dim], axis=0),
                        ):
                            part = np.ascontiguousarray(part)
                            w = (
                                place_quant(part, key)
                                if quant_bits
                                else place(part, key=key)
                            )
                            layer[key] = w
                        continue
                    if suffix == "mlp.gate_up_proj.weight":
                        # phi3 fuses gate/up row-wise: equal halves
                        for key, part in zip(
                            ("gate_proj", "up_proj"), np.split(arr, 2, axis=0)
                        ):
                            part = np.ascontiguousarray(part)
                            w = (
                                place_quant(part, key)
                                if quant_bits
                                else place(part, key=key)
                            )
                            layer[key] = w
                        continue
                    if cfg.model_type == "glm4" and suffix in _GLM4_NORMS:
                        # glm4's sandwich norms are gemma2's structure with
                        # rotated names — note its post_attention_layernorm
                        # is the PRE-ffn norm, so the generic map must not
                        # see it
                        key = _GLM4_NORMS[suffix]
                        layer[key] = place(arr, key=key)
                        continue
                    key = _LAYER_WEIGHTS.get(suffix)
                    if key is None:
                        logger.warning("Skipping unknown weight %s", name)
                        continue
                    if quant_bits and key in _QUANTIZABLE:
                        w = place_quant(arr, key)
                    else:
                        w = place(arr, key=key)
                    layer[key] = w
                else:
                    logger.warning("Skipping unknown weight %s", name)

    if gptq_pending:
        raise ValueError(
            f"Checkpoint at {model_path} has incomplete GPTQ modules "
            "(need qweight+qzeros+scales+g_idx): "
            f"{sorted(gptq_pending)[:4]}"
        )
    if awq_pending:
        raise ValueError(
            f"Checkpoint at {model_path} has incomplete AWQ modules "
            "(need qweight+qzeros+scales): "
            f"{sorted(awq_pending)[:4]}"
        )
    if mxfp4_pending:
        raise ValueError(
            f"Checkpoint at {model_path} has incomplete MXFP4 expert "
            f"tensors (blocks without scales or vice versa): "
            f"{sorted(mxfp4_pending)[:4]}"
        )
    if adapter is not None:
        dangling = sorted(set(adapter["pairs"]) - adapter_fused)
        if dangling:
            raise ValueError(
                "adapter targets absent from the base checkpoint: "
                f"{dangling[:4]}{'...' if len(dangling) > 4 else ''}"
            )
    if cfg.tie_word_embeddings:
        params.pop("lm_head", None)
    missing = [
        i
        for i, layer in enumerate(params["layers"])
        if "q_proj" not in layer and "q_a_proj" not in layer
    ]
    if missing or "embed_tokens" not in params:
        raise ValueError(
            f"Checkpoint at {model_path} is incomplete "
            f"(missing embed or layers {missing[:4]}...)"
        )
    if cfg.moe_layers is not None:
        # llama4 interleaved stacks: the per-layer MoE table derived from
        # the config must match the tensors actually present — a missing
        # expert stack would otherwise dispatch that layer as dense and
        # fail later (or worse, a dense layer with stray expert tensors
        # would silently route)
        wrong = [
            i
            for i, layer in enumerate(params["layers"])
            if ("llama4_experts" in layer) != cfg.layer_is_moe(i)
        ]
        if wrong:
            raise ValueError(
                f"Checkpoint at {model_path} disagrees with the config's "
                f"moe_layers table at layers {wrong[:4]}: expert stacks "
                "present where the config says dense (or vice versa)"
            )
    return params


def load_model(model_path: Path, quant_bits: Optional[int] = None):
    """Convenience: (config, params)."""
    cfg = ModelConfig.from_pretrained(model_path)
    return cfg, load_params(model_path, cfg, quant_bits=quant_bits)
