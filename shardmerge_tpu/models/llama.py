"""JAX Llama-family forward pass (Llama 2/3, Qwen2, Qwen3, Qwen3-MoE,
Mistral, Mixtral, Gemma 1/2, Phi-3, DeepSeek V2/V3, GPT-OSS).

Replaces the reference's transformers+bitsandbytes inference path
(shard/inference.py:65-119) with a pure-JAX functional model:

- params are a pytree of jnp arrays keyed like the HF checkpoint
  (models/loader.py maps safetensors names onto it)
- one jitted function serves both prefill and single-token decode against a
  fixed-size KV cache (static shapes; no retrace per step)
- bf16 weights/activations, fp32 RMSNorm/softmax/logits
- GQA, RoPE (with llama3 rope scaling), SwiGLU/GeGLU, optional attention
  biases (Qwen2), optional tied embeddings; Gemma (1+w) norms and
  sqrt(hidden) embed scale; Gemma-2 post-norm blocks, logit softcapping and
  alternating sliding-window attention; Mistral all-layer sliding window;
  Qwen3 per-head q/k RMSNorm; Qwen3-MoE sparse layers (mlp.gate /
  mlp.experts naming, norm_topk_prob gate); Phi-3 fused-qkv checkpoints
  split on load
- weights may be int8/int4-quantized per output channel (models/quant.py);
  dequantization happens inside the matmul helper
- DeepSeek V2/V3 multi-head latent attention with a COMPRESSED kv cache
  (kv_lora_rank latent + shared roped key; kv_b_proj absorbed into the
  query/output sides — see _attention_mla), yarn rope, interleaved rope
  pairs, and grouped MoE routing with shared experts (sigmoid +
  e_score_correction_bias for V3, softmax group-limited-greedy for V2)
- GPT-OSS: learned attention sinks joining the softmax normalization,
  per-layer sliding/full attention via layer_types, q/k/v/o biases, and
  the fused-interleaved clamped-SwiGLU MoE with a biased
  top-k-then-softmax router (_moe_gptoss)

The forward is mesh-agnostic: parallel/train.py shards the same pytree over
a Mesh for multi-chip inference/training.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass
class ModelConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_hidden_layers: int = 22
    num_attention_heads: int = 32
    num_key_value_heads: int = 4
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # Qwen2 uses q/k/v biases
    model_type: str = "llama"
    # MoE (Mixtral/Qwen3-MoE): 0 experts means a dense MLP
    num_local_experts: int = 0
    num_experts_per_tok: int = 2
    # Qwen3-MoE: expert FFNs are narrower than the dense intermediate size,
    # and renormalizing the top-k router weights is a config choice
    moe_intermediate_size: Optional[int] = None
    norm_topk_prob: bool = True
    # Qwen3: per-head RMSNorm on q/k before RoPE
    qk_norm: bool = False
    # Olmo2: RMSNorm over the FULL projected q/k vectors (before the head
    # split), and post-norm residuals with no input_layernorm
    qk_norm_full: bool = False
    # Gemma family
    head_dim_override: Optional[int] = None  # gemma2 sets head_dim explicitly
    hidden_act: str = "silu"  # gemma: gelu_pytorch_tanh (GeGLU)
    query_pre_attn_scalar: Optional[float] = None  # gemma2 score scale
    attn_logit_softcapping: Optional[float] = None  # gemma2
    final_logit_softcapping: Optional[float] = None  # gemma2
    sliding_window: Optional[int] = None  # gemma2 alternating local attn
    # phi3 longrope: pretraining context length (scaling switches factors
    # and the attention scale at this boundary)
    original_max_position_embeddings: Optional[int] = None
    # MoE dispatch: "dense" computes every expert and masks (exact,
    # O(n_experts) FLOPs — right for merge validation); "capacity" gathers
    # tokens into fixed-capacity expert blocks (serving path, _moe_capacity)
    moe_dispatch: str = "dense"
    moe_capacity_factor: float = 1.25
    # DeepSeek V2/V3 multi-head latent attention (MLA): engaged when
    # kv_lora_rank is set. Queries/keys split into a no-position part
    # (qk_nope_head_dim per head) and a shared roped part (qk_rope_head_dim);
    # keys/values decompress from a kv_lora_rank latent.
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: Optional[int] = None
    # DeepSeek checkpoints store rope dims as interleaved (even, odd) pairs
    # (HF deepseek_v3 rope_interleave; deepseek_v2 always, via its complex-
    # valued apply_rotary_emb); glm4 interleaves its partial-rotary dims
    rope_interleave: bool = False
    # glm4: only the first head_dim * factor dims rotate
    partial_rotary_factor: float = 1.0
    # DeepSeek MoE: dense first_k layers, always-on shared experts, routed
    # weight scaling, group-limited expert selection
    n_shared_experts: int = 0
    first_k_dense_replace: int = 0
    routed_scaling_factor: float = 1.0
    n_group: Optional[int] = None
    topk_group: Optional[int] = None
    # "greedy" / "group_limited_greedy" (V2, softmax scores) or
    # "noaux_tc" (V3, sigmoid scores + e_score_correction_bias)
    topk_method: str = "greedy"
    # gpt-oss: explicit per-layer attention kinds ("sliding_attention" /
    # "full_attention"); None falls back to the model_type patterns in
    # layer_is_sliding
    layer_types: Optional[tuple] = None
    # smollm3: per-layer rope gate (HF's no_rope_layers — 1 means the
    # layer DOES rope, 0 is a NoPE layer); None = rope everywhere
    no_rope_layers: Optional[tuple] = None
    # llama4: interleaved dense/MoE stacks (explicit MoE layer indices),
    # chunk-aligned local attention on rope layers, temperature-scaled
    # queries on NoPE layers, weightless L2 q/k norm after rope
    moe_layers: Optional[tuple] = None
    attention_chunk_size: Optional[int] = None
    attn_temperature_tuning: bool = False
    floor_scale: float = 8192.0
    attn_scale: float = 0.1
    qk_norm_l2: bool = False
    # gemma3: DUAL rope — sliding (local) layers rope at this base
    # frequency with no scaling, full (global) layers at rope_theta with
    # rope_scaling (HF Gemma3TextModel.rotary_emb_local); None = single
    # rope table (every other family)
    rope_local_base_freq: Optional[float] = None

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.hidden_size // self.num_attention_heads

    @property
    def is_mla(self) -> bool:
        return self.kv_lora_rank is not None

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def rope_dims(self) -> int:
        """Head dims the rotary tables cover (MLA ropes only the shared
        qk_rope part; glm4 ropes the partial_rotary_factor fraction)."""
        if self.is_mla:
            return self.qk_rope_head_dim
        return int(self.head_dim * self.partial_rotary_factor)

    @property
    def mla_softmax_scale(self) -> float:
        """MLA score scale: qk_head_dim^-0.5, times mscale^2 under yarn with
        mscale_all_dim (HF modeling_deepseek_v3.DeepseekV3Attention.__init__;
        the HF deepseek_v2 port applies NO mscale adjustment — reproduced)."""
        scale = self.qk_head_dim**-0.5
        if self.model_type == "deepseek_v3" and self.rope_scaling:
            mscale_all_dim = self.rope_scaling.get("mscale_all_dim", 0)
            factor = self.rope_scaling.get("factor", 1.0)
            if mscale_all_dim and factor > 1:
                mscale = 0.1 * mscale_all_dim * float(np.log(factor)) + 1.0
                scale = scale * mscale * mscale
        return scale

    @property
    def is_gemma(self) -> bool:
        return self.model_type.startswith("gemma")

    @property
    def is_gemma2(self) -> bool:
        return self.model_type == "gemma2"

    @property
    def is_gemma3(self) -> bool:
        return self.model_type == "gemma3_text"

    @property
    def is_olmo2(self) -> bool:
        return self.model_type == "olmo2"

    def layer_is_sliding(self, layer_idx: int) -> bool:
        """gemma2 alternates local (sliding-window) and global attention
        (HF applies the window on even layer indices); mistral applies the
        window to every layer; gpt-oss declares it per layer via
        layer_types."""
        if self.sliding_window is None:
            return False
        if self.layer_types is not None:
            return self.layer_types[layer_idx] == "sliding_attention"
        if self.is_gemma2:
            return layer_idx % 2 == 0
        return self.model_type == "mistral"

    def layer_uses_rope(self, layer_idx: int) -> bool:
        if self.no_rope_layers is None:
            return True
        return bool(self.no_rope_layers[layer_idx])

    def layer_is_chunked(self, layer_idx: int) -> bool:
        """llama4 rope layers attend within chunk-aligned windows
        ("chunked_attention" in layer_types); NoPE layers attend globally."""
        return bool(
            self.attention_chunk_size
            and self.layer_types is not None
            and self.layer_types[layer_idx] == "chunked_attention"
        )

    def layer_is_moe(self, layer_idx: int) -> bool:
        """Per-layer MoE table (llama4 interleaves dense and MoE layers);
        None means every layer follows the global num_local_experts."""
        if self.moe_layers is None:
            return self.num_local_experts > 0
        return layer_idx in self.moe_layers

    @classmethod
    def from_hf_config(cls, config: dict) -> "ModelConfig":
        model_type = config.get("model_type", "llama")
        if model_type == "llama4" and isinstance(
            config.get("text_config"), dict
        ):
            # multimodal wrapper config (Llama4ForConditionalGeneration):
            # the decoder geometry lives in text_config
            config = config["text_config"]
            model_type = config.get("model_type", "llama4_text")
        if model_type == "gemma3" and isinstance(
            config.get("text_config"), dict
        ):
            # multimodal wrapper (Gemma3ForConditionalGeneration)
            config = config["text_config"]
            model_type = config.get("model_type", "gemma3_text")
        no_rope = config.get("no_rope_layers")
        layer_types = config.get("layer_types")
        moe_layers = config.get("moe_layers")
        if model_type == "llama4_text":
            # HF derives all three per-layer tables when config.json omits
            # them (configuration_llama4.Llama4TextConfig.__init__): NoPE
            # every no_rope_layer_interval-th layer, MoE every
            # interleave_moe_layer_step-th, chunked attention exactly on
            # the rope layers
            n_layers = config["num_hidden_layers"]
            if not no_rope:
                interval = config.get("no_rope_layer_interval", 4)
                no_rope = [
                    int((i + 1) % interval != 0) for i in range(n_layers)
                ]
            if moe_layers is None:
                step = config.get("interleave_moe_layer_step", 1)
                moe_layers = list(range(step - 1, n_layers, step))
            if layer_types is None:
                layer_types = [
                    "chunked_attention" if uses_rope else "full_attention"
                    for uses_rope in no_rope
                ]
        if model_type == "gemma3_text" and layer_types is None:
            # HF derives the 5-local:1-global pattern when config.json
            # omits layer_types (configuration_gemma3.Gemma3TextConfig:
            # sliding unless (i+1) % sliding_window_pattern == 0)
            p = config.get("sliding_window_pattern", 6)
            layer_types = [
                "sliding_attention" if (i + 1) % p else "full_attention"
                for i in range(config["num_hidden_layers"])
            ]
        if model_type == "smollm3":
            # HF derives both fields when config.json omits them
            # (configuration_smollm3.py): NoPE every no_rope_layer_interval
            # layers; sliding attention exactly on the NoPE layers
            n_layers = config["num_hidden_layers"]
            if no_rope is None:
                interval = config.get("no_rope_layer_interval", 4)
                no_rope = [
                    int((i + 1) % interval != 0) for i in range(n_layers)
                ]
            if layer_types is None:
                sw = config.get("use_sliding_window") and config.get(
                    "sliding_window"
                )
                layer_types = [
                    "sliding_attention"
                    if (sw and not no_rope[i])
                    else "full_attention"
                    for i in range(n_layers)
                ]
        return cls(
            vocab_size=config["vocab_size"],
            hidden_size=config["hidden_size"],
            intermediate_size=config["intermediate_size"],
            num_hidden_layers=config["num_hidden_layers"],
            num_attention_heads=config["num_attention_heads"],
            num_key_value_heads=config.get(
                "num_key_value_heads", config["num_attention_heads"]
            ),
            max_position_embeddings=config.get("max_position_embeddings", 4096),
            rms_norm_eps=config.get("rms_norm_eps", 1e-5),
            rope_theta=config.get("rope_theta", 10000.0),
            rope_scaling=config.get("rope_scaling"),
            # gemma/smollm3 tie by default, so their config.json may omit it
            tie_word_embeddings=config.get(
                "tie_word_embeddings",
                model_type.startswith("gemma") or model_type == "smollm3",
            ),
            # qwen2 and glm4 bias q/k/v by default
            attention_bias=config.get(
                "attention_bias", model_type in ("qwen2", "glm4")
            ),
            model_type=model_type,
            # Mixtral names the field num_local_experts; Qwen3-MoE
            # num_experts; DeepSeek n_routed_experts
            num_local_experts=config.get(
                "num_local_experts",
                config.get("num_experts", config.get("n_routed_experts", 0)),
            ),
            num_experts_per_tok=config.get("num_experts_per_tok", 2),
            moe_intermediate_size=config.get("moe_intermediate_size"),
            norm_topk_prob=config.get("norm_topk_prob", True),
            # per-head q/k RMSNorm before rope (qwen3 llama-style;
            # gemma3 zero-centered — the rms_norm gemma flag follows
            # cfg.is_gemma at the application sites)
            qk_norm=(
                model_type.startswith("qwen3")
                or model_type == "gemma3_text"
            ),
            qk_norm_full=model_type == "olmo2",
            # explicit head_dim (gemma always; qwen3/new-mistral when present)
            head_dim_override=config.get("head_dim"),
            hidden_act=config.get(
                "hidden_activation", config.get("hidden_act", "silu")
            ),
            query_pre_attn_scalar=config.get("query_pre_attn_scalar"),
            attn_logit_softcapping=config.get("attn_logit_softcapping"),
            final_logit_softcapping=config.get("final_logit_softcapping"),
            sliding_window=config.get("sliding_window")
            if (
                model_type in ("gemma2", "gemma3_text", "mistral", "gpt_oss")
                or (
                    model_type == "smollm3"
                    and config.get("use_sliding_window")
                )
            )
            else None,
            layer_types=tuple(layer_types) if layer_types else None,
            no_rope_layers=(
                tuple(no_rope) if no_rope is not None else None
            ),
            original_max_position_embeddings=config.get(
                "original_max_position_embeddings"
            ),
            # DeepSeek V2/V3 (MLA + grouped MoE). V2's HF port always ropes
            # interleaved (complex-pair apply_rotary_emb); V3 gates it on
            # rope_interleave (default true).
            q_lora_rank=config.get("q_lora_rank"),
            kv_lora_rank=config.get("kv_lora_rank"),
            qk_nope_head_dim=config.get("qk_nope_head_dim", 0),
            qk_rope_head_dim=config.get("qk_rope_head_dim", 0),
            v_head_dim=config.get("v_head_dim"),
            rope_interleave=(
                model_type in ("deepseek_v2", "glm4", "llama4_text")
                or (
                    model_type == "deepseek_v3"
                    and config.get("rope_interleave", True)
                )
            ),
            # HF Glm4Config defaults to half rotary
            partial_rotary_factor=config.get(
                "partial_rotary_factor", 0.5 if model_type == "glm4" else 1.0
            ),
            n_shared_experts=config.get("n_shared_experts") or 0,
            first_k_dense_replace=config.get("first_k_dense_replace", 0),
            routed_scaling_factor=config.get("routed_scaling_factor", 1.0),
            n_group=config.get("n_group"),
            topk_group=config.get("topk_group"),
            topk_method=(
                "noaux_tc"
                if model_type == "deepseek_v3"
                else config.get("topk_method", "greedy")
            ),
            moe_layers=(
                tuple(moe_layers)
                if model_type == "llama4_text" and moe_layers is not None
                else None
            ),
            attention_chunk_size=(
                config.get("attention_chunk_size", 8192)
                if model_type == "llama4_text"
                else None
            ),
            attn_temperature_tuning=(
                model_type == "llama4_text"
                and bool(config.get("attn_temperature_tuning", True))
            ),
            floor_scale=float(config.get("floor_scale", 8192)),
            attn_scale=float(config.get("attn_scale", 0.1)),
            qk_norm_l2=(
                model_type == "llama4_text"
                and bool(config.get("use_qk_norm", True))
            ),
            rope_local_base_freq=(
                config.get("rope_local_base_freq", 10000.0)
                if model_type == "gemma3_text"
                else None
            ),
        )

    @classmethod
    def from_pretrained(cls, model_path: Path) -> "ModelConfig":
        with open(Path(model_path) / "config.json") as f:
            return cls.from_hf_config(json.load(f))


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(
    x: jnp.ndarray, weight: jnp.ndarray, eps: float, plus_one: bool = False
) -> jnp.ndarray:
    """RMSNorm in fp32. ``plus_one``: Gemma stores zero-centered weights and
    multiplies by (1 + w)."""
    x32 = x.astype(jnp.float32)
    normed = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    w32 = weight.astype(jnp.float32)
    if plus_one:
        w32 = 1.0 + w32
    return (normed * w32).astype(x.dtype)


def _rope_inv_freq(cfg: ModelConfig, seq_len: int = 0) -> tuple:
    """Rotary inverse frequencies + cos/sin post-scale, honoring the
    configured rope_scaling (llama3, linear, longrope, yarn). Unknown
    scaling types raise: silently ignoring them produces plausible-looking
    but wrong logits."""
    head_dim = cfg.rope_dims
    inv_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    scaling = cfg.rope_scaling or {}
    rope_type = scaling.get("rope_type", scaling.get("type"))
    if rope_type == "longrope":
        # phi3 (transformers modeling_rope_utils._compute_longrope_parameters)
        original = (
            cfg.original_max_position_embeddings or cfg.max_position_embeddings
        )
        factor = scaling.get("factor")
        if cfg.original_max_position_embeddings:
            factor = cfg.max_position_embeddings / original
        attention_factor = scaling.get("attention_factor")
        if attention_factor is None:
            attention_factor = (
                1.0
                if (factor or 1.0) <= 1.0
                else float(np.sqrt(1 + np.log(factor) / np.log(original)))
            )
        ext = np.asarray(
            scaling["long_factor"] if seq_len > original else scaling["short_factor"],
            dtype=np.float64,
        )
        inv_freq = inv_freq / ext
        return inv_freq.astype(np.float32), float(attention_factor)
    if rope_type == "yarn":
        # transformers modeling_rope_utils._compute_yarn_parameters (the
        # DeepSeek V2/V3 context extension; attention_factor multiplies
        # cos/sin, and V3 additionally folds mscale_all_dim into the score
        # scale — see ModelConfig.mla_softmax_scale)
        factor = scaling["factor"]
        attention_factor = scaling.get("attention_factor")
        mscale = scaling.get("mscale")
        mscale_all_dim = scaling.get("mscale_all_dim")
        original = (
            scaling.get("original_max_position_embeddings")
            or cfg.max_position_embeddings
        )

        def get_mscale(scale, m=1.0):
            return 1.0 if scale <= 1 else 0.1 * m * np.log(scale) + 1.0

        if attention_factor is None:
            if mscale and mscale_all_dim:
                attention_factor = float(
                    get_mscale(factor, mscale) / get_mscale(factor, mscale_all_dim)
                )
            else:
                attention_factor = float(get_mscale(factor))
        beta_fast = scaling.get("beta_fast") or 32
        beta_slow = scaling.get("beta_slow") or 1

        def correction_dim(n_rot):
            return (
                head_dim
                * np.log(original / (n_rot * 2 * np.pi))
                / (2 * np.log(cfg.rope_theta))
            )

        low, high = correction_dim(beta_fast), correction_dim(beta_slow)
        if scaling.get("truncate", True):
            low, high = np.floor(low), np.ceil(high)
        low = max(low, 0)
        high = min(high, head_dim - 1)
        if low == high:
            high = high + 0.001  # transformers' singularity guard
        ramp = np.clip(
            (np.arange(head_dim // 2, dtype=np.float64) - low) / (high - low),
            0,
            1,
        )
        extrapolation_factor = 1 - ramp
        inv_freq = (inv_freq / factor) * (
            1 - extrapolation_factor
        ) + inv_freq * extrapolation_factor
        return inv_freq.astype(np.float32), float(attention_factor)
    if rope_type == "llama3":
        factor = scaling["factor"]
        low = scaling["low_freq_factor"]
        high = scaling["high_freq_factor"]
        original = scaling["original_max_position_embeddings"]
        wavelen = 2 * np.pi / inv_freq
        low_wavelen = original / low
        high_wavelen = original / high
        scaled = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
        smooth = (original / wavelen - low) / (high - low)
        smoothed = (1 - smooth) * inv_freq / factor + smooth * inv_freq
        is_medium = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
        inv_freq = np.where(is_medium, smoothed, scaled)
    elif rope_type == "linear":
        inv_freq = inv_freq / scaling["factor"]
    elif rope_type is not None:
        raise NotImplementedError(
            f"rope_scaling type {rope_type!r} is not supported "
            "(supported: llama3, linear, longrope, yarn)"
        )
    return inv_freq.astype(np.float32), 1.0


def rope_tables(cfg: ModelConfig, max_len: int) -> Tuple[jnp.ndarray, ...]:
    """(cos, sin) rotary tables — or gemma3's DUAL tables
    (cos_g, sin_g, cos_l, sin_l): global layers rope at rope_theta with
    rope_scaling, sliding (local) layers at rope_local_base_freq with no
    scaling (HF Gemma3TextModel.rotary_emb / rotary_emb_local). Callers
    that pass ``rope`` opaquely into :func:`forward` need no change; the
    per-layer selection is :func:`layer_rope`."""
    inv_freq, attention_factor = _rope_inv_freq(cfg, seq_len=max_len)
    t = np.arange(max_len, dtype=np.float32)
    freqs = np.outer(t, inv_freq)  # (max_len, head_dim/2)
    emb = np.concatenate([freqs, freqs], axis=-1)
    tables = (
        jnp.asarray(np.cos(emb) * attention_factor),
        jnp.asarray(np.sin(emb) * attention_factor),
    )
    if cfg.rope_local_base_freq is None:
        return tables
    import dataclasses

    local_cfg = dataclasses.replace(
        cfg,
        rope_theta=cfg.rope_local_base_freq,
        rope_scaling=None,
        rope_local_base_freq=None,
    )
    return tables + rope_tables(local_cfg, max_len)


def layer_rope(cfg: ModelConfig, rope, layer_idx: int):
    """Per-layer (cos, sin) from a rope_tables result: gemma3's dual
    tables select the LOCAL table on sliding layers (static — layer index
    is a Python int at every call site)."""
    if len(rope) == 4:
        if cfg.layer_is_sliding(layer_idx):
            return rope[2], rope[3]
        return rope[0], rope[1]
    return rope


def _l2_norm(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Weightless RMS normalization in fp32 (HF Llama4TextL2Norm)."""
    x32 = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32 * scale).astype(x.dtype)


def _l2_qk(cfg: ModelConfig, q, k):
    """llama4: weightless L2 q/k norm AFTER rope, rope layers only (HF
    Llama4TextAttention: the qk_norm module exists iff use_qk_norm and
    use_rope). Permutation-invariant, so it commutes with the
    un-interleaved rope layout. Shared by the serving and train blocks."""
    if not cfg.qk_norm_l2:
        return q, k
    return _l2_norm(q, cfg.rms_norm_eps), _l2_norm(k, cfg.rms_norm_eps)


def _nope_temp_q(cfg: ModelConfig, q, positions):
    """llama4 NoPE layers: temperature-scaled queries (HF
    Llama4TextAttention.forward, arXiv 2501.19399). ``q``: (B, H, T, D);
    ``positions``: (B, T). Shared by the serving and train blocks."""
    if not cfg.attn_temperature_tuning:
        return q
    scales = (
        jnp.log1p(
            jnp.floor((positions.astype(jnp.float32) + 1.0) / cfg.floor_scale)
        )
        * jnp.float32(cfg.attn_scale)
        + 1.0
    )
    return (q.astype(jnp.float32) * scales[:, None, :, None]).astype(q.dtype)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin, positions):
    # q,k: (B, H, T, D); positions: (B, T)
    cos_p = cos[positions][:, None, :, :]  # (B, 1, T, D)
    sin_p = sin[positions][:, None, :, :]
    q_out = q * cos_p + _rotate_half(q) * sin_p
    k_out = k * cos_p + _rotate_half(k) * sin_p
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def apply_rope_cfg(cfg: ModelConfig, q, k, cos, sin, positions):
    """Rope application honoring partial rotary and interleaved pair
    layouts (glm4 uses both; plain models take the fast path). The
    interleaved form rotates (2i, 2i+1) pairs — un-interleaving to the
    half layout and applying the standard rotation transforms q and k
    consistently, so attention scores are identical (see _uninterleave)."""
    d = cos.shape[-1]
    if d == q.shape[-1] and not cfg.rope_interleave:
        return apply_rope(q, k, cos, sin, positions)
    q_rot, q_pass = q[..., :d], q[..., d:]
    k_rot, k_pass = k[..., :d], k[..., d:]
    if cfg.rope_interleave:
        q_rot = _uninterleave(q_rot)
        k_rot = _uninterleave(k_rot)
    q_rot, k_rot = apply_rope(q_rot, k_rot, cos, sin, positions)
    return (
        jnp.concatenate([q_rot, q_pass], axis=-1),
        jnp.concatenate([k_rot, k_pass], axis=-1),
    )


def embed_matrix(params: Params) -> jnp.ndarray:
    """The embedding table as a raw matrix, dequantizing {'q','scale'}
    leaves. One definition for every forward entry (forward,
    forward_train, pipeline_forward_train) so embedding-dequant semantics
    cannot silently diverge between them."""
    embed = params["embed_tokens"]
    if isinstance(embed, dict):
        from .quant import dequant

        embed = dequant(embed)
    return embed


def matmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ W.T with transparent dequantization.

    ``w`` is either a raw (out, in) array or a quantized dict
    {"q": int8/uint8-packed, "scale": per-output-channel fp}.
    """
    if isinstance(w, dict):
        from .quant import dequant_matmul

        return dequant_matmul(x, w)
    return jax.lax.dot_general(
        x,
        w,
        ((((x.ndim - 1),), (1,)), ((), ())),
        preferred_element_type=x.dtype,
    )


# ---------------------------------------------------------------------------
# Parameter initialization (tests / benchmarks)
# ---------------------------------------------------------------------------

def init_params(cfg: ModelConfig, key, dtype=jnp.bfloat16) -> Params:
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    scale = 0.02

    def dense(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    params: Params = {
        "embed_tokens": dense(keys[0], (cfg.vocab_size, cfg.hidden_size)),
        "norm": (jnp.zeros if cfg.is_gemma else jnp.ones)(
            (cfg.hidden_size,), dtype
        ),
        "layers": [],
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(keys[1], (cfg.vocab_size, cfg.hidden_size))

    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    q_dim = cfg.num_attention_heads * cfg.head_dim
    norm_init = jnp.zeros if cfg.is_gemma else jnp.ones  # gemma: (1+w) form
    for i in range(cfg.num_hidden_layers):
        k = jax.random.split(keys[i + 2], 8)
        if cfg.is_mla:
            H = cfg.num_attention_heads
            mk = jax.random.split(k[0], 4)
            layer = {
                "kv_a_proj": dense(
                    mk[0],
                    (cfg.kv_lora_rank + cfg.qk_rope_head_dim, cfg.hidden_size),
                ),
                "kv_a_layernorm": jnp.ones((cfg.kv_lora_rank,), dtype),
                "kv_b_proj": dense(
                    mk[1],
                    (
                        H * (cfg.qk_nope_head_dim + cfg.v_head_dim),
                        cfg.kv_lora_rank,
                    ),
                ),
                "o_proj": dense(mk[2], (cfg.hidden_size, H * cfg.v_head_dim)),
                "input_layernorm": norm_init((cfg.hidden_size,), dtype),
                "post_attention_layernorm": norm_init((cfg.hidden_size,), dtype),
            }
            if cfg.q_lora_rank:
                qk2 = jax.random.split(mk[3], 2)
                layer["q_a_proj"] = dense(
                    qk2[0], (cfg.q_lora_rank, cfg.hidden_size)
                )
                layer["q_a_layernorm"] = jnp.ones((cfg.q_lora_rank,), dtype)
                layer["q_b_proj"] = dense(
                    qk2[1], (H * cfg.qk_head_dim, cfg.q_lora_rank)
                )
            else:
                layer["q_proj"] = dense(
                    mk[3], (H * cfg.qk_head_dim, cfg.hidden_size)
                )
        else:
            layer = {
                "q_proj": dense(k[0], (q_dim, cfg.hidden_size)),
                "k_proj": dense(k[1], (kv_dim, cfg.hidden_size)),
                "v_proj": dense(k[2], (kv_dim, cfg.hidden_size)),
                "o_proj": dense(k[3], (cfg.hidden_size, q_dim)),
                "post_attention_layernorm": norm_init((cfg.hidden_size,), dtype),
            }
            if not cfg.is_olmo2:  # olmo2 has no input norm (checkpoints
                # omit it; keep init pytrees structurally identical)
                layer["input_layernorm"] = norm_init((cfg.hidden_size,), dtype)
        if cfg.qk_norm:
            qk_init = jnp.zeros if cfg.is_gemma else jnp.ones  # gemma3: 1+w
            layer["q_norm"] = qk_init((cfg.head_dim,), dtype)
            layer["k_norm"] = qk_init((cfg.head_dim,), dtype)
        if cfg.qk_norm_full:  # olmo2
            layer["q_norm"] = jnp.ones((q_dim,), dtype)
            layer["k_norm"] = jnp.ones((kv_dim,), dtype)
        if cfg.is_olmo2:
            layer["post_feedforward_layernorm"] = norm_init(
                (cfg.hidden_size,), dtype
            )
        if (
            cfg.is_gemma2 or cfg.is_gemma3 or cfg.model_type == "glm4"
        ):  # sandwich norms
            layer["pre_feedforward_layernorm"] = norm_init(
                (cfg.hidden_size,), dtype
            )
            layer["post_feedforward_layernorm"] = norm_init(
                (cfg.hidden_size,), dtype
            )
        if cfg.model_type == "gpt_oss":
            layer["sinks"] = jnp.zeros((cfg.num_attention_heads,), dtype)
            inter = cfg.intermediate_size
            gk = jax.random.split(k[4], 5)
            layer["moe_gate"] = dense(
                gk[0], (cfg.num_local_experts, cfg.hidden_size)
            )
            layer["moe_gate_bias"] = jnp.zeros(
                (cfg.num_local_experts,), dtype
            )
            layer["gptoss_experts"] = {
                "gate_up": dense(
                    gk[1], (cfg.num_local_experts, cfg.hidden_size, 2 * inter)
                ),
                "gate_up_bias": jnp.zeros(
                    (cfg.num_local_experts, 2 * inter), dtype
                ),
                "down": dense(
                    gk[2], (cfg.num_local_experts, inter, cfg.hidden_size)
                ),
                "down_bias": jnp.zeros(
                    (cfg.num_local_experts, cfg.hidden_size), dtype
                ),
            }
            if cfg.attention_bias:
                layer["o_bias"] = jnp.zeros((cfg.hidden_size,), dtype)
        elif cfg.num_local_experts > 0 and i >= cfg.first_k_dense_replace:
            moe_inter = cfg.moe_intermediate_size or cfg.intermediate_size
            gk = jax.random.split(k[4], cfg.num_local_experts + 2)
            layer["moe_gate"] = dense(
                gk[0], (cfg.num_local_experts, cfg.hidden_size)
            )
            layer["experts"] = []
            for e in range(cfg.num_local_experts):
                ek = jax.random.split(gk[e + 1], 3)
                layer["experts"].append(
                    {
                        "w1": dense(ek[0], (moe_inter, cfg.hidden_size)),
                        "w3": dense(ek[1], (moe_inter, cfg.hidden_size)),
                        "w2": dense(ek[2], (cfg.hidden_size, moe_inter)),
                    }
                )
            if cfg.topk_method == "noaux_tc":
                layer["gate_bias"] = jnp.zeros(
                    (cfg.num_local_experts,), jnp.float32
                )
            if cfg.n_shared_experts:
                shared_inter = moe_inter * cfg.n_shared_experts
                sk = jax.random.split(gk[-1], 3)
                layer["shared_gate_proj"] = dense(
                    sk[0], (shared_inter, cfg.hidden_size)
                )
                layer["shared_up_proj"] = dense(
                    sk[1], (shared_inter, cfg.hidden_size)
                )
                layer["shared_down_proj"] = dense(
                    sk[2], (cfg.hidden_size, shared_inter)
                )
        else:
            layer["gate_proj"] = dense(
                k[4], (cfg.intermediate_size, cfg.hidden_size)
            )
            layer["up_proj"] = dense(k[5], (cfg.intermediate_size, cfg.hidden_size))
            layer["down_proj"] = dense(
                k[6], (cfg.hidden_size, cfg.intermediate_size)
            )
        if cfg.attention_bias:
            layer["q_bias"] = jnp.zeros((q_dim,), dtype)
            layer["k_bias"] = jnp.zeros((kv_dim,), dtype)
            layer["v_bias"] = jnp.zeros((kv_dim,), dtype)
        params["layers"].append(layer)
    return params


def init_kv_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> Dict[str, jnp.ndarray]:
    if cfg.is_mla:
        # MLA caches the compressed latent + the shared roped key — not
        # per-head K/V (see _attention_mla)
        L = cfg.num_hidden_layers
        return {
            "ckv": jnp.zeros((L, batch, max_len, cfg.kv_lora_rank), dtype),
            "kpe": jnp.zeros((L, batch, max_len, cfg.qk_rope_head_dim), dtype),
        }
    shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _attention(
    cfg, layer, x, cos, sin, positions, kv_bufs, layer_idx, cache_pos, mask,
    use_rope=True,
):
    """Self-attention over the cached keys/values.

    kv_bufs: (k_buf, v_buf), each the FULL stacked (L, B, KVH, S, D) cache
    buffer; layer_idx is this layer's static index into dim 0. The update
    is a dynamic_update_slice at (layer_idx, 0, 0, cache_pos, 0) on the
    whole buffer — with the cache donated at the jit boundary XLA performs
    the per-layer chain in place, where the previous design (per-layer
    slices re-assembled with jnp.stack at the end of ``forward``) copied
    the ENTIRE multi-GiB cache every decode step and capped the measured
    attention bandwidth at ~15% of the HBM roof (docs/DECODE_CONTEXT.json,
    pre-fix rows).
    Returns (output, k_buf, v_buf).
    """
    B, T, _ = x.shape
    H, KVH, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    q = matmul(x, layer["q_proj"])
    k = matmul(x, layer["k_proj"])
    v = matmul(x, layer["v_proj"])
    if "q_bias" in layer:
        q = q + layer["q_bias"]
        k = k + layer["k_bias"]
        v = v + layer["v_bias"]
    if cfg.qk_norm_full:  # olmo2: norm the FULL vectors before head split
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)

    q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, KVH, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, KVH, D).transpose(0, 2, 1, 3)
    if "q_norm" in layer and not cfg.qk_norm_full:
        # qwen3/gemma3: per-head RMSNorm before RoPE (gemma3's weights
        # are zero-centered — the (1+w) form rides cfg.is_gemma)
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps, cfg.is_gemma)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps, cfg.is_gemma)

    if use_rope:  # smollm3/llama4 NoPE layers skip rotary entirely
        q, k = apply_rope_cfg(cfg, q, k, cos, sin, positions)
        q, k = _l2_qk(cfg, q, k)
    else:
        q = _nope_temp_q(cfg, q, positions)

    k_buf, v_buf = kv_bufs
    k_buf = jax.lax.dynamic_update_slice(
        k_buf, k[None], (layer_idx, 0, 0, cache_pos, 0)
    )
    v_buf = jax.lax.dynamic_update_slice(
        v_buf, v[None], (layer_idx, 0, 0, cache_pos, 0)
    )
    k_cache = k_buf[layer_idx]
    v_cache = v_buf[layer_idx]

    group = H // KVH
    S = k_cache.shape[2]
    # (B, KVH, group, T, D) x (B, KVH, S, D) -> (B, KVH, group, T, S)
    qg = q.reshape(B, KVH, group, T, D)
    scale = jnp.sqrt(jnp.float32(cfg.query_pre_attn_scalar or D))
    from .attn_kernels import flash_decode, use_flash_decode

    if use_flash_decode(cfg, layer, T, (B, KVH, group, D), S):
        # decode fast path: stream the bf16 cache through VMEM once
        # (XLA's einsum path prices the same reads at ~15% of the HBM
        # roof — docs/DECODE_CONTEXT.json). Same additive mask, same f32
        # softmax semantics; sinks/softcap/T>1 stay on the path below.
        qk = qg[:, :, :, 0, :].astype(jnp.float32) / scale
        ctx = flash_decode(qk, k_cache, v_cache, mask[:, 0, :])
        out = ctx.reshape(B, H, D).reshape(B, T, H * D)
        out = matmul(out.astype(x.dtype), layer["o_proj"])
        if "o_bias" in layer:
            out = out + layer["o_bias"]
        return out, k_buf, v_buf

    scores = jnp.einsum(
        "bkgtd,bksd->bkgts", qg.astype(jnp.float32), k_cache.astype(jnp.float32)
    ) / scale
    if cfg.attn_logit_softcapping:
        cap = jnp.float32(cfg.attn_logit_softcapping)
        scores = cap * jnp.tanh(scores / cap)
    scores = scores + mask[:, None, None, :, :]  # mask: (B, T, S)
    if "sinks" in layer:
        # gpt-oss attention sinks: a learned per-head logit joins the
        # softmax normalization and its probability mass is dropped
        # (HF modeling_gpt_oss.eager_attention_forward: concat sink column,
        # softmax, slice off) — computed here without materializing the
        # extra column
        sinks = layer["sinks"].astype(jnp.float32).reshape(KVH, group)
        sinks = sinks[None, :, :, None, None]  # (1, KVH, group, 1, 1)
        mx = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sinks)
        e = jnp.exp(scores - mx)
        probs = e / (jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(sinks - mx))
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bksd->bkgtd", probs, v_cache.astype(jnp.float32))
    out = out.reshape(B, H, T, D).transpose(0, 2, 1, 3).reshape(B, T, H * D)
    out = matmul(out.astype(x.dtype), layer["o_proj"])
    if "o_bias" in layer:
        out = out + layer["o_bias"]
    return out, k_buf, v_buf


def _uninterleave(x: jnp.ndarray) -> jnp.ndarray:
    """(..., d) interleaved (even, odd) rope pairs -> half layout
    [evens | odds], after which the standard rotate_half rope applies (HF
    modeling_deepseek_v3.apply_rotary_pos_emb_interleave; deepseek_v2's
    complex-pair form is the same rotation in pair layout — q and k are
    transformed consistently, so attention scores are identical)."""
    d = x.shape[-1]
    return (
        x.reshape(*x.shape[:-1], d // 2, 2)
        .swapaxes(-1, -2)
        .reshape(*x.shape[:-1], d)
    )


def _attention_mla(
    cfg, layer, x, cos, sin, positions, cache_bufs, layer_idx, cache_pos, mask
):
    """DeepSeek multi-head latent attention over a COMPRESSED cache.

    Semantics: HF modeling_deepseek_v3.DeepseekV3Attention.forward (and the
    identically-shaped deepseek_v2 variant) — q (optionally through the
    q_lora bottleneck) splits into per-head no-position and shared roped
    parts; keys/values decompress from a kv_lora_rank latent via kv_b_proj.

    TPU-native design: instead of materializing per-head K/V, the cache
    holds only the (B, S, kv_lora_rank) latent + the (B, S, rope_dims)
    shared roped key, and kv_b_proj is ABSORBED into the query / output
    sides (scores = (W_k^T q_nope)^T c + q_pe k_pe; out = (probs c) W_v) —
    algebraically identical by matmul associativity, and the cache is
    ~(heads x head_dim)/(kv_lora_rank + rope) times smaller (9x for V3).

    cache_bufs: (c_buf (L, B, S, Ckv), pe_buf (L, B, S, Dr)) — the FULL
    stacked buffers, updated in place at layer_idx (same donation-driven
    design as :func:`_attention`).
    Returns (output, c_buf, pe_buf).
    """
    c, k_pe, q_nope, q_pe = _mla_project(cfg, layer, x, cos, sin, positions)

    c_buf, pe_buf = cache_bufs
    c_buf = jax.lax.dynamic_update_slice(
        c_buf, c[None], (layer_idx, 0, cache_pos, 0)
    )
    pe_buf = jax.lax.dynamic_update_slice(
        pe_buf, k_pe[None], (layer_idx, 0, cache_pos, 0)
    )
    out = _mla_attend(
        cfg, layer, x.dtype, q_nope, q_pe, c_buf[layer_idx], pe_buf[layer_idx],
        mask[:, None, :, :],
    )
    return out, c_buf, pe_buf


def _mla_project(cfg, layer, x, cos, sin, positions):
    """MLA projections: (c latent (B, T, Ckv), roped shared key k_pe
    (B, T, Dr), per-head q_nope (B, H, T, Dn), roped q_pe (B, H, T, Dr)).
    Shared between the cached serving path and the cache-free train path."""
    B, T, _ = x.shape
    H = cfg.num_attention_heads
    dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    dc = cfg.kv_lora_rank

    if "q_proj" in layer:  # q_lora_rank is null (V2-Lite)
        q = matmul(x, layer["q_proj"])
    else:
        qa = rms_norm(
            matmul(x, layer["q_a_proj"]), layer["q_a_layernorm"], cfg.rms_norm_eps
        )
        q = matmul(qa, layer["q_b_proj"])
    q = q.reshape(B, T, H, dn + dr).transpose(0, 2, 1, 3)
    q_nope, q_pe = q[..., :dn], q[..., dn:]

    ckv = matmul(x, layer["kv_a_proj"])  # (B, T, Ckv + Dr)
    c = rms_norm(ckv[..., :dc], layer["kv_a_layernorm"], cfg.rms_norm_eps)
    k_pe = ckv[..., dc:][:, None]  # (B, 1, T, Dr) — shared across heads

    q_pe, k_pe = apply_rope_cfg(cfg, q_pe, k_pe, cos, sin, positions)
    return c, k_pe[:, 0], q_nope, q_pe


def _mla_attend(cfg, layer, out_dtype, q_nope, q_pe, c_keys, pe_keys, mask):
    """Absorbed-matmul MLA attention over latent keys: scores =
    (W_k^T q_nope)^T c + q_pe k_pe; out = (probs c) W_v — algebraically
    identical to decompressing per-head K/V by matmul associativity.
    ``c_keys`` (B, S, Ckv) / ``pe_keys`` (B, S, Dr) are the cache arrays
    when serving, or this call's own latents when training.
    ``mask``: additive, broadcastable to (B, H, T, S)."""
    B = q_nope.shape[0]
    T = q_nope.shape[2]
    H = cfg.num_attention_heads
    dn, dv, dc = cfg.qk_nope_head_dim, cfg.v_head_dim, cfg.kv_lora_rank

    wkb = layer["kv_b_proj"]
    if isinstance(wkb, dict):  # int8/int4-quantized (models/quant.py)
        from .quant import dequant

        wkb = dequant(wkb, jnp.float32)
    wkb = wkb.reshape(H, dn + dv, dc)
    w_k = wkb[:, :dn].astype(jnp.float32)  # (H, Dn, Ckv)
    w_v = wkb[:, dn:].astype(jnp.float32)  # (H, Dv, Ckv)

    # absorbed scores: q_nope^T (W_k c) == (W_k^T q_nope)^T c
    q_abs = jnp.einsum("bhtd,hdc->bhtc", q_nope.astype(jnp.float32), w_k)
    scores = jnp.einsum(
        "bhtc,bsc->bhts", q_abs, c_keys.astype(jnp.float32)
    ) + jnp.einsum(
        "bhtd,bsd->bhts", q_pe.astype(jnp.float32), pe_keys.astype(jnp.float32)
    )
    scores = scores * jnp.float32(cfg.mla_softmax_scale)
    scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhts,bsc->bhtc", probs, c_keys.astype(jnp.float32))
    out = jnp.einsum("bhtc,hvc->bhtv", ctx, w_v)  # (B, H, T, Dv)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, H * dv)
    return matmul(out.astype(out_dtype), layer["o_proj"])


def _act(g32: jnp.ndarray, hidden_act: str) -> jnp.ndarray:
    """Gate activation in fp32 — the single source of truth for every FFN
    path (dense, capacity, expert-parallel), so a new activation variant
    cannot silently diverge between them."""
    if hidden_act in ("gelu_pytorch_tanh", "gelu_tanh", "gelu"):
        return jax.nn.gelu(g32, approximate=True)
    return jax.nn.silu(g32)


def _mlp(layer, x, hidden_act: str = "silu"):
    gate = matmul(x, layer["gate_proj"])
    up = matmul(x, layer["up_proj"])
    act = _act(gate.astype(jnp.float32), hidden_act)
    return matmul(act.astype(x.dtype) * up, layer["down_proj"])


def experts_quantized(experts) -> bool:
    """True when per-expert weights are int8/int4 {'q','scale'} dicts
    (models/quant.py) rather than raw matrices — the single predicate the
    dispatchers and stackers share."""
    return isinstance(experts[0]["w1"], dict)


def _expert_mlp_weights(layer, e: int):
    """Expert ``e``'s SwiGLU matrices as an ``_mlp`` layer dict, from either
    the per-expert list (``experts``) or the stacked ``(W1, W3, W2)`` tuple
    (``experts_stacked`` — serving's capacity dispatch and the pipeline-
    parallel stage stacking both use it). Slicing the stacked arrays keeps
    the dense-and-mask loop numerically identical across representations."""
    if "experts_stacked" in layer:
        W1, W3, W2 = layer["experts_stacked"]

        def sl(W):
            # quantized stacks carry parallel {'q','scale'} (S-stripped)
            # (E, ...) buffers — slice both; matmul dequantizes the dict
            return (
                {k: v[e] for k, v in W.items()}
                if isinstance(W, dict)
                else W[e]
            )

        return {"gate_proj": sl(W1), "up_proj": sl(W3), "down_proj": sl(W2)}
    ex = layer["experts"][e]
    return {"gate_proj": ex["w1"], "up_proj": ex["w3"], "down_proj": ex["w2"]}


def _moe(cfg: ModelConfig, layer, x):
    """Mixtral block-sparse MoE (HF MixtralSparseMoeBlock semantics):
    softmax router -> top-k experts -> renormalized weights -> SwiGLU experts.

    Computes all experts densely and masks — exact, static-shaped, and
    MXU-friendly at merge-validation scale; capacity-based dispatch is a
    serving optimization, not a numerics change.
    """
    B, T, E = x.shape
    n_exp = cfg.num_local_experts
    k = cfg.num_experts_per_tok

    router_logits = matmul(x, layer["moe_gate"]).astype(jnp.float32)  # (B,T,n)
    probs = jax.nn.softmax(router_logits, axis=-1)
    topk_probs, topk_idx = jax.lax.top_k(probs, k)
    if cfg.norm_topk_prob:  # mixtral always; qwen3-moe per config
        topk_probs = topk_probs / jnp.sum(topk_probs, axis=-1, keepdims=True)
    # dense per-expert weights: (B, T, n_exp)
    onehot = jax.nn.one_hot(topk_idx, n_exp, dtype=probs.dtype)  # (B,T,k,n)
    weights = jnp.einsum("btk,btkn->btn", topk_probs, onehot)

    out = jnp.zeros_like(x, dtype=jnp.float32)
    for e in range(n_exp):
        h = _mlp(_expert_mlp_weights(layer, e), x, cfg.hidden_act)
        out = out + h.astype(jnp.float32) * weights[..., e : e + 1]
    return out.astype(x.dtype)


def deepseek_topk(cfg: ModelConfig, gate_w, gate_bias, x):
    """DeepSeek expert routing -> (topk_idx, topk_w), each (..., k).

    V3 ("noaux_tc", HF modeling_deepseek_v3.DeepseekV3TopkRouter): sigmoid
    scores; selection adds e_score_correction_bias, group score = sum of the
    top-2 biased scores per group, top `topk_group` groups survive, biased
    scores outside them are masked to 0.0 before the top-k; the WEIGHTS are
    the unbiased sigmoid scores, normalized over the top-k when
    norm_topk_prob, then scaled by routed_scaling_factor.

    V2 ("greedy" / "group_limited_greedy", HF deepseek_v2.DeepseekV2MoEGate):
    softmax scores; group score = per-group max; weights come straight from
    the (masked) scores scaled by routed_scaling_factor — the HF V2 port
    never applies norm_topk_prob (quirk reproduced).
    """
    n_exp = cfg.num_local_experts
    k = cfg.num_experts_per_tok
    v3 = cfg.topk_method == "noaux_tc"

    logits = jnp.einsum(
        "...e,ne->...n", x.astype(jnp.float32), gate_w.astype(jnp.float32)
    )
    scores = jax.nn.sigmoid(logits) if v3 else jax.nn.softmax(logits, axis=-1)

    choice = scores
    if v3:
        choice = scores + gate_bias.astype(jnp.float32)
    if cfg.topk_method in ("noaux_tc", "group_limited_greedy") and cfg.n_group:
        G = cfg.n_group
        grouped = choice.reshape(*choice.shape[:-1], G, n_exp // G)
        if v3:
            top2, _ = jax.lax.top_k(grouped, min(2, n_exp // G))
            group_scores = jnp.sum(top2, axis=-1)
        else:
            group_scores = jnp.max(grouped, axis=-1)
        _, group_idx = jax.lax.top_k(group_scores, cfg.topk_group)
        group_mask = jnp.sum(
            jax.nn.one_hot(group_idx, G, dtype=jnp.bool_), axis=-2
        )
        keep = jnp.repeat(group_mask, n_exp // G, axis=-1)
        choice = jnp.where(keep, choice, 0.0)

    topk_choice, topk_idx = jax.lax.top_k(choice, k)
    if v3:
        # weights are the UNBIASED scores at the selected experts
        topk_w = jnp.take_along_axis(scores, topk_idx, axis=-1)
        if cfg.norm_topk_prob:
            topk_w = topk_w / (jnp.sum(topk_w, axis=-1, keepdims=True) + 1e-20)
    else:
        topk_w = topk_choice
    return topk_idx, topk_w * jnp.float32(cfg.routed_scaling_factor)


def deepseek_router(cfg: ModelConfig, layer, x):
    """Dense per-expert weights (B, T, n_exp) from :func:`deepseek_topk`."""
    topk_idx, topk_w = deepseek_topk(
        cfg, layer["moe_gate"], layer.get("gate_bias"), x
    )
    onehot = jax.nn.one_hot(topk_idx, cfg.num_local_experts, dtype=jnp.float32)
    return jnp.einsum("btk,btkn->btn", topk_w, onehot)


def _shared_experts_out(cfg: ModelConfig, layer, x):
    if "shared_gate_proj" not in layer:
        return None
    return _mlp(
        {
            "gate_proj": layer["shared_gate_proj"],
            "up_proj": layer["shared_up_proj"],
            "down_proj": layer["shared_down_proj"],
        },
        x,
        cfg.hidden_act,
    )


def _moe_deepseek_capacity(cfg: ModelConfig, layer, x, capacity_factor):
    """Capacity-dispatch form of :func:`_moe_deepseek` (serving path): the
    deepseek top-k routes into fixed-capacity expert blocks exactly like
    :func:`_moe_capacity` — essential at V3 scale (256 routed experts make
    the dense-and-mask loop 32x the useful FLOPs)."""
    B, T, E = x.shape
    n_exp = cfg.num_local_experts
    k = cfg.num_experts_per_tok
    S = B * T
    C = min(int(np.ceil(S * k / n_exp * capacity_factor)), S)

    xf = x.reshape(S, E)
    topk_idx, topk_w = deepseek_topk(
        cfg, layer["moe_gate"], layer.get("gate_bias"), xf
    )
    gather_idx, w_slot = capacity_tables_from_topk(topk_idx, topk_w, n_exp, C)
    if "experts_stacked" in layer:
        W1, W3, W2 = layer["experts_stacked"]
    else:
        W1 = jnp.stack([e["w1"] for e in layer["experts"]])
        W3 = jnp.stack([e["w3"] for e in layer["experts"]])
        W2 = jnp.stack([e["w2"] for e in layer["experts"]])
    out = capacity_experts_apply(
        xf, gather_idx, w_slot, W1, W3, W2, cfg.hidden_act
    ).reshape(B, T, E)
    shared = _shared_experts_out(cfg, layer, x)
    if shared is not None:
        out = out + shared.astype(jnp.float32)
    return out.astype(x.dtype)


def _moe_deepseek(cfg: ModelConfig, layer, x):
    """DeepSeek MoE block: routed experts (dense-mask accumulation, like
    :func:`_moe`) + the always-on shared-experts MLP
    (HF modeling_deepseek_v3.DeepseekV3MoE.forward)."""
    quantized = "experts" in layer and experts_quantized(layer["experts"])
    if cfg.moe_dispatch == "capacity" and not quantized:
        return _moe_deepseek_capacity(cfg, layer, x, cfg.moe_capacity_factor)
    weights = deepseek_router(cfg, layer, x)
    out = jnp.zeros_like(x, dtype=jnp.float32)
    for e in range(cfg.num_local_experts):
        h = _mlp(_expert_mlp_weights(layer, e), x, cfg.hidden_act)
        out = out + h.astype(jnp.float32) * weights[..., e : e + 1]
    shared = _shared_experts_out(cfg, layer, x)
    if shared is not None:
        out = out + shared.astype(jnp.float32)
    return out.astype(x.dtype)


def _moe_gptoss(cfg: ModelConfig, layer, x):
    """GPT-OSS MoE block (HF modeling_gpt_oss.GptOssMLP semantics).

    Router: biased linear -> top-k of the RAW logits -> softmax over just
    the top-k values, scattered dense. Experts: fused gate_up_proj with
    INTERLEAVED gate/up columns, biases, asymmetric clamps (gate <= limit,
    |up| <= limit), glu = gate * sigmoid(gate * 1.702), out =
    (up + 1) * glu @ down + down_bias — every expert weighted by its dense
    score (HF's batched-bmm inference path, one einsum chain on the MXU).
    """
    e = layer["gptoss_experts"]
    scores = gptoss_router_scores(cfg, layer, x)
    out = _gptoss_expert_math(
        x, e["gate_up"], e["gate_up_bias"], e["down"], e["down_bias"], scores
    )
    return out.astype(x.dtype)


def gptoss_router_scores(cfg: ModelConfig, layer, x):
    """gpt-oss dense router scores (B, T, n_exp): biased linear -> top-k
    of the RAW logits -> softmax over just the top-k values, scattered
    dense. Deterministic and replicable, so expert-sharded bodies compute
    it identically on every rank and slice their experts' columns."""
    k = cfg.num_experts_per_tok
    n_exp = cfg.num_local_experts
    logits = jnp.einsum(
        "bte,ne->btn",
        x.astype(jnp.float32),
        layer["moe_gate"].astype(jnp.float32),
    ) + layer["moe_gate_bias"].astype(jnp.float32)
    top_v, top_i = jax.lax.top_k(logits, k)
    top_v = jax.nn.softmax(top_v, axis=-1)
    onehot = jax.nn.one_hot(top_i, n_exp, dtype=jnp.float32)
    return jnp.einsum("btk,btkn->btn", top_v, onehot)


def _gptoss_expert_math(x, gate_up_w, gate_up_bias, down_w, down_bias, scores):
    """The gpt-oss fused-expert SwiGLU, score-weighted and summed over the
    GIVEN experts — shared by the full dense-and-mask block and the
    expert-sharded cp body (which passes LOCAL expert slices + the
    matching score columns; the partial sums psum over 'tp'). Returns
    fp32 (B, T, hidden)."""
    if isinstance(gate_up_w, dict):  # int8/int4 stacked (models/quant.py)
        from .quant import dequant_stacked

        gate_up_w = dequant_stacked(gate_up_w, x.dtype)
        down_w = dequant_stacked(down_w, x.dtype)

    # gate_up: (n_exp, hidden, 2*inter) with interleaved gate/up columns
    gu = jnp.einsum("btd,edi->btei", x, gate_up_w) + gate_up_bias
    gate = gu[..., ::2]
    up = gu[..., 1::2]
    limit = jnp.asarray(7.0, gu.dtype)
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    g32 = gate.astype(jnp.float32)
    glu = (g32 * jax.nn.sigmoid(g32 * 1.702)).astype(gu.dtype)
    h = (up + 1.0) * glu
    out = jnp.einsum("btei,eid->bted", h, down_w) + down_bias
    return jnp.sum(out.astype(jnp.float32) * scores[..., None], axis=2)


def _moe_llama4(cfg: ModelConfig, layer, x):
    """Llama-4 MoE block (HF modeling_llama4.Llama4TextMoe.forward).

    Router: linear logits -> top-k -> SIGMOID of the selected logits, zero
    elsewhere. The score scales each expert's INPUT, not its output (HF
    routed_in = hidden * router_scores before the expert bmm) — not
    equivalent to output scaling through the nonlinearity, so reproduced
    exactly. Experts run dense-and-mask: a zero-scaled input produces a
    zero output through the bias-free SwiGLU, so unselected (expert, token)
    pairs contribute exactly 0. An always-on shared MLP adds in.

    Expert weights stay in HF's fused layout: gate_up (E, hidden, 2I) with
    gate/up as contiguous HALVES (unlike gpt-oss's interleaved columns),
    down (E, I, hidden).
    """
    e = layer["llama4_experts"]
    k = cfg.num_experts_per_tok
    n_exp = cfg.num_local_experts
    B, T, Dh = x.shape
    xf = x.reshape(B * T, Dh).astype(jnp.float32)

    logits = xf @ layer["moe_gate"].astype(jnp.float32).T  # (N, E)
    _, top_i = jax.lax.top_k(logits, k)
    sel = jnp.sum(jax.nn.one_hot(top_i, n_exp, dtype=jnp.float32), axis=1)
    scores = jax.nn.sigmoid(logits) * sel  # (N, E)

    gate_up_w, down_w = e["gate_up"], e["down"]
    if isinstance(gate_up_w, dict):  # int8/int4 stacked (models/quant.py)
        from .quant import dequant_stacked

        gate_up_w = dequant_stacked(gate_up_w, jnp.float32)
        down_w = dequant_stacked(down_w, jnp.float32)

    scaled = xf[None, :, :] * scores.T[:, :, None]  # (E, N, Dh)
    gu = jnp.einsum("enh,ehi->eni", scaled, gate_up_w.astype(jnp.float32))
    gate, up = jnp.split(gu, 2, axis=-1)
    h = _act(gate, cfg.hidden_act) * up
    routed = jnp.einsum("eni,eih->nh", h, down_w.astype(jnp.float32))
    out = routed.reshape(B, T, Dh)
    shared = _shared_experts_out(cfg, layer, x)
    if shared is not None:
        out = out + shared.astype(jnp.float32)
    return out.astype(x.dtype)


def capacity_tables_from_topk(topk_idx, topk_probs, n_exp: int, capacity: int):
    """Dispatch tables from per-token top-k choices: gather_idx (n_exp, C)
    of token ids per expert slot (S = padding row for empty/overflow slots)
    and w_slot (n_exp, C) routing weights. Static shapes; tokens beyond an
    expert's capacity are dropped (the standard capacity trade-off)."""
    S, k = topk_idx.shape
    # flatten the S*k assignments and rank each within its expert
    expert_ids = topk_idx.reshape(-1)  # (S*k,)
    token_ids = jnp.repeat(jnp.arange(S, dtype=jnp.int32), k)
    weights = topk_probs.reshape(-1).astype(jnp.float32)
    onehot = jax.nn.one_hot(expert_ids, n_exp, dtype=jnp.int32)  # (S*k, n)
    pos = jnp.sum((jnp.cumsum(onehot, axis=0) - 1) * onehot, axis=1)  # (S*k,)
    slot = jnp.minimum(pos, capacity)  # overflow lands in a trash column

    gather_idx = jnp.full((n_exp, capacity + 1), S, jnp.int32)
    gather_idx = gather_idx.at[expert_ids, slot].set(token_ids)
    w_slot = jnp.zeros((n_exp, capacity + 1), jnp.float32)
    w_slot = w_slot.at[expert_ids, slot].set(weights)
    return gather_idx[:, :capacity], w_slot[:, :capacity]


def capacity_tables(router_probs, k: int, capacity: int, norm_topk: bool = True):
    """Token->expert dispatch tables for capacity-based MoE (mixtral /
    qwen3-moe semantics: top-k of softmax probabilities, renormalized over
    the top-k when ``norm_topk``). From (S, n_exp) router probabilities."""
    _, n_exp = router_probs.shape
    topk_probs, topk_idx = jax.lax.top_k(router_probs, k)
    if norm_topk:
        topk_probs = topk_probs / jnp.sum(topk_probs, axis=-1, keepdims=True)
    return capacity_tables_from_topk(topk_idx, topk_probs, n_exp, capacity)


def capacity_experts_apply(xf, gather_idx, w_slot, W1, W3, W2, hidden_act):
    """Gather tokens into expert blocks, run the batched SwiGLU einsums on
    the MXU, scatter back weighted. xf: (S, E) tokens; W*: stacked
    (n_exp, ., .) expert weights (may be a local expert slice, with
    gather_idx/w_slot sliced to match). Returns fp32 (S, E)."""
    S, E = xf.shape
    xpad = jnp.concatenate([xf, jnp.zeros((1, E), xf.dtype)])  # row S = zero
    xe = xpad[gather_idx]  # (n_exp, C, E)

    gate = jnp.einsum("ecd,eid->eci", xe, W1)  # d = hidden, i = intermediate
    up = jnp.einsum("ecd,eid->eci", xe, W3)
    act = _act(gate.astype(jnp.float32), hidden_act)
    h = act.astype(xe.dtype) * up
    ye = jnp.einsum("eci,edi->ecd", h, W2)  # (n_exp, C, E)

    contrib = ye.astype(jnp.float32) * w_slot[..., None]
    out = jnp.zeros((S + 1, E), jnp.float32)
    out = out.at[gather_idx.reshape(-1)].add(contrib.reshape(-1, E))
    return out[:S]


def _moe_capacity(cfg: ModelConfig, layer, x, capacity_factor: float = 1.25):
    """Capacity-based sparse MoE dispatch (serving path).

    Instead of computing every expert densely (O(n_experts) FLOPs,
    :func:`_moe`), tokens are gathered into fixed-capacity per-expert
    blocks — C = ceil(tokens*k/n_experts * capacity_factor) — batched
    through the expert SwiGLUs as one (n_exp, C, ·) einsum chain on the
    MXU, and scattered back weighted. Static shapes throughout (XLA-
    friendly); with capacity_factor >= n_experts/k it is exact and matches
    :func:`_moe` to float tolerance. parallel/moe.py shards this over an
    expert-parallel mesh axis.
    """
    B, T, E = x.shape
    n_exp = cfg.num_local_experts
    k = cfg.num_experts_per_tok
    S = B * T
    C = min(int(np.ceil(S * k / n_exp * capacity_factor)), S)

    xf = x.reshape(S, E)
    router_logits = matmul(xf, layer["moe_gate"]).astype(jnp.float32)
    probs = jax.nn.softmax(router_logits, axis=-1)
    gather_idx, w_slot = capacity_tables(probs, k, C, cfg.norm_topk_prob)

    if "experts_stacked" in layer:  # pre-stacked once (stack_expert_weights)
        W1, W3, W2 = layer["experts_stacked"]
    else:
        W1 = jnp.stack([e["w1"] for e in layer["experts"]])  # (n_exp, I, E)
        W3 = jnp.stack([e["w3"] for e in layer["experts"]])
        W2 = jnp.stack([e["w2"] for e in layer["experts"]])  # (n_exp, E, I)
    out = capacity_experts_apply(
        xf, gather_idx, w_slot, W1, W3, W2, cfg.hidden_act
    )
    return out.reshape(B, T, E).astype(x.dtype)


def stack_expert_weights(params: Params) -> bool:
    """Convert per-expert weight dicts to stacked (n_exp, ., .) arrays for
    the capacity dispatch: ``layer["experts_stacked"] = (W1, W3, W2)``,
    replacing ``layer["experts"]`` so expert HBM is not held twice. Done
    once at load time — re-stacking inside every jitted forward would
    materialize a copy of all expert weights per MoE layer per call.

    Returns False (and changes nothing) when experts are quantized: the
    capacity einsums need raw matrices, so quantized MoE serves via the
    dense-and-mask path.
    """
    layers = params.get("layers", [])
    if not any("experts" in layer for layer in layers):
        return False
    for layer in layers:
        if "experts" in layer and experts_quantized(layer["experts"]):
            return False  # quantized: caller should warn + use dense
    for layer in layers:
        if "experts" not in layer:
            continue
        experts = layer.pop("experts")
        layer["experts_stacked"] = (
            jnp.stack([e["w1"] for e in experts]),
            jnp.stack([e["w3"] for e in experts]),
            jnp.stack([e["w2"] for e in experts]),
        )
    return True


def _ffn(cfg: ModelConfig, layer, x):
    if "gptoss_experts" in layer:
        return _moe_gptoss(cfg, layer, x)
    if "llama4_experts" in layer:
        return _moe_llama4(cfg, layer, x)
    has_experts = "experts" in layer or "experts_stacked" in layer
    if cfg.model_type.startswith("deepseek") and has_experts:
        return _moe_deepseek(cfg, layer, x)  # dense first_k layers: _mlp
    if has_experts:
        # dispatch follows the CONFIG, not the weight representation:
        # serving stacks experts only under moe_dispatch="capacity"
        # (inference.py), while pipeline stages stack them for ANY dispatch
        # (parallel/pipeline.py) and dense-and-mask must stay available
        # there for exactness
        quantized = "experts" in layer and experts_quantized(
            layer["experts"]
        )
        if cfg.moe_dispatch == "capacity" and not quantized:
            return _moe_capacity(cfg, layer, x, cfg.moe_capacity_factor)
        return _moe(cfg, layer, x)
    return _mlp(layer, x, cfg.hidden_act)


def forward(
    params: Params,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,  # (B, T)
    positions: jnp.ndarray,  # (B, T)
    kv_cache: Dict[str, jnp.ndarray],
    cache_pos,  # scalar: write offset into the cache
    rope: Tuple[jnp.ndarray, jnp.ndarray],
    attn_len,  # scalar: number of valid cache slots after this call
    mask_positions: Optional[jnp.ndarray] = None,  # (B, T) slot indices
    token_valid: Optional[jnp.ndarray] = None,  # (B, S) bool
    key_positions: Optional[jnp.ndarray] = None,  # (B, S) true positions
):
    """One forward pass (prefill when T>1, decode when T==1).

    Batched serving (inference.generate_batch) left-pads ragged prompts to
    one length; ``token_valid`` masks the pad slots out of attention and
    ``mask_positions`` carries the cache-SLOT index of each query (its
    causal horizon) while ``positions`` stays the RoPE position (slot minus
    pad count). Both default to the single-sequence behavior where slot
    index == position. Sliding windows stay exact under left padding: a
    row's pad count shifts its query and key slots equally, so
    ``slot > pos - window`` reduces to the same true-position inequality as
    the unpadded case, and ``token_valid`` removes the pad slots.

    ``key_positions`` covers caches where slot minus position is NOT one
    constant per row — the continuous-batching pool, whose rows carry a
    dead gap between an implanted prompt and the slots decoded after
    joining (batching.ContinuousEngine). It maps every cache slot to the
    TRUE sequence position of the token stored there, and the sliding
    window then compares positions on both sides (query ``positions`` vs
    ``key_positions``) instead of slot distance, which would count the
    gap as elapsed tokens. Causality stays slot-ordered (slots are filled
    in temporal order per row) and gap slots are excluded by
    ``token_valid``, so their ``key_positions`` entries are never read.

    Returns (logits fp32 (B, T, V), new kv_cache).
    """
    x = embed_matrix(params)[input_ids]
    po = cfg.is_gemma  # (1+w) norms
    if cfg.is_gemma:
        # HF Gemma scales embeddings by sqrt(hidden), normalizer cast to dtype
        x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)

    B, T = input_ids.shape
    S = (
        kv_cache["ckv"].shape[2] if cfg.is_mla else kv_cache["k"].shape[3]
    )
    # causal mask over cache slots: the query at slot index p attends to
    # cache slots [0, p]; slots beyond attn_len (and padding slots, when
    # token_valid is given) are invalid.
    slot = jnp.arange(S)[None, None, :]  # (1, 1, S)
    mpos = positions if mask_positions is None else mask_positions
    pos = mpos[:, :, None]  # (B, T, 1)
    valid = (slot <= pos) & (slot < attn_len)
    if token_valid is not None:
        valid = valid & token_valid[:, None, :]
    mask = jnp.where(valid, 0.0, jnp.float32(-1e9))
    mask_sliding = None
    if cfg.sliding_window is not None:
        if key_positions is None:
            recent = slot > pos - cfg.sliding_window
        else:
            # position-space window: exact when cache slots are not
            # contiguous in sequence position (gapped continuous-batch rows)
            recent = (
                key_positions[:, None, :]
                > positions[:, :, None] - cfg.sliding_window
            )
        valid_sl = valid & recent
        mask_sliding = jnp.where(valid_sl, 0.0, jnp.float32(-1e9))
    mask_chunked = None
    if cfg.attention_chunk_size is not None:
        # llama4 chunked attention: position j is visible to position i iff
        # they share the attention_chunk_size-aligned chunk, i.e.
        # j >= floor(i / C) * C (HF create_chunked_causal_mask). Compared in
        # POSITION space: under left padding both slot indices shift by the
        # row's pad count, which floor-division does not commute with, so
        # key positions are recovered as slot - pad (pad = mask slot minus
        # rope position, constant per row); gapped continuous-batch rows
        # supply key_positions directly.
        C = cfg.attention_chunk_size
        if key_positions is None:
            kpos = slot - (mpos - positions)[:, :, None]  # (B, T, S)
        else:
            kpos = key_positions[:, None, :]
        chunk_start = (positions[:, :, None] // C) * C
        mask_chunked = jnp.where(
            valid & (kpos >= chunk_start), 0.0, jnp.float32(-1e9)
        )

    mla = cfg.is_mla
    # the stacked cache buffers thread through the layer loop and are
    # returned AS the new cache — no jnp.stack re-assembly (which copied
    # the whole cache per decode step; see _attention's docstring)
    buf_a, buf_b = (
        (kv_cache["ckv"], kv_cache["kpe"])
        if mla
        else (kv_cache["k"], kv_cache["v"])
    )
    for i, layer in enumerate(params["layers"]):
        # olmo2 has no input norm: attention consumes the raw residual
        h = (
            x
            if cfg.is_olmo2
            else rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps, po)
        )
        attn = _attention_mla if mla else _attention
        attn_kwargs = {} if mla else {"use_rope": cfg.layer_uses_rope(i)}
        if cfg.layer_is_chunked(i):
            layer_mask = mask_chunked
        elif cfg.layer_is_sliding(i):
            layer_mask = mask_sliding
        else:
            layer_mask = mask
        cos, sin = layer_rope(cfg, rope, i)  # gemma3: dual tables
        attn_out, buf_a, buf_b = attn(
            cfg,
            layer,
            h,
            cos,
            sin,
            positions,
            (buf_a, buf_b),
            i,
            cache_pos,
            layer_mask,
            **attn_kwargs,
        )
        if cfg.is_olmo2:  # post-norm residuals, no pre-FFN norm
            x = x + rms_norm(
                attn_out, layer["post_attention_layernorm"], cfg.rms_norm_eps
            )
            x = x + rms_norm(
                _ffn(cfg, layer, x),
                layer["post_feedforward_layernorm"],
                cfg.rms_norm_eps,
            )
        elif "pre_feedforward_layernorm" in layer:  # gemma2 post-norm blocks
            x = x + rms_norm(
                attn_out, layer["post_attention_layernorm"], cfg.rms_norm_eps, po
            )
            h = rms_norm(
                x, layer["pre_feedforward_layernorm"], cfg.rms_norm_eps, po
            )
            x = x + rms_norm(
                _ffn(cfg, layer, h),
                layer["post_feedforward_layernorm"],
                cfg.rms_norm_eps,
                po,
            )
        else:
            x = x + attn_out
            h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps, po)
            x = x + _ffn(cfg, layer, h)

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps, po)
    head = params.get("lm_head", params["embed_tokens"])
    logits = matmul(x, head).astype(jnp.float32)
    if cfg.final_logit_softcapping:
        cap = jnp.float32(cfg.final_logit_softcapping)
        logits = cap * jnp.tanh(logits / cap)

    if mla:
        return logits, {"ckv": buf_a, "kpe": buf_b}
    return logits, {"k": buf_a, "v": buf_b}


def block_train(
    cfg: ModelConfig,
    layer,
    x,
    cos,
    sin,
    positions,
    mask,
    reduce=None,
    use_rope=True,
    qk_stat_reduce=None,
    attend=None,
    ffn=None,
):
    """One cache-free decoder block (attention + FFN with residuals).

    The body of forward_train's layer loop, factored out so the pipeline-
    parallel schedule (parallel/pipeline.py) can lax.scan the SAME math over
    a stage's stacked layer weights. ``mask``: (T, S) additive.
    Differentiable.

    ``reduce``: optional partial-sum reduction applied to the attention
    output (after o_proj) and the FFN output (after down_proj) — the two
    row-parallel matmuls of Megatron tensor parallelism. With weights
    column/row-sliced per device and ``cfg`` scaled to the local head
    counts, ``reduce=lambda y: psum(y, 'tp')`` makes this block the manual-
    TP variant; None (default) is the single-device block.
    """
    B, T, _ = x.shape
    H, KVH, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    po = cfg.is_gemma

    h = (
        x
        if cfg.is_olmo2  # olmo2: no input norm (post-norm residuals)
        else rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps, po)
    )
    if cfg.is_mla:
        # DeepSeek MLA, cache-free: attend over this call's own latents
        # (S = T). Same projections and absorbed matmuls as serving
        # (_mla_project/_mla_attend); deepseek has no sliding windows or
        # NoPE layers, so mask/use_rope scheduling does not apply. Falls
        # through to the SAME reduce/residual/FFN tail as every other
        # attention variant.
        c, k_pe, q_nope, q_pe = _mla_project(
            cfg, layer, h, cos, sin, positions
        )
        attn_out = _mla_attend(
            cfg, layer, x.dtype, q_nope, q_pe, c, k_pe, mask[None, None]
        )
        return _block_tail(cfg, layer, x, attn_out, reduce, po, ffn)
    q = matmul(h, layer["q_proj"])
    k = matmul(h, layer["k_proj"])
    v = matmul(h, layer["v_proj"])
    if "q_bias" in layer:
        q = q + layer["q_bias"]
        k = k + layer["k_bias"]
        v = v + layer["v_bias"]
    if cfg.qk_norm_full:  # olmo2: norm the FULL vectors before head split
        if qk_stat_reduce is None:
            q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)
        else:
            # Megatron TP: each device holds a head slice of q/k, but the
            # RMS statistic spans the FULL vector — psum the squared sums
            # across 'tp' and divide by the global width. layer["q_norm"]
            # is this device's weight slice (stack_stages shards it).
            n_shards, psum = qk_stat_reduce

            def full_rms(v_, w):
                ss = psum(jnp.sum(jnp.square(v_.astype(jnp.float32)),
                                  axis=-1, keepdims=True))
                dim = v_.shape[-1] * n_shards
                inv = jax.lax.rsqrt(ss / dim + cfg.rms_norm_eps)
                return (
                    v_.astype(jnp.float32) * inv * w.astype(jnp.float32)
                ).astype(v_.dtype)

            q = full_rms(q, layer["q_norm"])
            k = full_rms(k, layer["k_norm"])
    q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, KVH, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, KVH, D).transpose(0, 2, 1, 3)
    if "q_norm" in layer and not cfg.qk_norm_full:
        # qwen3/gemma3: per-head RMSNorm before RoPE (gemma3's weights
        # are zero-centered — the (1+w) form rides cfg.is_gemma)
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps, cfg.is_gemma)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps, cfg.is_gemma)
    # smollm3/llama4 NoPE layers skip rotary entirely. ``use_rope`` may be a
    # traced scalar bool (the pipeline schedule scans layer-index-dependent
    # flags through one compiled body, parallel/pipeline.py): rope is then
    # always computed and selected — branchless, XLA-friendly. The llama4
    # post-rope L2 norm (rope layers) and NoPE temperature scaling follow
    # the same structure so train matches serving exactly.
    if isinstance(use_rope, bool):
        if use_rope:
            q, k = apply_rope_cfg(cfg, q, k, cos, sin, positions)
            q, k = _l2_qk(cfg, q, k)
        else:
            q = _nope_temp_q(cfg, q, positions)
    else:
        qr, kr = apply_rope_cfg(cfg, q, k, cos, sin, positions)
        qr, kr = _l2_qk(cfg, qr, kr)
        q = jnp.where(use_rope, qr, _nope_temp_q(cfg, q, positions))
        k = jnp.where(use_rope, kr, k)

    scale = jnp.sqrt(jnp.float32(cfg.query_pre_attn_scalar or D))
    if attend is not None:
        # context parallelism: the caller supplies the score/softmax/value
        # kernel (e.g. ring attention over a 'cp' axis — parallel/ring.py
        # _ring_body derives causality, windows and chunking from GLOBAL
        # token positions, so ``mask`` is unused here). Softcapping and
        # sinks are the kernel's responsibility too (the caller closes
        # over cfg/layer — see parallel/train.make_cp_loss).
        out = attend(q, k, v, 1.0 / scale)
        out = (
            out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, T, H * D)
        )
        attn_out = matmul(out, layer["o_proj"])
        return _block_tail(cfg, layer, x, attn_out, reduce, po, ffn)
    group = H // KVH
    qg = q.reshape(B, KVH, group, T, D)
    scores = jnp.einsum(
        "bkgtd,bksd->bkgts", qg.astype(jnp.float32), k.astype(jnp.float32)
    ) / scale
    if cfg.attn_logit_softcapping:
        cap = jnp.float32(cfg.attn_logit_softcapping)
        scores = cap * jnp.tanh(scores / cap)
    scores = scores + mask[None, None, None]
    if "sinks" in layer:  # gpt-oss: sink logit joins the normalization
        sinks = layer["sinks"].astype(jnp.float32).reshape(KVH, group)
        sinks = sinks[None, :, :, None, None]
        mx = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sinks)
        e = jnp.exp(scores - mx)
        probs = e / (jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(sinks - mx))
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bksd->bkgtd", probs, v.astype(jnp.float32))
    out = out.reshape(B, H, T, D).transpose(0, 2, 1, 3).reshape(B, T, H * D)
    attn_out = matmul(out.astype(x.dtype), layer["o_proj"])
    return _block_tail(cfg, layer, x, attn_out, reduce, po, ffn)


def _block_tail(cfg: ModelConfig, layer, x, attn_out, reduce, po, ffn=None):
    """The reduce/residual/FFN tail every attention variant shares (single
    source of the Megatron reduce contract and the per-family residual
    structures: olmo2 post-norms, gemma2 sandwich norms, standard
    pre-norm). ``ffn`` substitutes the FFN kernel (same (cfg, layer, x)
    contract as :func:`_ffn`) — the expert-parallel train path routes MoE
    layers through its sharded capacity dispatch this way
    (parallel/moe.make_ep_loss)."""
    ffn = ffn or _ffn
    if reduce is not None:  # TP: o_proj is row-parallel; sum the partials
        attn_out = reduce(attn_out)
    if cfg.is_olmo2:  # post-norm residuals, no pre-FFN norm
        x = x + rms_norm(
            attn_out, layer["post_attention_layernorm"], cfg.rms_norm_eps
        )
        ffn_out = ffn(cfg, layer, x)
        if reduce is not None:
            ffn_out = reduce(ffn_out)
        x = x + rms_norm(
            ffn_out, layer["post_feedforward_layernorm"], cfg.rms_norm_eps
        )
        return x
    if "pre_feedforward_layernorm" in layer:  # gemma2 post-norm blocks
        x = x + rms_norm(
            attn_out, layer["post_attention_layernorm"], cfg.rms_norm_eps, po
        )
        h = rms_norm(
            x, layer["pre_feedforward_layernorm"], cfg.rms_norm_eps, po
        )
        ffn_out = ffn(cfg, layer, h)
        if reduce is not None:
            ffn_out = reduce(ffn_out)
        x = x + rms_norm(
            ffn_out,
            layer["post_feedforward_layernorm"],
            cfg.rms_norm_eps,
            po,
        )
    else:
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps, po)
        ffn_out = ffn(cfg, layer, h)
        if reduce is not None:  # TP: down_proj is row-parallel
            ffn_out = reduce(ffn_out)
        x = x + ffn_out
    return x


def forward_train(
    params: Params,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,
    remat: bool = False,
):
    """Cache-free causal forward for training (B, T) -> fp32 logits (B, T, V).

    Used by parallel/train.py's sharded train step; differentiable.

    ``remat=True`` wraps each block in ``jax.checkpoint``: the backward pass
    recomputes block activations instead of holding every layer's
    intermediates in HBM — activation memory drops from O(layers) to O(1)
    blocks for ~1/3 more FLOPs, the standard TPU trade when HBM, not the
    MXU, binds the step. Numerics are unchanged (same ops, same order).
    """
    B, T = input_ids.shape

    x = embed_matrix(params)[input_ids]
    po = cfg.is_gemma
    if cfg.is_gemma:
        x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)

    rope = rope_tables(cfg, T)
    positions = jnp.arange(T, dtype=jnp.int32)[None, :].repeat(B, axis=0)
    causal = jnp.tril(jnp.ones((T, T), bool))
    mask_full = jnp.where(causal, 0.0, jnp.float32(-1e9))
    mask_sliding = None
    if cfg.sliding_window is not None:
        ii = jnp.arange(T)[:, None]
        jj = jnp.arange(T)[None, :]
        sl = causal & (jj > ii - cfg.sliding_window)
        mask_sliding = jnp.where(sl, 0.0, jnp.float32(-1e9))
    mask_chunked = None
    if cfg.attention_chunk_size is not None:
        # llama4 chunk-aligned local attention (see forward's mask_chunked)
        C = cfg.attention_chunk_size
        ii = jnp.arange(T)[:, None]
        jj = jnp.arange(T)[None, :]
        ch = causal & (jj >= (ii // C) * C)
        mask_chunked = jnp.where(ch, 0.0, jnp.float32(-1e9))

    def blk(layer, x, mask, cos, sin, use_rope):
        return block_train(
            cfg, layer, x, cos, sin, positions, mask, use_rope=use_rope
        )

    if remat:
        blk = jax.checkpoint(blk, static_argnums=(5,))

    for li, layer in enumerate(params["layers"]):
        if cfg.layer_is_chunked(li):
            mask = mask_chunked
        elif cfg.layer_is_sliding(li):
            mask = mask_sliding
        else:
            mask = mask_full
        cos, sin = layer_rope(cfg, rope, li)  # gemma3: dual tables
        x = blk(layer, x, mask, cos, sin, cfg.layer_uses_rope(li))

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps, po)
    head = params.get("lm_head", params["embed_tokens"])
    logits = matmul(x, head).astype(jnp.float32)
    if cfg.final_logit_softcapping:
        cap = jnp.float32(cfg.final_logit_softcapping)
        logits = cap * jnp.tanh(logits / cap)
    return logits
