"""LoRA training over the (dp, tp) mesh: frozen base, trained adapters.

Beyond-reference capability (the reference has no training at all) closing
the adapter loop this repo already speaks on both ends
(tools/extract_lora.py, tools/fuse_lora.py): ``make_lora_train_step``
freezes the base parameters — raw OR int8/int4 quantized, the QLoRA
recipe — and trains only rank-r factor pairs per targeted projection.
The merged weight ``W + (alpha/r)·B@A`` is materialized INSIDE the jitted
step (one (out, r)x(r, in) matmul + add per target — negligible next to
the forward) so the unmodified ``forward_train`` runs on ordinary trees
and gradients flow only to A/B by construction (``value_and_grad`` over
the adapter tree; the base is a closed-over constant).

TPU-first sharding: the base params keep their Megatron placements
(param_shardings), and each adapter factor shards WITH its weight's
partitioned dimension — column-parallel W (out sharded over 'tp') gives B
P('tp', None) and replicated A; row-parallel W (in sharded) gives A
P(None, 'tp') and replicated B — so the materialized delta lands on W's
exact sharding with no resharding collective. Optimizer state exists only
for the adapters: for a rank-16 llama-8B-class model that is ~0.3% of the
full fine-tune's moment HBM.

Init follows PEFT semantics where it matters and documents the rest:
B = 0 (the merged model IS the base at step 0 — pinned by test) and
A ~ U(-1/sqrt(in), 1/sqrt(in)) (kaiming-uniform-shaped; PEFT's exact
fan-in uniform). ``lora_to_peft`` exports the trained factors in PEFT
layout (same key grammar fuse_lora parses), so train -> export -> fuse /
merge / serve is one pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import LORA_TARGET_PROJECTIONS as DEFAULT_LORA_TARGETS
from ..models.llama import ModelConfig, Params
from ..models.quant import scoped_without_int4_kernel
from .train import TrainState, _loss_fn, param_shardings, shard_params

__all__ = [
    "DEFAULT_LORA_TARGETS",
    "lora_init",
    "merge_lora",
    "make_lora_train_step",
    "lora_to_peft",
]


# internal layer-dict key -> HF module path inside model.layers.{i}
_HF_MODULE = {
    "q_proj": "self_attn.q_proj",
    "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj",
    "o_proj": "self_attn.o_proj",
    "gate_proj": "mlp.gate_proj",
    "up_proj": "mlp.up_proj",
    "down_proj": "mlp.down_proj",
}


def _weight_out_in(w):
    """(out, in) of a raw or quantized {'q','scale'} leaf (int4 packs two
    input-dim values per byte)."""
    if isinstance(w, dict):
        q = w["q"]
        cols = q.shape[1] * 2 if q.dtype == jnp.uint8 else q.shape[1]
        return q.shape[0], cols
    return w.shape[0], w.shape[1]


def lora_init(
    mesh: Mesh,
    params: Params,
    rank: int,
    targets: Sequence[str] = DEFAULT_LORA_TARGETS,
    seed: int = 0,
) -> Params:
    """Per-layer {target: {"A": (r, in), "B": (out, r)}} adapter tree,
    placed on the mesh so each factor shards with its weight's
    partitioned dim. B = 0; A fan-in uniform (see module docstring)."""
    if rank <= 0:
        raise ValueError(f"lora rank must be positive, got {rank}")
    col = NamedSharding(mesh, P("tp", None))  # matches loader col rule
    rep = NamedSharding(mesh, P())
    a_for = {"o_proj": NamedSharding(mesh, P(None, "tp")),
             "down_proj": NamedSharding(mesh, P(None, "tp"))}
    b_for = {k: col for k in ("q_proj", "k_proj", "v_proj",
                              "gate_proj", "up_proj")}

    key = jax.random.key(seed)
    layers = []
    found = set()
    for i, layer in enumerate(params["layers"]):
        adapters: Dict[str, dict] = {}
        for name in targets:
            w = layer.get(name)
            if w is None:
                continue
            out_dim, in_dim = _weight_out_in(w)
            key, sub = jax.random.split(key)
            bound = 1.0 / float(np.sqrt(in_dim))
            a = jax.random.uniform(
                sub, (rank, in_dim), jnp.float32, -bound, bound
            )
            b = jnp.zeros((out_dim, rank), jnp.float32)
            adapters[name] = {
                "A": jax.device_put(a, a_for.get(name, rep)),
                "B": jax.device_put(b, b_for.get(name, rep)),
            }
            found.add(name)
        layers.append(adapters)
    missing = set(targets) - found
    if missing:
        raise ValueError(
            f"lora targets {sorted(missing)} matched no layer weights"
        )
    return {"layers": layers}


def merge_lora(params: Params, lora: Params, scale) -> Params:
    """Materialize base + scale·B@A per adapted leaf (fp32 accumulate,
    cast back to the base dtype; quantized bases dequantize to bf16 —
    the QLoRA compute dtype)."""
    from ..models.quant import dequant

    merged_layers = []
    for layer, adapters in zip(params["layers"], lora["layers"]):
        new = dict(layer)
        for name, ab in adapters.items():
            w = layer[name]
            delta = (
                ab["B"].astype(jnp.float32) @ ab["A"].astype(jnp.float32)
            ) * scale
            if isinstance(w, dict):
                w32 = dequant(w, jnp.bfloat16).astype(jnp.float32)
                new[name] = (w32 + delta).astype(jnp.bfloat16)
            else:
                new[name] = (w.astype(jnp.float32) + delta).astype(w.dtype)
        merged_layers.append(new)
    return {**params, "layers": merged_layers}


def make_lora_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    rank: int,
    learning_rate: float = 1e-4,
    targets: Sequence[str] = DEFAULT_LORA_TARGETS,
    alpha: Optional[float] = None,
    seed: int = 0,
    remat: bool = False,
    tx=None,
):
    """(init_state, train_step) training ONLY the LoRA factors.

    ``alpha`` defaults to ``rank`` (PEFT scale alpha/r == 1).
    ``tx`` substitutes any optax transformation for the built-in adamw.
    The returned state holds {"params" (frozen), "lora", "opt_state"};
    train_step: (state, (B, T+1) batch) -> (state, loss)."""
    scale = float(alpha if alpha is not None else rank) / float(rank)
    opt = tx if tx is not None else optax.adamw(learning_rate)
    batch_sharding = NamedSharding(mesh, P("dp", None))

    def init_state(params: Params) -> TrainState:
        params = shard_params(mesh, params)
        lora = lora_init(mesh, params, rank, targets=targets, seed=seed)
        return {
            "params": params,
            "lora": lora,
            "opt_state": opt.init(lora),
        }

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: jnp.ndarray):
        batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        base = state["params"]

        def loss_of(lora):
            return _loss_fn(
                merge_lora(base, lora, scale), cfg, batch, remat=remat
            )

        loss, grads = jax.value_and_grad(loss_of)(state["lora"])
        updates, opt_state = opt.update(
            grads, state["opt_state"], state["lora"]
        )
        lora = optax.apply_updates(state["lora"], updates)
        return (
            {"params": base, "lora": lora, "opt_state": opt_state},
            loss,
        )

    # QLoRA bases are quantized: keep the fused int4 Pallas GEMV out of
    # this GSPMD-jitted trace (it cannot be auto-partitioned over a mesh)
    return init_state, scoped_without_int4_kernel(train_step)


def lora_to_peft(
    lora: Params,
    output_dir,
    rank: int,
    alpha: float,
    base_model: str = "",
) -> dict:
    """Write the trained adapter tree as a PEFT adapter directory (the
    exact layout tools/fuse_lora.py parses back). Keys follow HF llama
    module naming (model.layers.{i}.self_attn/mlp.*).

    ``alpha`` is REQUIRED and must be the value the adapters were trained
    with (make_lora_train_step's ``alpha``, or ``rank`` if it was left
    defaulted): fuse_lora/PEFT apply scale alpha/r at load time, so an
    exported alpha differing from the training alpha silently rescales
    the adapter's effect — nothing downstream could detect it."""
    import json
    from pathlib import Path

    from ..io.safetensors_io import save_file

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    tensors = {}
    modules = set()
    for i, adapters in enumerate(lora["layers"]):
        for name, ab in adapters.items():
            module = _HF_MODULE.get(name)
            if module is None:
                raise ValueError(
                    f"no HF module mapping for adapted leaf {name!r}"
                )
            stem = f"base_model.model.model.layers.{i}.{module}"
            tensors[f"{stem}.lora_A.weight"] = np.asarray(
                ab["A"], dtype=np.float32
            )
            tensors[f"{stem}.lora_B.weight"] = np.asarray(
                ab["B"], dtype=np.float32
            )
            modules.add(name)
    save_file(tensors, output_dir / "adapter_model.safetensors")
    config = {
        "peft_type": "LORA",
        "r": int(rank),
        "lora_alpha": float(alpha),
        "lora_dropout": 0.0,
        "target_modules": sorted(modules),
        "base_model_name_or_path": str(base_model),
        "bias": "none",
        "task_type": "CAUSAL_LM",
    }
    (output_dir / "adapter_config.json").write_text(
        json.dumps(config, indent=2)
    )
    return {"tensors": len(tensors) // 2, "rank": int(rank)}
