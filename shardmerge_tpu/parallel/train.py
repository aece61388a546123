"""Sharded training/inference step over a (dp, tp) mesh.

The merge framework's model stack (models/llama.py) scales over a 2-D mesh:

- dp: batch-sharded data parallelism
- tp: Megatron-style tensor parallelism — attention/MLP projections sharded
  on the head/ffn dimension (column-parallel q/k/v/gate/up, row-parallel
  o/down), vocab-parallel embeddings and lm_head

Shardings are expressed as NamedSharding rules on the param pytree; XLA
GSPMD inserts the all-reduces. Sequence-parallel activations fall out of the
dp axis on (B, T): with B=dp x per-device batch the activations are already
distributed, and the loss all-reduce closes the step.

Used by tests and by __graft_entry__.dryrun_multichip (driver contract).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import ModelConfig, Params, forward_train

__all__ = ["param_shardings", "shard_params", "make_train_step", "TrainState"]

TrainState = Dict[str, Any]


def loader_shardings(mesh: Mesh):
    """Per-key NamedShardings for STREAMING placement at load time.

    Serving checkpoints larger than one chip's HBM must never stage the
    whole model on the default device: models/loader.py consults this map
    to device_put each tensor directly onto its final sharding as it is
    read. Keys mirror param_shardings' rules; anything absent replicates.
    Returns (layer_key -> sharding, top_key -> sharding, default)."""
    col = NamedSharding(mesh, P("tp", None))
    row = NamedSharding(mesh, P(None, "tp"))
    rep = NamedSharding(mesh, P())
    layer_rules = {
        "q_proj": col,
        "k_proj": col,
        "v_proj": col,
        "gate_proj": col,
        "up_proj": col,
        "o_proj": row,
        "down_proj": row,
        "q_bias": NamedSharding(mesh, P("tp")),
        "k_bias": NamedSharding(mesh, P("tp")),
        "v_bias": NamedSharding(mesh, P("tp")),
        # per-expert weights (mixtral/qwen3/deepseek lists)
        "w1": col,
        "w3": col,
        "w2": row,
    }
    top_rules = {"embed_tokens": col, "lm_head": col}
    return layer_rules, top_rules, rep


def param_shardings(mesh: Mesh, params: Params) -> Params:
    """NamedSharding pytree for Megatron-style TP over axis 'tp'.

    The rule table is loader_shardings — the SAME map the streaming loader
    places tensors with, so a stream-sharded load is already in its final
    placement (device_put aliases when shardings match)."""
    rules, top_rules, rep = loader_shardings(mesh)
    vocab = top_rules["embed_tokens"]

    expert_rules = {k: rules[k] for k in ("w1", "w3", "w2")}

    def apply(rule, leaf):
        """Match quantized {q, scale} dict leaves with a sharding dict:
        q shards like the raw matrix; the (out, 1) scale shards with it
        when the rule splits the output dim, else replicates."""
        if isinstance(leaf, dict):
            scale = rule if rule.spec and rule.spec[0] == "tp" else rep
            return {"q": rule, "scale": scale}
        return rule

    def layer_sharding(layer):
        out = {}
        for k, v in layer.items():
            if k == "experts":
                out[k] = [
                    {w: apply(r, e[w]) for w, r in expert_rules.items()}
                    for e in v
                ]
            elif k in rules:
                out[k] = apply(rules[k], v)
            else:
                # anything without a Megatron rule replicates: routers,
                # q/k norms, gemma post-norms, sinks, MLA projections,
                # deepseek shared experts, gpt-oss fused expert stacks —
                # correct (GSPMD keeps them whole) if not maximally sharded
                out[k] = jax.tree.map(lambda _: rep, v)
        return out

    out: Params = {
        "embed_tokens": apply(vocab, params["embed_tokens"]),
        "norm": rep,
        "layers": [layer_sharding(layer) for layer in params["layers"]],
    }
    if "lm_head" in params:
        out["lm_head"] = apply(vocab, params["lm_head"])
    return out


def shard_params(mesh: Mesh, params: Params) -> Params:
    shardings = param_shardings(mesh, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )


def _loss_fn(
    params: Params,
    cfg: ModelConfig,
    batch: jnp.ndarray,
    remat: bool = False,
) -> jnp.ndarray:
    """Next-token cross entropy over (B, T+1) token batches."""
    inputs = batch[:, :-1]
    targets = batch[:, 1:]
    logits = forward_train(params, cfg, inputs, remat=remat)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def make_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    learning_rate: float = 1e-4,
    remat: bool = False,
):
    """Build (init_state, train_step) with dp-sharded batches and tp-sharded
    params/optimizer state. train_step: (state, batch) -> (state, loss).

    ``remat=True`` gradient-checkpoints each decoder block (activation HBM
    becomes O(1) blocks instead of O(layers); see forward_train)."""
    tx = optax.adamw(learning_rate)
    batch_sharding = NamedSharding(mesh, P("dp", None))

    def init_state(params: Params) -> TrainState:
        params = shard_params(mesh, params)
        opt_state = jax.jit(tx.init)(params)  # inherits param shardings
        return {"params": params, "opt_state": opt_state}

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: jnp.ndarray):
        batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        loss, grads = jax.value_and_grad(_loss_fn)(
            state["params"], cfg, batch, remat
        )
        updates, opt_state = tx.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state}, loss

    return init_state, train_step
