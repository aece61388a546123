"""Expert-parallel (EP) MoE dispatch over a mesh axis.

SURVEY.md §2.3 lists expert parallelism among the axes the reference lacks.
parallel/train.py already shards each expert's matrices Megatron-style
(intra-expert TP); this module shards the EXPERT axis instead: each device
owns n_experts/P complete experts and computes only the token slots routed
to them.

Serving pattern (small-batch inference): activations are replicated over
the EP axis, the router is deterministic and replicated, so every device
derives the SAME dispatch tables, slices its own experts' rows, computes
its local expert blocks, and one psum over the axis assembles the output —
expert FLOPs and expert weight memory both scale 1/P with zero token
all-to-alls (the psum of the (S, E) activations is the only collective).

Exactness: identical to the single-device capacity dispatch
(models/llama._moe_capacity), which itself matches the dense-and-mask MoE
when no expert exceeds capacity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import (
    ModelConfig,
    _mlp,
    capacity_experts_apply,
    capacity_tables,
    capacity_tables_from_topk,
    deepseek_topk,
    matmul,
)

__all__ = ["expert_parallel_ffn", "shard_experts"]

_AXIS = "ep"

# jit(shard_map(...)) closures cached per (mesh, static config) — rebuilding
# the partial+jit wrapper per call would miss jit's identity-keyed trace
# cache and recompile on every invocation (parallel/merge.py pattern)
_FFN_CACHE: dict = {}


def shard_experts(mesh: Mesh, layer: dict):
    """Stack a layer's expert weights and shard the expert axis over 'ep'.

    Returns (gate_w, gate_bias, W1, W3, W2) with W* placed as (n_exp/P
    local experts per device); the tiny router matrix (and the deepseek
    e_score_correction_bias, when present — else None) is replicated.
    """
    exp_sharded = NamedSharding(mesh, P(_AXIS, None, None))
    rep = NamedSharding(mesh, P())
    if "experts_stacked" in layer:
        S1, S3, S2 = layer["experts_stacked"]
    else:
        S1 = jnp.stack([e["w1"] for e in layer["experts"]])
        S3 = jnp.stack([e["w3"] for e in layer["experts"]])
        S2 = jnp.stack([e["w2"] for e in layer["experts"]])
    W1 = jax.device_put(S1, exp_sharded)
    W3 = jax.device_put(S3, exp_sharded)
    W2 = jax.device_put(S2, exp_sharded)
    gate_w = jax.device_put(layer["moe_gate"], rep)
    gate_bias = (
        jax.device_put(layer["gate_bias"], rep) if "gate_bias" in layer else None
    )
    return gate_w, gate_bias, W1, W3, W2


def expert_parallel_ffn(
    mesh: Mesh,
    cfg: ModelConfig,
    gate_w,
    gate_bias,
    W1,
    W3,
    W2,
    x,
    capacity_factor: float = 1.25,
    shared=None,  # deepseek: (gate, up, down) shared-experts weights
):
    """Run one MoE FFN with experts sharded over mesh axis 'ep'.

    ``x``: (B, T, E) activations, replicated over the axis. Experts must
    divide the axis size. Routing follows ``cfg``: mixtral/qwen3 softmax
    top-k, or the deepseek grouped router when ``cfg.model_type`` says so
    (``gate_bias`` carries V3's e_score_correction_bias). ``shared``
    deepseek shared-experts weights run replicated outside the shard_map
    (no collectives — they are dense). Returns (B, T, E) in x.dtype.
    """
    n_exp = cfg.num_local_experts
    n_dev = mesh.devices.size
    if n_exp % n_dev != 0:
        raise ValueError(f"{n_exp} experts do not divide {n_dev} devices")
    B, T, E = x.shape
    S = B * T
    C = min(int(np.ceil(S * cfg.num_experts_per_tok / n_exp * capacity_factor)), S)

    deepseek = cfg.model_type.startswith("deepseek")
    # key on routing FIELD VALUES, not id(cfg) (address reuse after GC)
    ds_key = deepseek and (
        cfg.topk_method, cfg.n_group, cfg.topk_group,
        cfg.routed_scaling_factor, n_exp,
    )
    key = (id(mesh), cfg.num_experts_per_tok, C, cfg.hidden_act,
           cfg.norm_topk_prob, ds_key)
    fn = _FFN_CACHE.get(key)
    if fn is None:
        body = partial(
            _ep_body, k=cfg.num_experts_per_tok, capacity=C,
            hidden_act=cfg.hidden_act, norm_topk=cfg.norm_topk_prob,
            ds_cfg=cfg if deepseek else None,
        )
        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(_AXIS, None, None),
                          P(_AXIS, None, None), P(_AXIS, None, None)),
                out_specs=P(),
            )
        )
        _FFN_CACHE[key] = fn
    bias_arr = (
        gate_bias
        if gate_bias is not None
        else jnp.zeros((n_exp,), jnp.float32)
    )
    out = fn(x.reshape(S, E), gate_w, bias_arr, W1, W3, W2)
    if shared is not None:
        g, u, d = shared
        out = out + _mlp(
            {"gate_proj": g, "up_proj": u, "down_proj": d}, x, cfg.hidden_act
        ).astype(jnp.float32).reshape(S, E)
    return out.reshape(B, T, E).astype(x.dtype)


def _ep_body(
    xf, gate_w, gate_bias, W1l, W3l, W2l,
    *, k, capacity, hidden_act, norm_topk=True, ds_cfg=None,
):
    """shard_map body: xf replicated (S, E); W*l = this device's experts."""
    n_local = W1l.shape[0]
    n_exp = n_local * jax.lax.axis_size(_AXIS)
    rank = jax.lax.axis_index(_AXIS)

    # replicated router -> identical dispatch tables on every device
    if ds_cfg is not None:
        topk_idx, topk_w = deepseek_topk(ds_cfg, gate_w, gate_bias, xf)
        gather_idx, w_slot = capacity_tables_from_topk(
            topk_idx, topk_w, n_exp, capacity
        )
    else:
        router_logits = matmul(xf, gate_w).astype(jnp.float32)
        probs = jax.nn.softmax(router_logits, axis=-1)
        gather_idx, w_slot = capacity_tables(probs, k, capacity, norm_topk)

    # slice this device's expert rows
    gi = jax.lax.dynamic_slice_in_dim(gather_idx, rank * n_local, n_local, 0)
    ws = jax.lax.dynamic_slice_in_dim(w_slot, rank * n_local, n_local, 0)

    local = capacity_experts_apply(xf, gi, ws, W1l, W3l, W2l, hidden_act)
    return jax.lax.psum(local, _AXIS)
