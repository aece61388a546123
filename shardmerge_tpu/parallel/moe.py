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

__all__ = [
    "expert_parallel_ffn",
    "shard_experts",
    "make_ep_loss",
    "make_ep_train_step",
]

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


# ---------------------------------------------------------------------------
# Expert-parallel TRAINING: 'ep' composed into the train step
# ---------------------------------------------------------------------------

def make_ep_loss(
    mesh: Mesh,
    cfg: ModelConfig,
    params_template,
    capacity_factor: float = None,
    remat: bool = False,
):
    """Next-token cross-entropy with the EXPERT axis sharded over mesh
    axis 'ep' — each device holds n_experts/P complete experts (weights,
    gradients, AND optimizer moments scale 1/P), computes only its
    experts' capacity blocks, and one psum per MoE layer assembles the
    routed output. Composes with a 'dp' axis (batch-sharded) on the same
    mesh. Differentiable: expert cotangents stay rank-local; replicated
    weights' cotangents psum over both axes through shard_map's
    transpose.

    This is the axis MoE training actually needs: at DeepSeek-V3
    geometry (256 routed experts) a dense-and-mask step computes 256/8 =
    32x the useful expert FLOPs and cannot even hold the expert moments
    per device — ep-sharding makes the step HBM- and FLOP-proportional
    to n_experts/P.

    ``params_template`` must carry STACKED expert leaves
    (``layer["experts_stacked"] = (W1, W3, W2)`` — run
    models/llama.stack_expert_weights first); per-expert routing follows
    ``cfg`` (mixtral/qwen3 softmax top-k or the deepseek grouped router
    with shared experts). ``capacity_factor=None`` (default) sizes every
    expert's capacity at the FULL token count: no token is ever dropped,
    so loss and gradients equal the dense-and-mask step exactly — the
    right default for training. Set a finite factor (e.g. 1.25) for the
    standard dropped-token efficiency trade at scale.

    Dense layers (deepseek first_k_dense_replace) run the ordinary FFN.
    Fused-stack families (gpt-oss / llama4 ``gptoss_experts`` /
    ``llama4_experts``) refuse: their dispatch math is not the
    per-expert SwiGLU this body shards.
    """
    from ..models.llama import (
        _ffn,
        _shared_experts_out,
        block_train,
        capacity_experts_apply,
        capacity_tables,
        capacity_tables_from_topk,
        deepseek_topk,
        layer_rope,
        matmul,
        rms_norm,
        rope_tables,
    )

    if "ep" not in mesh.axis_names:
        raise ValueError("make_ep_loss needs an 'ep' axis in the mesh")
    n_ep = mesh.shape["ep"]
    dp = "dp" in mesh.axis_names
    n_exp = cfg.num_local_experts
    if n_exp % n_ep != 0:
        raise ValueError(f"{n_exp} experts do not divide ep={n_ep}")
    for layer in params_template["layers"]:
        if "gptoss_experts" in layer or "llama4_experts" in layer:
            raise NotImplementedError(
                "fused expert stacks (gpt-oss/llama4) do not use the "
                "per-expert SwiGLU dispatch this ep body shards"
            )
        if "experts" in layer:
            raise ValueError(
                "make_ep_loss needs stacked expert leaves — run "
                "models/llama.stack_expert_weights(params) first"
            )
        if "experts_stacked" in layer and isinstance(
            layer["experts_stacked"][0], dict
        ):
            raise NotImplementedError(
                "quantized expert stacks do not train; dequantize first"
            )
    deepseek = cfg.model_type.startswith("deepseek")
    k = cfg.num_experts_per_tok

    def body(p, inputs):
        B, T = inputs.shape
        x = p["embed_tokens"][inputs]
        if cfg.is_gemma:
            x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)
        positions = jnp.arange(T, dtype=jnp.int32)[None, :].repeat(B, axis=0)
        rope = rope_tables(cfg, T)
        causal = jnp.tril(jnp.ones((T, T), bool))
        neg = jnp.float32(-1e9)
        mask_full = jnp.where(causal, 0.0, neg)
        mask_sliding = None
        if cfg.sliding_window is not None:
            ii = jnp.arange(T)[:, None]
            jj = jnp.arange(T)[None, :]
            mask_sliding = jnp.where(
                causal & (jj > ii - cfg.sliding_window), 0.0, neg
            )

        def ep_ffn(cfg_, layer, h):
            if "experts_stacked" not in layer:
                return _ffn(cfg_, layer, h)
            Bl, Tl, E = h.shape
            S = Bl * Tl
            C = (
                S
                if capacity_factor is None
                else min(int(np.ceil(S * k / n_exp * capacity_factor)), S)
            )
            xf = h.reshape(S, E)
            if deepseek:
                topk_idx, topk_w = deepseek_topk(
                    cfg_, layer["moe_gate"], layer.get("gate_bias"), xf
                )
                gather_idx, w_slot = capacity_tables_from_topk(
                    topk_idx, topk_w, n_exp, C
                )
            else:
                probs = jax.nn.softmax(
                    matmul(xf, layer["moe_gate"]).astype(jnp.float32),
                    axis=-1,
                )
                gather_idx, w_slot = capacity_tables(
                    probs, k, C, cfg_.norm_topk_prob
                )
            # identical replicated routing on every rank: slice this
            # device's expert rows, compute its blocks, one psum
            rank = jax.lax.axis_index(_AXIS)
            n_local = n_exp // n_ep
            gi = jax.lax.dynamic_slice_in_dim(
                gather_idx, rank * n_local, n_local, 0
            )
            ws = jax.lax.dynamic_slice_in_dim(
                w_slot, rank * n_local, n_local, 0
            )
            W1, W3, W2 = layer["experts_stacked"]  # rank-local slices
            out = capacity_experts_apply(
                xf, gi, ws, W1, W3, W2, cfg_.hidden_act
            )
            out = jax.lax.psum(out, _AXIS).reshape(Bl, Tl, E)
            shared = _shared_experts_out(cfg_, layer, h)
            if shared is not None:
                out = out + shared.astype(jnp.float32)
            return out.astype(h.dtype)

        def one(x_, layer, i):
            mask = (
                mask_sliding
                if cfg.sliding_window is not None and cfg.layer_is_sliding(i)
                else mask_full
            )
            cos, sin = layer_rope(cfg, rope, i)
            return block_train(
                cfg, layer, x_, cos, sin, positions, mask,
                use_rope=cfg.layer_uses_rope(i), ffn=ep_ffn,
            )

        fn = jax.checkpoint(one, static_argnums=(2,)) if remat else one
        for i, layer in enumerate(p["layers"]):
            x = fn(x, layer, i)
        x = rms_norm(x, p["norm"], cfg.rms_norm_eps, cfg.is_gemma)
        head = p.get("lm_head", p["embed_tokens"])
        logits = matmul(x, head).astype(jnp.float32)
        if cfg.final_logit_softcapping:
            cap = jnp.float32(cfg.final_logit_softcapping)
            logits = cap * jnp.tanh(logits / cap)
        return logits

    def layer_spec(layer):
        out = {}
        for key, v in layer.items():
            if key == "experts_stacked":
                out[key] = tuple(
                    P(_AXIS, *([None] * (w.ndim - 1))) for w in v
                )
            else:
                out[key] = jax.tree.map(lambda _: P(), v)
        return out

    param_specs = {
        "embed_tokens": P(),
        "norm": P(),
        "layers": [layer_spec(layer) for layer in params_template["layers"]],
    }
    if "lm_head" in params_template:
        param_specs["lm_head"] = P()
    ids_spec = P("dp", None) if dp else P()
    logits_spec = P("dp", None, None) if dp else P()
    fwd = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, ids_spec),
        out_specs=logits_spec,
    )

    def loss_fn(p, batch):
        inputs = batch[:, :-1]
        targets = batch[:, 1:]
        logits = fwd(p, inputs)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    loss_fn.param_specs = param_specs
    return loss_fn


def make_ep_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    params_template,
    learning_rate: float = 1e-4,
    capacity_factor: float = None,
    remat: bool = False,
    zero1: bool = False,
    master_fp32: bool = False,
    tx=None,
):
    """(init_state, train_step) over a ('dp',)? x ('ep',) mesh: experts
    (and their Adam moments / fp32 master) shard over 'ep', batches over
    'dp' when present, everything else replicates. Same contract as
    make_train_step; see :func:`make_ep_loss` for the kernel and the
    exactness-by-default capacity policy. ``zero1=True`` additionally
    partitions the replicated leaves' moments over 'dp' (requires one)."""
    from functools import partial

    from jax.sharding import NamedSharding

    from .train import _OptimKit

    dp = "dp" in mesh.axis_names
    if zero1 and not dp:
        raise ValueError("zero1 needs a 'dp' axis in the ep mesh")
    loss_fn = make_ep_loss(
        mesh, cfg, params_template,
        capacity_factor=capacity_factor, remat=remat,
    )
    specs = loss_fn.param_specs
    batch_sharding = NamedSharding(mesh, P("dp", None) if dp else P())
    kit = _OptimKit(
        mesh, learning_rate, zero1, master_fp32,
        data_axes=("dp",) if dp else (), tx=tx,
    )

    def init_state(params):
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params,
            specs,
        )
        pshard = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
        return kit.init(params, pshard)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch):
        batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch)
        return kit.apply(state, grads), loss

    return init_state, train_step
