"""Sharded training/inference step over a (dp, tp) mesh.

The merge framework's model stack (models/llama.py) scales over a 2-D mesh:

- dp: batch-sharded data parallelism
- tp: Megatron-style tensor parallelism — attention/MLP projections sharded
  on the head/ffn dimension (column-parallel q/k/v/gate/up, row-parallel
  o/down), vocab-parallel embeddings and lm_head
- cp: context parallelism — make_cp_train_step shard_maps the blocks over a
  ('dp','cp'[,'tp']) mesh with the sequence sharded on 'cp' and ring
  attention (parallel/ring.py) inside every block

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
from ..models.quant import scoped_without_int4_kernel

__all__ = [
    "param_shardings",
    "shard_params",
    "zero1_opt_shardings",
    "make_train_step",
    "make_cp_loss",
    "make_cp_train_step",
    "make_pp_train_step",
    "TrainState",
]

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
        # fused expert stacks (gpt-oss / llama4): shard the EXPERT dim —
        # each device computes its experts end-to-end and the routed sum's
        # contraction over e becomes one all-reduce (GSPMD). Slicing the
        # gate/up columns instead would split gpt-oss's interleaved pairs
        # and llama4's contiguous halves across shards.
        "gate_up": NamedSharding(mesh, P("tp", None, None)),
        "down": NamedSharding(mesh, P("tp", None, None)),
        "gate_up_bias": NamedSharding(mesh, P("tp", None)),
        "down_bias": NamedSharding(mesh, P("tp", None)),
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
            elif k in ("gptoss_experts", "llama4_experts"):
                # fused stacks shard the EXPERT dim (see loader_shardings);
                # expert counts that do not divide the tp axis replicate
                n_tp = mesh.shape["tp"]

                def stack_rule(leaf):
                    arr = leaf["q3"] if isinstance(leaf, dict) else leaf
                    if arr.shape[0] % n_tp != 0:
                        return jax.tree.map(lambda _: rep, leaf)
                    rule = NamedSharding(
                        mesh, P("tp", *([None] * (arr.ndim - 1)))
                    )
                    if isinstance(leaf, dict):  # stacked int8/int4 quant
                        return {
                            "q3": rule,
                            "scale": NamedSharding(
                                mesh,
                                P("tp", *([None] * (leaf["scale"].ndim - 1))),
                            ),
                        }
                    return rule

                out[k] = {w: stack_rule(leaf) for w, leaf in v.items()}
            elif k in rules:
                out[k] = apply(rules[k], v)
            else:
                # anything without a Megatron rule replicates: routers,
                # q/k norms, gemma post-norms, sinks, MLA projections,
                # deepseek shared experts — correct (GSPMD keeps them
                # whole) if not maximally sharded
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


def _extend_axes(mesh: Mesh, rule: NamedSharding, leaf, axes) -> NamedSharding:
    """Add the data axes to the first free, divisible dim of a param's
    sharding.

    ZeRO-1 leaf rule: the optimizer moment for a (out, in) tensor keeps
    the param's 'tp' placement and additionally partitions one unsharded
    dim over the data axes — e.g. column-parallel P('tp', None) →
    P('tp', 'dp'), replicated norms P() → P('dp'), and over a dp×cp mesh
    the tuple ('dp', 'cp') shares one dim. Leaves with no dim divisible
    by the combined axis size stay replicated there (tiny: norms on odd
    sizes, scalars)."""
    total = 1
    for a in axes:
        total *= mesh.shape[a]
    ndim = getattr(leaf, "ndim", 0)
    spec = list(rule.spec) + [None] * (ndim - len(rule.spec))
    for i in range(ndim):
        if spec[i] is None and leaf.shape[i] % total == 0:
            spec[i] = axes[0] if len(axes) == 1 else tuple(axes)
            break
    return NamedSharding(mesh, P(*spec))


def zero1_opt_shardings(
    mesh: Mesh, params: Params, opt_state, pshard=None, axes=("dp",)
):
    """Sharding pytree for ZeRO-1 optimizer-state partitioning.

    Adam's first/second moments mirror the param tree, so their shardings
    are the param shardings extended onto the data axes (_extend_axes):
    each data-parallel rank holds 1/prod(axes) of every moment instead of
    a full replica. Under jit, GSPMD then derives the ZeRO-1
    communication pattern from the annotations alone: gradients
    reduce-scatter into the moment shards, the update computes on a
    1/prod(axes) slice per rank, and the parameter delta all-gathers back
    to the params' own placement — no hand-written collectives. Anything
    in the optimizer state that is not a moment tree (step counts, empty
    states) replicates.

    ``opt_state`` may be real state or ``jax.eval_shape(tx.init, params)``
    output; only the pytree structure and ScaleByAdamState nodes are
    used. ``pshard`` overrides the param sharding tree (defaults to
    param_shardings — pass the cp spec tree for the cp step).
    ``axes=()`` skips the extension: moments MIRROR the param shardings —
    the FSDP case, where the params themselves already carry the data
    axes."""
    rep = NamedSharding(mesh, P())
    if pshard is None:
        pshard = param_shardings(mesh, params)
    if axes:
        moments = jax.tree.map(
            lambda rule, p: _extend_axes(mesh, rule, p, axes), pshard, params
        )
    else:
        moments = pshard

    def map_node(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=rep, mu=moments, nu=moments)
        return jax.tree.map(lambda _: rep, node)

    return jax.tree.map(
        map_node,
        opt_state,
        is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
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


class _OptimKit:
    """Shared optimizer machinery for every train-step builder.

    Owns adamw plus the two orthogonal state-placement options:
    ``master_fp32`` (fp32 master copy + fp32 moments, bf16 re-cast per
    step — sub-ulp updates accumulate instead of vanishing) and ``zero1``
    (master and moments partitioned over the data axes;
    zero1_opt_shardings). ``init`` builds the state dict for
    already-placed params given their sharding tree; ``apply`` is the
    jit-traceable update: grads → tx.update on the master-or-params →
    re-cast/pin → next state dict. The dp×tp, dp×cp×tp and pp builders
    all delegate here so the option matrix exists once."""

    def __init__(
        self,
        mesh: Mesh,
        learning_rate: float,
        zero1: bool,
        master_fp32: bool,
        data_axes=("dp",),
        tx=None,
        fsdp: bool = False,
    ):
        # tx: any optax GradientTransformation (schedules, clipping,
        # chains). zero1 placement keys on ScaleByAdamState nodes; other
        # state nodes (clip/schedule counters) replicate — still correct,
        # just not partitioned.
        # fsdp: the caller's pshard already carries the data axes on the
        # PARAMS — moments/master mirror it (zero1_opt_shardings axes=())
        # instead of extending it onto a second dim.
        self.tx = tx if tx is not None else optax.adamw(learning_rate)
        self.mesh = mesh
        self.zero1 = zero1
        self.master_fp32 = master_fp32
        self.data_axes = tuple(data_axes)
        self.fsdp = fsdp
        self.cells: dict = {}  # sharding trees, filled by init

    def init(self, params: Params, pshard) -> TrainState:
        """``params`` already placed; ``pshard`` their NamedSharding tree."""
        self.cells["params"] = pshard
        state: TrainState = {"params": params}
        if self.master_fp32:
            m_shard = (
                jax.tree.map(
                    lambda r, p: _extend_axes(
                        self.mesh, r, p, self.data_axes
                    ),
                    pshard,
                    params,
                )
                if self.zero1
                else pshard  # fsdp: pshard already carries the data axes
            )
            self.cells["master"] = m_shard
            state["master"] = jax.jit(
                lambda p: jax.tree.map(
                    lambda x: x.astype(jnp.float32), p
                ),
                out_shardings=m_shard,
            )(params)
        target = state.get("master", params)
        if self.zero1 or self.fsdp:
            shapes = jax.eval_shape(self.tx.init, target)
            shardings = zero1_opt_shardings(
                self.mesh, target, shapes, pshard=pshard,
                axes=self.data_axes if self.zero1 else (),
            )
            self.cells["opt"] = shardings
            state["opt_state"] = jax.jit(
                self.tx.init, out_shardings=shardings
            )(target)
        else:
            # inherits the target's shardings
            state["opt_state"] = jax.jit(self.tx.init)(target)
        return state

    def apply(self, state: TrainState, grads) -> TrainState:
        """One optimizer step (traced inside the caller's jit)."""
        if self.master_fp32:
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
            ref = state["master"]
        else:
            ref = state["params"]
        updates, opt_state = self.tx.update(
            grads, state["opt_state"], ref
        )
        new_ref = optax.apply_updates(ref, updates)
        if self.zero1 or self.fsdp:
            # pin the data-axis partitioning so GSPMD keeps the moments
            # (and master) sharded — reduce-scatter grads in, all-gather
            # the delta out (zero1) / at each use site (fsdp) — instead
            # of ever materializing a replicated tree
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, self.cells["opt"]
            )
            if self.master_fp32:
                new_ref = jax.lax.with_sharding_constraint(
                    new_ref, self.cells["master"]
                )
        if self.fsdp and not self.master_fp32:
            new_ref = jax.lax.with_sharding_constraint(
                new_ref, self.cells["params"]
            )
        if self.master_fp32:
            params = jax.tree.map(
                lambda m, p: m.astype(p.dtype), new_ref, state["params"]
            )
            params = jax.lax.with_sharding_constraint(
                params, self.cells["params"]
            )
            return {
                "params": params,
                "opt_state": opt_state,
                "master": new_ref,
            }
        return {"params": new_ref, "opt_state": opt_state}


def make_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    learning_rate: float = 1e-4,
    remat: bool = False,
    zero1: bool = False,
    master_fp32: bool = False,
    grad_accum: int = 1,
    tx=None,
    fsdp: bool = False,
):
    """Build (init_state, train_step) with dp-sharded batches and tp-sharded
    params/optimizer state. train_step: (state, batch) -> (state, loss).

    ``grad_accum=K`` splits the batch's leading dim into K microbatches
    scanned inside the SAME jit — activation memory holds one microbatch
    (composes with remat for the classic large-batch recipe), gradients
    accumulate in fp32, and one optimizer step applies their mean. With
    equal microbatch sizes the loss and update equal the unaccumulated
    step exactly (mean-of-means; gradient linearity).

    ``remat=True`` gradient-checkpoints each decoder block (activation HBM
    becomes O(1) blocks instead of O(layers); see forward_train).
    ``zero1=True`` partitions the Adam moments over the 'dp' axis
    (zero1_opt_shardings): optimizer HBM drops to 1/dp per device and the
    update step runs on 1/dp of the elements per rank, at the cost of the
    GSPMD-inserted reduce-scatter/all-gather pair. Numerics are identical
    to the replicated step (same update math, different placement).
    ``tx=`` substitutes any optax GradientTransformation (schedules,
    clipping, chains) for the built-in adamw — ``learning_rate`` is then
    ignored (the transformation carries its own).
    ``master_fp32=True`` is the standard bf16-training recipe: the
    forward/backward runs on the bf16 params, but the optimizer holds an
    fp32 master copy (plus fp32 moments) and each step re-casts master →
    bf16 — updates smaller than one bf16 ulp ACCUMULATE in the master
    instead of vanishing in the cast. Composes with zero1: the fp32
    master and moments all shard over 'dp' (per-device optimizer HBM =
    12 bytes/param / dp on top of the 2-byte bf16 replica).
    ``fsdp=True`` goes one step further (the ZeRO-3 / fully-sharded-data-
    parallel recipe): the PARAMETERS themselves also partition over 'dp'
    (each leaf's first free divisible dim, on top of any 'tp' placement)
    and the moments/master mirror them — per-device weight HBM drops to
    1/(dp·tp), with GSPMD all-gathering each weight at its use sites in
    the forward/backward (re-gathered after remat) and reduce-scattering
    its gradient. Subsumes zero1 (passing both raises). Numerics are
    identical to the replicated step."""
    if fsdp and zero1:
        raise ValueError(
            "fsdp already shards the optimizer state over 'dp'; "
            "zero1 is subsumed"
        )
    kit = _OptimKit(mesh, learning_rate, zero1, master_fp32, tx=tx, fsdp=fsdp)
    batch_sharding = NamedSharding(mesh, P("dp", None))

    def init_state(params: Params) -> TrainState:
        if fsdp:
            base = param_shardings(mesh, params)
            pshard = jax.tree.map(
                lambda r, p: _extend_axes(mesh, r, p, ("dp",)), base, params
            )
            params = jax.tree.map(jax.device_put, params, pshard)
            return kit.init(params, pshard)
        params = shard_params(mesh, params)
        return kit.init(params, param_shardings(mesh, params))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: jnp.ndarray):
        if grad_accum > 1:
            B = batch.shape[0]
            if B % grad_accum != 0:
                raise ValueError(
                    f"batch dim {B} not divisible by grad_accum={grad_accum}"
                )
            micro = batch.reshape(grad_accum, B // grad_accum, -1)
            micro = jax.lax.with_sharding_constraint(
                micro, NamedSharding(mesh, P(None, "dp", None))
            )

            def acc(carry, mb):
                loss_sum, grad_sum = carry
                loss, grads = jax.value_and_grad(_loss_fn)(
                    state["params"], cfg, mb, remat
                )
                grad_sum = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32),
                    grad_sum,
                    grads,
                )
                return (loss_sum + loss, grad_sum), None

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state["params"]
            )
            (loss_sum, grad_sum), _ = jax.lax.scan(
                acc, (jnp.float32(0.0), zeros), micro
            )
            loss = loss_sum / grad_accum
            grads = jax.tree.map(lambda g: g / grad_accum, grad_sum)
            if not master_fp32:
                # the unaccumulated path hands tx grads in param dtype
                grads = jax.tree.map(
                    lambda g, p: g.astype(p.dtype), grads, state["params"]
                )
        else:
            batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
            loss, grads = jax.value_and_grad(_loss_fn)(
                state["params"], cfg, batch, remat
            )
        return kit.apply(state, grads), loss

    # the auto-sharded (GSPMD) jit cannot partition a pallas_call: trace
    # with the fused int4 Pallas GEMV suppressed so quantized frozen bases
    # (QLoRA-style) take the XLA decomposition GSPMD partitions fine
    return init_state, scoped_without_int4_kernel(train_step)


def make_pp_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    n_microbatches: int,
    learning_rate: float = 1e-4,
    remat: bool = False,
    zero1: bool = False,
    master_fp32: bool = False,
    tx=None,
):
    """(init_state, train_step) for pipeline-parallel training.

    ``init_state`` takes ALREADY-STACKED pipeline params
    (pipeline.stack_stages output — the caller controls tp/prefix
    options); the adamw state inherits each stage leaf's placement, so
    moments live stage-local over 'pp' (and Megatron-sharded over 'tp'
    when stacked that way) without any extra rules. ``zero1=True``
    additionally partitions the moments over a 'dp' mesh axis (requires
    one — dp×pp / dp×pp×tp layouts), deriving the extension from each
    leaf's OWN sharding, so it composes with any stacking layout.
    ``master_fp32`` as in make_train_step (_OptimKit)."""
    from .pipeline import make_pp_loss

    if zero1 and "dp" not in mesh.axis_names:
        raise ValueError("zero1 needs a 'dp' axis in the pipeline mesh")
    loss_fn = make_pp_loss(mesh, cfg, n_microbatches, remat=remat)
    kit = _OptimKit(mesh, learning_rate, zero1, master_fp32, tx=tx)

    def init_state(pp_params: Params) -> TrainState:
        # derive the sharding tree from each leaf's OWN placement (works
        # for any stacking layout — tp, dense prefix, MoE stage stacks)
        pshard = jax.tree.map(lambda x: x.sharding, pp_params)
        return kit.init(pp_params, pshard)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: jnp.ndarray):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch)
        return kit.apply(state, grads), loss

    return init_state, train_step


def _cp_layer_specs(params: Params, tp: bool):
    """PartitionSpec pytree for the manual (shard_map) cp train path:
    Megatron rules over 'tp' when present (same key table as
    loader_shardings), everything else replicated. Embeddings/lm_head
    replicate here — vocab-parallel lookups need masked gathers + psums in
    manual mode; the auto path (make_train_step) keeps vocab parallelism."""
    col, row, col1 = P("tp", None), P(None, "tp"), P("tp")
    rules = {
        "q_proj": col, "k_proj": col, "v_proj": col,
        "gate_proj": col, "up_proj": col,
        "o_proj": row, "down_proj": row,
        "q_bias": col1, "k_bias": col1, "v_bias": col1,
        # gpt-oss: sinks slice with the head split
        "sinks": col1,
    }
    expert_rules = {"w1": col, "w3": col, "w2": row}
    # gpt-oss fused stacks shard the EXPERT dim (each device computes its
    # experts end-to-end; the routed sum's contraction over e becomes the
    # body's row-parallel psum — same layout as loader_shardings)
    gptoss_rules = {
        "gate_up": P("tp", None, None),
        "gate_up_bias": P("tp", None),
        "down": P("tp", None, None),
        "down_bias": P("tp", None),
    }

    def layer_spec(layer):
        out = {}
        for k, v in layer.items():
            if tp and k == "experts":
                out[k] = [dict(expert_rules) for _ in v]
            elif tp and k == "gptoss_experts":
                if any(isinstance(leaf, dict) for leaf in v.values()):
                    raise NotImplementedError(
                        "quantized gpt-oss expert stacks do not train "
                        "under cp x tp (dequantize first)"
                    )
                out[k] = {w: gptoss_rules[w] for w in v}
            elif tp and k in rules:
                out[k] = rules[k]
            else:
                out[k] = jax.tree.map(lambda _: P(), v)
        return out

    specs: Params = {
        "embed_tokens": P(),
        "norm": P(),
        "layers": [layer_spec(layer) for layer in params["layers"]],
    }
    if "lm_head" in params:
        specs["lm_head"] = P()
    return specs


def make_cp_loss(mesh: Mesh, cfg: ModelConfig, params: Params, remat=False):
    """Next-token cross-entropy with the SEQUENCE sharded over mesh axis
    'cp' and ring attention (parallel/ring.py) inside every block — long-
    context training where no device ever holds the full (T, T) score
    matrix or full-sequence K/V. Composes with 'dp' (batch-sharded) and
    'tp' (Megatron, manual psums) axes on the same mesh: the full
    dp x cp x tp layout in one shard_map. Differentiable; weight cotangents
    psum over 'dp' and 'cp' through shard_map's transpose.

    ``params`` fixes the pytree structure for the shard_map specs.
    Attention variants compose with the ring kernel per layer: sliding
    windows and llama4 chunked attention run a BOUNDED hop schedule
    (blocks behind the window are never shipped — see ring._ring_body),
    gemma2 softcapping applies inside each hop's scores, and gpt-oss
    sinks fold into the final flash renormalization. gpt-oss composes
    with 'tp' too: the fused expert stacks shard their EXPERT dim (each
    device computes its experts' weighted outputs from the replicated
    router, and the routed sum rides the body's row-parallel psum). One
    refusal remains: MLA does not ring-decompose (its latent cache is
    not per-head K/V).
    """
    import dataclasses

    from ..models.llama import (
        _ffn,
        _gptoss_expert_math,
        block_train,
        gptoss_router_scores,
        layer_rope,
        matmul,
        rms_norm,
        rope_tables,
    )
    from .ring import _ring_body

    if cfg.is_mla:
        raise NotImplementedError("MLA attention does not ring-decompose")
    if (
        cfg.model_type == "gpt_oss"
        and "tp" in mesh.axis_names
        and cfg.num_local_experts % mesh.shape["tp"] != 0
    ):
        raise ValueError(
            f"gpt-oss under cp x tp shards the expert dim: "
            f"{cfg.num_local_experts} experts must divide "
            f"tp={mesh.shape['tp']}"
        )

    n_cp = mesh.shape["cp"]
    tp = "tp" in mesh.axis_names
    n_tp = mesh.shape["tp"] if tp else 1
    dp = "dp" in mesh.axis_names
    local_cfg = cfg
    if tp:
        if (
            cfg.num_attention_heads % n_tp
            or cfg.num_key_value_heads % n_tp
            or cfg.intermediate_size % n_tp
        ):
            raise ValueError(
                f"tp={n_tp} must evenly divide heads/kv-heads/ffn"
            )
        local_cfg = dataclasses.replace(
            cfg,
            num_attention_heads=cfg.num_attention_heads // n_tp,
            num_key_value_heads=cfg.num_key_value_heads // n_tp,
            intermediate_size=cfg.intermediate_size // n_tp,
            head_dim_override=cfg.head_dim,
        )

    def body(p, inputs):
        B, Tl = inputs.shape
        x = p["embed_tokens"][inputs]
        if cfg.is_gemma:
            x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)
        rank = jax.lax.axis_index("cp")
        positions = (
            rank * Tl + jnp.arange(Tl, dtype=jnp.int32)
        )[None, :].repeat(B, axis=0)
        rope = rope_tables(cfg, Tl * n_cp)
        reduce = (lambda y: jax.lax.psum(y, "tp")) if tp else None
        qk_sr = (
            (n_tp, lambda y: jax.lax.psum(y, "tp"))
            if (tp and cfg.qk_norm_full)
            else None
        )

        def one(x_, layer, i):
            # per-layer attention variant (windows/chunking alternate by
            # layer index in mistral/gemma2/gpt-oss/llama4); the sinks
            # leaf rides the layer dict into the ring's renormalization
            window = (
                cfg.sliding_window
                if cfg.sliding_window is not None and cfg.layer_is_sliding(i)
                else None
            )
            chunk = (
                cfg.attention_chunk_size
                if cfg.attention_chunk_size is not None
                and cfg.layer_is_chunked(i)
                else None
            )

            def attend(q, k, v, s):
                return _ring_body(
                    q, k, v, n_dev=n_cp, scale=s,
                    window=window, chunk=chunk,
                    softcap=cfg.attn_logit_softcapping or None,
                    sinks=layer.get("sinks"),
                )

            def gptoss_tp_ffn(cfg_, lyr, h):
                # gpt-oss fused experts under 'tp': EXPERT-dim slices —
                # every rank computes the replicated router, slices its
                # experts' score columns, runs its weighted expert math,
                # and _block_tail's row-parallel psum assembles the
                # routed sum (down_bias is per-expert, so partials add
                # exactly)
                if "gptoss_experts" not in lyr:
                    return _ffn(cfg_, lyr, h)
                e = lyr["gptoss_experts"]  # rank-local (E/n_tp, ...) slices
                n_local = e["gate_up"].shape[0]
                rank = jax.lax.axis_index("tp")
                scores = gptoss_router_scores(cfg_, lyr, h)
                local = jax.lax.dynamic_slice_in_dim(
                    scores, rank * n_local, n_local, axis=2
                )
                out = _gptoss_expert_math(
                    h, e["gate_up"], e["gate_up_bias"], e["down"],
                    e["down_bias"], local,
                )
                return out.astype(h.dtype)

            ffn = gptoss_tp_ffn if (tp and cfg.model_type == "gpt_oss") else None
            cos, sin = layer_rope(cfg, rope, i)  # gemma3: dual tables
            return block_train(
                local_cfg, layer, x_, cos, sin, positions, None,
                reduce=reduce, use_rope=cfg.layer_uses_rope(i),
                qk_stat_reduce=qk_sr, attend=attend, ffn=ffn,
            )

        fn = jax.checkpoint(one, static_argnums=(2,)) if remat else one
        for i, layer in enumerate(p["layers"]):
            x = fn(x, layer, i)
        x = rms_norm(x, p["norm"], cfg.rms_norm_eps, cfg.is_gemma)
        head = p.get("lm_head", p["embed_tokens"])
        return matmul(x, head).astype(jnp.float32)

    param_specs = _cp_layer_specs(params, tp)
    ids_spec = P("dp", "cp") if dp else P(None, "cp")
    logits_spec = P("dp", "cp", None) if dp else P(None, "cp", None)
    fwd = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, ids_spec),
        out_specs=logits_spec,
    )

    def loss_fn(p: Params, batch: jnp.ndarray) -> jnp.ndarray:
        inputs = batch[:, :-1]
        targets = batch[:, 1:]
        logits = fwd(p, inputs)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    return loss_fn


def make_cp_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    params_template: Params,
    learning_rate: float = 1e-4,
    remat: bool = False,
    zero1: bool = False,
    master_fp32: bool = False,
    tx=None,
):
    """(init_state, train_step) over a ('dp','cp'[, 'tp']) mesh: batches
    shard (batch, sequence) over (dp, cp), blocks run ring attention over
    'cp' (and Megatron psums over 'tp'), adamw states shard like params.
    Same contract as make_train_step; ``params_template`` fixes the param
    pytree structure (pass the params init_state will receive). See
    make_cp_loss for the kernel. ``zero1=True`` partitions the Adam
    moments over every data axis present (dp AND cp — both replicate
    weights, so both can hold moment shards); ``master_fp32`` as in
    make_train_step (_OptimKit)."""
    dp = "dp" in mesh.axis_names
    batch_sharding = NamedSharding(mesh, P("dp", "cp") if dp else P(None, "cp"))
    specs = _cp_layer_specs(params_template, "tp" in mesh.axis_names)
    loss_fn = make_cp_loss(mesh, cfg, params_template, remat=remat)
    data_axes = tuple(a for a in ("dp", "cp") if a in mesh.axis_names)
    kit = _OptimKit(mesh, learning_rate, zero1, master_fp32, data_axes, tx=tx)

    def init_state(params: Params) -> TrainState:
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params,
            specs,
        )
        pshard = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
        return kit.init(params, pshard)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: jnp.ndarray):
        batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch)
        return kit.apply(state, grads), loss

    return init_state, train_step
