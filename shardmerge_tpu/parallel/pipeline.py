"""Pipeline parallelism (PP) over a 'pp' mesh axis — GPipe schedule.

Completes the parallelism axes SURVEY.md §2.3 lists as new TPU-native work
(dp/tp/sp live in parallel/train.py, ep in parallel/moe.py): the decoder
stack is cut into ``pp`` equal stages, each device holds only its stage's
layer weights (1/P of the block parameters), and microbatched activations
flow stage-to-stage over ICI via ``lax.ppermute``.

Schedule (single-direction GPipe): with M microbatches and P stages the
pipeline runs M + P - 1 ticks; microbatch m enters stage 0 at tick m,
reaches stage r at tick m + r, and the last stage emits it at tick
m + P - 1. Devices compute every tick (bubble ticks produce discarded
values — simpler and XLA-friendlier than predication, and the bubble
fraction (P-1)/(M+P-1) is the standard GPipe trade-off).

Embedding, final norm and the LM head run replicated outside the pipeline
(they are a small fraction of weights; the blocks dominate). The whole
schedule is ``lax.scan``-over-ticks of ``lax.scan``-over-stage-layers of the
SAME ``block_train`` the dp x tp path uses, so PP is numerically identical
to the single-device forward — and differentiable, so ``make_pp_loss`` can
back a training step. Composes with 'tp' (Megatron slicing inside each
stage) and 'dp' (microbatches shard their batch dim) into the full 3-D
dp x pp x tp layout in one shard_map.

Per-layer attention schedules ARE supported: the scanned stage body knows
each layer's global index (stage r owns layers [r*per, (r+1)*per)) and
selects that layer's mask (gemma2/gpt-oss/mistral sliding windows) and rope
gate (smollm3 mixed NoPE) from static flag tables.

MoE decoder stacks ARE supported: per-expert weight lists stack into
``experts_stacked = (W1, W3, W2)`` leaves (so Mixtral / Qwen3-MoE /
GPT-OSS blocks pipeline like dense ones, with the exact dense-and-mask
dispatch), and under pp x tp the expert matrices slice Megatron-style on
their intermediate dim — the same two per-block psums assemble the
routed-and-weighted partial sums.

Heterogeneous decoder stacks ARE supported in both real-world shapes:
DeepSeek's dense ``first_k_dense_replace`` prefix replicates and runs
before the pipeline, and PERIODIC kind patterns (Llama-4 Maverick's
interleaved dense/MoE stack) stage-stack per kind slot with the schedule
scanning over periods — see :func:`stack_stages`.

Quantized stacks (int8/int4 {'q','scale'} / fused {'q3','scale'}, the
serving representation) pipeline too — dense projections, per-expert
lists AND the gptoss/llama4 fused expert stacks: the q/scale arrays
stage-stack like raw leaves (expert lists into parallel (S, per, E, ...)
buffers) and dequantize transparently in the stage body. Quantized
stacks also Megatron-slice under pp x tp — column-parallel owners slice
q and its per-output-channel scale on the out dim; row-parallel owners
slice q's reduction dim (int4 packed buffers get a tp-blocked
split-half repack at stack time, on the last axis for dense/per-expert
'q' and on the packed middle axis for the fused gptoss/llama4 'q3')
with scale replicated, the existing block psums distributing the
per-channel scaling exactly; llama4's fused gate/up column permutation
applies to q3 and scale alike (the out dim is never the packed axis).
Remaining restriction: layer counts divisible by the stage count (up to
the replicated dense prefix / kind period).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import ModelConfig, Params, block_train, matmul, rms_norm, rope_tables

__all__ = ["stack_stages", "pipeline_forward_train", "make_pp_loss"]

_AXIS = "pp"

# jitted schedules cached per (mesh, cfg fingerprint, micro count) — see
# parallel/merge.py: rebuilding jit(shard_map(...)) per call would retrace
_PP_CACHE: dict = {}


# Per-layer sliding windows (gemma2/gpt-oss/mistral) and mixed NoPE
# (smollm3) ARE supported: the scanned stage body carries each layer's
# global index (stage r owns layers [r*per, (r+1)*per)) and selects that
# layer's mask / rope gate from statically-known flag tables — branchless
# jnp.where / gather, so one compiled body still serves every stage.


# Megatron TP classification of stacked block leaves (S, per, *weight dims):
# column-parallel weights shard their OUTPUT dim (leaf axis 2), row-parallel
# their INPUT dim (leaf axis 3); norms replicate within the stage.
# MLA (homogeneous DeepSeek stacks, first_k_dense_replace=0): q_b/kv_b
# outputs are contiguous per-head blocks (H x (dn+dr), H x (dn+dv)), so
# column slicing them IS head slicing; the latent-side q_a/kv_a
# projections and their norms replicate (the latent is shared across
# heads). Shared experts are an ordinary biasless MLP.
_TP_COL = {
    "q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
    "q_b_proj", "kv_b_proj", "shared_gate_proj", "shared_up_proj",
}
_TP_ROW = {"o_proj", "down_proj", "shared_down_proj"}
# 1-D leaves that slice with their column-parallel producer: qkv biases
# (out-dim slices) and gpt-oss attention sinks (one logit per head — the
# heads are tp-sliced, so each device keeps its own heads' sinks)
_TP_COL_1D = {"q_bias", "k_bias", "v_bias", "sinks"}


def _leaf_name(path):
    """Classification key for a stacked block leaf from its tree path:
    the last dict key, plus the tuple slot for ``experts_stacked``
    (0 = W1/gate, 1 = W3/up, 2 = W2/down — see models/llama.py
    stack_expert_weights). Leaves of int8/int4 quantized dicts resolve to
    ``(owner, field)`` with field in {'q', 'q3', 'scale'} and owner the
    enclosing projection name (or experts_stacked slot tuple / fused
    gate_up/down key), so :func:`_block_spec` can shard them with their
    owner's Megatron role."""
    import jax.tree_util as jtu

    path = list(path)
    field = None
    if isinstance(path[-1], jtu.DictKey) and path[-1].key in (
        "q", "q3", "scale",
    ):
        field = path[-1].key
        path = path[:-1]
    name = next(
        p.key for p in reversed(path) if isinstance(p, jtu.DictKey)
    )
    if name == "experts_stacked":
        slot = next(
            p.idx for p in reversed(path) if isinstance(p, jtu.SequenceKey)
        )
        name = ("experts_stacked", slot)
    return (name, field) if field else name


def _block_spec(key, leaf, tp: bool, qk_full: bool = False) -> P:
    """PartitionSpec for one stacked block leaf (key from _leaf_name)."""
    if not tp:
        return P(_AXIS, *([None] * (leaf.ndim - 1)))
    if isinstance(key, tuple) and key[-1] in ("q", "q3", "scale"):
        # int8/int4 {'q','scale'} (or fused {'q3','scale'}) leaf: q shards
        # exactly like its owner's raw weight (same ndim — int4's packed
        # reduction dim just halves the size, and the divisibility check
        # below runs on packed units). scale is per-output-channel with a
        # size-1 reduction dim: it rides the owner's spec where it has the
        # dim (column-parallel out slices) and replicates where the owner
        # shards the reduction dim (row-parallel — the psum of
        # scale*(q_shard @ x_shard) partials distributes the per-channel
        # scaling exactly).
        owner, field = key
        base = _block_spec(owner, leaf, tp, qk_full)
        if field in ("q", "q3"):
            return base
        return P(
            *(
                ax if not (ax == "tp" and leaf.shape[i] == 1) else None
                for i, ax in enumerate(base)
            )
        )
    if isinstance(key, tuple):  # experts_stacked: (S, per, E, out/in, in/out)
        if key[1] in (0, 1):  # W1/W3: column-parallel on the expert inter dim
            return P(_AXIS, None, None, "tp", None)
        return P(_AXIS, None, None, None, "tp")  # W2: row-parallel
    # gpt-oss fused experts: gate_up (S, per, E, hidden, 2*inter) is
    # column-parallel on the interleaved gate/up dim (an even-sized,
    # even-offset slice keeps every (gate, up) pair intact when
    # inter % n_tp == 0); down (S, per, E, inter, hidden) is row-parallel.
    # down_bias is pre-scaled by 1/n_tp at stack time (see stack_stages)
    # so the row-parallel psum reassembles it exactly once.
    if key == "gate_up":
        return P(_AXIS, None, None, None, "tp")
    if key == "gate_up_bias":
        return P(_AXIS, None, None, "tp")
    if key == "down":
        return P(_AXIS, None, None, "tp", None)
    if key in _TP_COL:
        return P(_AXIS, None, "tp", None)
    if key in _TP_ROW:
        return P(_AXIS, None, None, "tp")
    if key in _TP_COL_1D:
        return P(_AXIS, None, "tp")
    if qk_full and key in ("q_norm", "k_norm"):
        # olmo2 full-vector q/k norms: the WEIGHT spans every head, so it
        # column-shards with q/k; the statistic is psummed in block_train
        return P(_AXIS, None, "tp")
    return P(_AXIS, *([None] * (leaf.ndim - 1)))  # norms/router: replicated


def _repack4_tp_blocked(q, n_tp: int, axis: int = -1):
    """Permute a split-half int4-packed buffer (packed over the FULL
    reduction dim K on ``axis`` — models/quant.py _pack4; the last axis
    for dense/per-expert weights, the middle (ndim-2) axis for fused
    (E, in, out) expert stacks) into n_tp contiguous blocks, each
    split-half packed over its OWN K/n_tp columns.

    Why: a plain 'tp' slice of the packed axis hands device r the low
    nibbles of columns [r·K/(2T), (r+1)·K/(2T)) and the high nibbles of
    columns K/2 + that range — two NON-adjacent column blocks, while its
    row-parallel activation shard covers the contiguous block
    [r·K/T, (r+1)·K/T). After this repack the same slice IS the split-half
    packing of exactly that contiguous block, so the local
    ``dequant_matmul`` (and the fused Pallas GEMV, whose split-half
    contract is relative to the local buffer) are both exact. Pure nibble
    permutation — values stay in [0, 15], no +-8 bias round trip."""
    xp = np if isinstance(q, np.ndarray) else jnp
    if axis % q.ndim != q.ndim - 1:
        return xp.moveaxis(
            _repack4_tp_blocked(xp.moveaxis(q, axis, -1), n_tp), -1, axis
        )
    k = 2 * q.shape[-1]
    if (k // n_tp) % 2:
        raise ValueError(
            f"int4 row-parallel reduction dim {k} must split into even "
            f"per-device blocks under tp={n_tp}"
        )
    nib = xp.concatenate([q & 0xF, q >> 4], axis=-1)  # full-K column order
    bh = k // n_tp // 2
    blocks = [
        nib[..., r * 2 * bh : (r + 1) * 2 * bh] for r in range(n_tp)
    ]
    return xp.concatenate(
        [b[..., :bh] | (b[..., bh:] << 4) for b in blocks], axis=-1
    ).astype(xp.uint8)


def _normalize_block(layer, tp: bool):
    """Validate one layer's weights for stage stacking and return the
    stackable non-expert tree. Per-expert weight lists are removed here and
    stage-stacked separately, straight into one buffer (_stack_experts) —
    stacking them per layer first would hold a full extra copy of every
    expert matrix alive during the stage-major stack.

    Quantized projections AND expert lists ({'q','scale'} dicts) DO stack —
    the q and scale arrays stage-stack like any other leaf (expert lists
    via _stack_experts' parallel buffers) and ``matmul`` dequantizes
    transparently inside the scanned stage body. Under pp x tp they
    Megatron-slice too: column-parallel owners slice q AND the per-output-
    channel scale on the out dim; row-parallel owners slice q's reduction
    dim with scale replicated (the psum distributes the per-channel
    scaling), int4 packed buffers getting a tp-blocked repack first
    (_repack4_tp_blocked). FUSED quantized stacks (gptoss/llama4
    {'q3','scale'}) slice too: gate_up's tp axis is the OUT dim, which
    the middle-axis packing never touches (llama4's gate/up column
    permutation likewise — stack_stages applies it to q3 and scale);
    down's tp axis IS the packed middle axis, handled by the same
    repack on ndim-2."""
    out = dict(layer)
    out.pop("experts", None)
    for k, v in out.items():
        if k in ("gptoss_experts", "llama4_experts"):
            continue
        if hasattr(v, "ndim"):
            continue
        if isinstance(v, dict) and all(
            hasattr(w, "ndim") for w in v.values()
        ):
            continue
        raise NotImplementedError(
            f"pipeline stages require array (or quantized-dict) block "
            f"weights; layer leaf {k!r} is {type(v).__name__}"
        )
    return out


def _stack_experts(layers, n_stages: int, per: int):
    """Stage-stack per-expert SwiGLU weights into the
    ``experts_stacked = (W1, W3, W2)`` tuple of (S, per, E, ·, ·) arrays the
    dense MoE paths slice (models/llama.py _expert_mlp_weights).

    Fills one preallocated host buffer per matrix kind instead of nesting
    jnp.stack calls: nested stacking keeps every intermediate (E, ·, ·)
    copy alive until the outer stack consumes them — a full extra copy of
    all expert bytes, which at Mixtral-8x7B scale is ~2x 45 GiB of host RAM
    for no reason."""
    import numpy as np

    n_exp = len(layers[0]["experts"])
    if any(len(layer["experts"]) != n_exp for layer in layers):
        raise ValueError(
            "pipeline stages must be homogeneous: expert counts differ "
            "across layers"
        )

    def fill(extract, proto):
        proto = np.asarray(proto)
        buf = np.empty(
            (n_stages, per, n_exp) + tuple(proto.shape), proto.dtype
        )
        for s in range(n_stages):
            for i in range(per):
                experts = layers[s * per + i]["experts"]
                for e in range(n_exp):
                    buf[s, i, e] = np.asarray(extract(experts[e]))
        return buf

    out = []
    quantized = isinstance(layers[0]["experts"][0]["w1"], dict)
    for kind in ("w1", "w3", "w2"):
        proto = layers[0]["experts"][0][kind]
        if quantized:
            # int8/int4 {'q','scale'} experts:
            # the q and scale arrays stack into parallel (S, per, E, ...)
            # buffers and _expert_mlp_weights re-slices them into the
            # {'q','scale'} dicts matmul dequantizes transparently
            out.append(
                {
                    f: fill(lambda ex, k=kind, f=f: ex[k][f], proto[f])
                    for f in proto
                }
            )
        else:
            out.append(fill(lambda ex, k=kind: ex[k], proto))
    return tuple(out)


def _struct_of(layer):
    """Structural fingerprint of a layer for stage-stacking compatibility."""
    import jax.tree_util as jtu

    return (
        jtu.tree_structure(layer),
        "experts" in layer or "experts_stacked" in layer,
    )


def _find_period(structs):
    """Smallest proper period p of the layer-structure sequence
    (structs[i] == structs[i % p] for all i), or None when no pattern
    shorter than the sequence repeats. Uniform sequences have p == 1;
    Llama-4 Maverick's alternating dense/MoE stack has p == 2."""
    n = len(structs)
    if n <= 1:
        return 1
    for p in range(1, n):
        if n % p:
            continue
        if all(structs[i] == structs[i % p] for i in range(n)):
            return p
    return None


def _stack_run(mesh, run_layers, n_stages: int, tp: bool) -> dict:
    """Stage-stack ONE structurally-uniform run of layers into
    (n_stages, len(run)/n_stages, ...) host leaves — including the
    per-expert list stacking and the gptoss/llama4 tp weight fixups.
    Returns the tree BEFORE device placement (stack_stages shards it)."""
    import jax.tree_util as jtu

    per = len(run_layers) // n_stages
    norm_layers = [_normalize_block(layer, tp) for layer in run_layers]
    struct = jtu.tree_structure(norm_layers[0])
    has_experts = "experts" in run_layers[0]
    for i, layer in enumerate(norm_layers[1:], 1):
        if (
            jtu.tree_structure(layer) != struct
            or ("experts" in run_layers[i]) != has_experts
        ):
            raise ValueError(
                f"layer {i} structure differs from layer 0; pipeline stages "
                "must be homogeneous"
            )

    # (n_stages, per, *leaf): stage-major stacking of every block leaf.
    # Tree flattening orders dict leaves by sorted key — deterministic
    # across processes, which matters because per-process hash
    # randomization would otherwise give each multihost process a
    # DIFFERENT device_put order, and multihost device_put is collective
    # (mismatched orders crash the transport: gloo "received data size
    # doesn't match expected size")
    stacked = jax.tree.map(
        lambda *ls: jnp.stack(
            [
                jnp.stack([ls[s * per + i] for i in range(per)])
                for s in range(n_stages)
            ]
        ),
        *norm_layers,
    )
    if has_experts:
        stacked["experts_stacked"] = _stack_experts(run_layers, n_stages, per)
    if tp and "gptoss_experts" in stacked:
        # the per-expert down_bias is added BEFORE the row-parallel psum;
        # replicate it scaled by 1/n_tp so the psum counts it exactly once
        ge = dict(stacked["gptoss_experts"])
        ge["down_bias"] = ge["down_bias"] / mesh.shape["tp"]
        stacked["gptoss_experts"] = ge
    if tp and "llama4_experts" in stacked:
        # llama4 gate_up stores gate/up as contiguous HALVES of the last
        # dim — a plain 'tp' column slice would mix columns of both.
        # Permute to per-device blocks [gate_r | up_r] so the P(..., 'tp')
        # slice hands each device matched gate/up columns and the scanned
        # body's split-in-half works on the LOCAL width; down row-shards
        # its input dim to match and the FFN psum reassembles the output.
        # Quantized {'q3','scale'} gate_up permutes q3 AND its per-output-
        # channel scale the same way — the permuted axis is the OUT dim,
        # which the middle-axis int4 packing never touches.
        le = dict(stacked["llama4_experts"])
        gu = le["gate_up"]  # (S, per, E, hidden, 2I)
        n_tp = mesh.shape["tp"]
        width = gu["q3"].shape[-1] if isinstance(gu, dict) else gu.shape[-1]
        inter = width // 2
        if inter % n_tp:
            raise ValueError(
                f"llama4 expert intermediate dim {inter} must divide "
                f"tp={n_tp} for pp x tp stages"
            )
        blk = inter // n_tp
        idx = np.concatenate(
            [
                np.concatenate(
                    [
                        np.arange(r * blk, (r + 1) * blk),
                        inter + np.arange(r * blk, (r + 1) * blk),
                    ]
                )
                for r in range(n_tp)
            ]
        )
        if isinstance(gu, dict):
            le["gate_up"] = {k: v[..., idx] for k, v in gu.items()}
        else:
            le["gate_up"] = gu[..., idx]
        stacked["llama4_experts"] = le
    return stacked


def stack_stages(
    mesh: Mesh,
    params: Params,
    n_stages: int,
    tp: bool = False,
    qk_norm_full: bool = False,
    n_prefix_layers: int | None = None,
) -> Params:
    """Stack per-layer weights into (n_stages, layers_per_stage, ...) leaves
    sharded over 'pp' (each device materializes only its own stage), and
    replicate embed/norm/head.

    With ``tp=True`` the mesh is 2-D ('pp', 'tp') and each leaf additionally
    shards Megatron-style over 'tp' (column-parallel q/k/v/gate/up, row-
    parallel o/down) — each device then holds 1/(P*T) of the block weights.
    ``qk_norm_full`` (olmo2): the full-vector q/k norm weights shard with
    their columns (pass cfg.qk_norm_full when using tp); MoE expert stacks
    shard their intermediate dim over 'tp' (routers replicate). GPT-OSS
    fused experts shard too — their ``down_bias`` is pre-scaled by 1/n_tp
    here so the row-parallel psum reassembles it exactly once.

    Heterogeneous stacks ARE supported in two shapes:

    - A leading run of structurally different layers — DeepSeek's
      ``first_k_dense_replace`` dense prefix — replicates over the mesh
      (like embed/norm/head; a small fraction of weights) and runs before
      the pipeline, while the homogeneous remainder stage-stacks. The
      prefix is auto-detected as everything before the longest
      structurally-uniform suffix; pass ``n_prefix_layers`` to replicate
      MORE leading layers (e.g. to make the pipelined remainder divide
      ``n_stages`` — DeepSeek-V2 has 1 dense + 59 MoE layers, 59 prime).
    - A PERIODIC kind pattern — Llama-4 Maverick's interleaved dense/MoE
      stack (``interleave_moe_layer_step`` > 1) — stage-stacks per kind
      slot: layers of slot s (global index ≡ s mod p) stack into their own
      (n_stages, per/p, ...) leaves, and the schedule scans over periods,
      applying the p slots in order (every stage sees the same pattern,
      which requires layers_per_stage % p == 0). No replication, no
      padding: each device still holds exactly its stage's weights.

    Irregular heterogeneity (neither a uniform suffix nor a periodic
    pattern) still raises.
    """
    import jax.tree_util as jtu

    layers = params["layers"]
    structs = [_struct_of(layer) for layer in layers]
    if n_prefix_layers is None:
        period = _find_period(structs)
        if period is not None:
            n_prefix_layers = 0
        else:
            # leading irregularity: replicate everything before the
            # longest structurally-uniform suffix
            auto = len(layers) - 1
            while auto > 0 and structs[auto - 1] == structs[-1]:
                auto -= 1
            n_prefix_layers = auto
            period = 1
    else:
        period = _find_period(structs[n_prefix_layers:])
        if period is None:
            raise ValueError(
                f"the {len(layers) - n_prefix_layers} layers after "
                f"n_prefix_layers={n_prefix_layers} are heterogeneous "
                "(no uniform or periodic layer-kind pattern); replicate "
                "more leading layers via n_prefix_layers"
            )
    prefix, layers = layers[:n_prefix_layers], layers[n_prefix_layers:]
    if len(layers) % n_stages != 0:
        hint = (
            " (replicate more leading layers via n_prefix_layers)"
            if n_prefix_layers or period > 1
            else ""
        )
        raise ValueError(
            f"{n_stages} pipeline stages do not evenly divide "
            f"{len(layers)} pipelined layers{hint}"
        )
    per = len(layers) // n_stages
    if per % period:
        raise ValueError(
            f"{n_stages} stages give {per} layers per stage, which does "
            f"not divide the layer-kind period {period} — stages would be "
            "structurally different (pick n_stages so layers_per_stage "
            f"% {period} == 0)"
        )

    if period == 1:
        stacked = _stack_run(mesh, layers, n_stages, tp)
    else:
        # slot s = global layers {i : i % p == s} (post-prefix); slicing
        # layers[s::p] keeps stage-major order since per % p == 0 means
        # stage r's slot-s entries are exactly slots r*(per/p)..(r+1)*(per/p)
        stacked = {
            "period_slots": [
                _stack_run(mesh, layers[s::period], n_stages, tp)
                for s in range(period)
            ]
        }

    def _place(path, v):
        key = _leaf_name(path)
        spec = _block_spec(key, v, tp, qk_norm_full)
        if tp:
            # validate the Megatron slice BEFORE device_put: cfg-level
            # checks cannot see per-layer widths (llama4 dense layers use
            # intermediate_size_mlp, absent from ModelConfig)
            for ax, name in enumerate(spec):
                if name == "tp" and v.shape[ax] % mesh.shape["tp"]:
                    raise ValueError(
                        f"block leaf {key!r} dim {ax} of size "
                        f"{v.shape[ax]} does not divide tp="
                        f"{mesh.shape['tp']}"
                    )
            if (
                isinstance(key, tuple)
                and key[-1] in ("q", "q3")
                and v.dtype == jnp.uint8
            ):
                # row-parallel int4: tp-blocked split-half repack so the
                # packed-axis slice matches the contiguous activation
                # shard. 'q' (dense/per-expert) packs the LAST axis;
                # fused 'q3' packs the middle (ndim-2) axis (_pack4 on
                # (E, in, out) axis 1).
                packed_ax = v.ndim - 1 if key[-1] == "q" else v.ndim - 2
                if spec[packed_ax] == "tp":
                    v = _repack4_tp_blocked(
                        v, mesh.shape["tp"], axis=packed_ax
                    )
        return jax.device_put(v, NamedSharding(mesh, spec))

    pp_shard = jtu.tree_map_with_path(_place, stacked)
    rep = NamedSharding(mesh, P())
    out: Params = {
        "embed_tokens": jax.device_put(params["embed_tokens"], rep),
        "norm": jax.device_put(params["norm"], rep),
        "blocks": pp_shard,
    }
    if prefix:
        out["prefix_blocks"] = [
            jax.tree.map(lambda v: jax.device_put(v, rep), layer)
            for layer in prefix
        ]
    if "lm_head" in params:
        out["lm_head"] = jax.device_put(params["lm_head"], rep)
    return out


def _schedule_body(
    blocks, xs, cos, sin, positions, masks, *, cfg, n_stages, tp=False,
    n_tp=1, rope_flags=None, mask_ids=None, rope_ids=None, remat=False,
):
    """shard_map body: run the GPipe ticks for this device's stage.

    blocks: this stage's stacked layer weights, leaves (1, per, ...) — with
    ``tp`` the weight dims are additionally this device's Megatron slice and
    ``cfg`` is already scaled to the LOCAL head/ffn counts;
    xs: (n_micro, mb, T, E) embedded microbatches, replicated;
    masks: (3, T, T) additive [full, sliding, chunked] (an absent kind
    aliases full);
    rope_flags: static per-GLOBAL-layer bool tuple; mask_ids: static
    per-GLOBAL-layer int tuple indexing ``masks``. When a table is uniform
    the per-layer select compiles away (python branch); otherwise the
    scanned body gathers its layer's entry by global index.
    Returns (n_micro, mb, T, E) final-stage activations, replicated (psum).
    """
    blocks = jax.tree.map(lambda v: v[0], blocks)  # (per, ...)
    rank = jax.lax.axis_index(_AXIS)
    n_micro = xs.shape[0]
    slots = blocks.get("period_slots")
    if slots is not None:
        p = len(slots)
        per = p * jax.tree.leaves(slots[0])[0].shape[0]
    else:
        per = jax.tree.leaves(blocks)[0].shape[0]
    reduce = (lambda y: jax.lax.psum(y, "tp")) if tp else None
    qk_stat_reduce = (
        (n_tp, lambda y: jax.lax.psum(y, "tp"))
        if (tp and cfg.qk_norm_full)
        else None
    )

    rope_uniform = len(set(rope_flags)) == 1
    mask_uniform = len(set(mask_ids)) == 1
    rope_table = jnp.asarray(rope_flags)
    mask_table = jnp.asarray(mask_ids, jnp.int32)
    # gemma3 dual rope: cos/sin arrive STACKED (n_tables, L, D) with a
    # per-layer table id — same static-or-gathered machinery as masks
    # (single-rope families stack one table with uniform id 0, and the
    # static select compiles away)
    rid_uniform = len(set(rope_ids)) == 1
    rid_table = jnp.asarray(rope_ids, jnp.int32)

    def _mask_rope_for(g):
        """Static-or-gathered (mask, use_rope, cos, sin) for global
        layer index g."""
        mask = masks[mask_ids[0]] if mask_uniform else masks[mask_table[g]]
        use_rope = rope_flags[0] if rope_uniform else rope_table[g]
        if rid_uniform:
            c, s = cos[rope_ids[0]], sin[rope_ids[0]]
        else:
            c, s = cos[rid_table[g]], sin[rid_table[g]]
        return mask, use_rope, c, s

    def _apply_block(layer, h, g):
        mask, use_rope, c, s = _mask_rope_for(g)
        return block_train(
            cfg, layer, h, c, s, positions, mask,
            reduce=reduce, use_rope=use_rope,
            qk_stat_reduce=qk_stat_reduce,
        )

    # remat: recompute each block (periodic: each period of p blocks) in
    # the backward instead of saving its intermediates across the whole
    # tick schedule — with M + P - 1 ticks of scan-over-layers the
    # saved-residual footprint is the dominant training HBM term
    if slots is not None:
        # periodic kind pattern (interleaved dense/MoE stacks): scan over
        # PERIODS; the body applies the p kind slots in original layer
        # order. Every stage sees the same pattern (stack_stages enforced
        # per % p == 0), so the slot structure is static under SPMD.
        def one_period(h, inp):
            slot_layers, qi = inp
            for s in range(p):
                h = _apply_block(slot_layers[s], h, rank * per + qi * p + s)
            return h, None

        def stage_apply(x):
            body = jax.checkpoint(one_period) if remat else one_period
            h, _ = jax.lax.scan(
                body,
                x,
                (tuple(slots), jnp.arange(per // p, dtype=jnp.int32)),
            )
            return h

    else:
        def one_layer(h, inp):
            layer, li = inp
            return _apply_block(layer, h, rank * per + li), None

        def stage_apply(x):
            body = jax.checkpoint(one_layer) if remat else one_layer
            h, _ = jax.lax.scan(
                body, x, (blocks, jnp.arange(per, dtype=jnp.int32))
            )
            return h

    def tick(carry, t):
        out_buf, recv = carry
        # stage 0 injects microbatch t (clamped during bubble ticks);
        # other stages consume what the previous stage sent last tick
        x_in = jnp.where(
            rank == 0,
            xs[jnp.clip(t, 0, n_micro - 1)],
            recv,
        )
        y = stage_apply(x_in)
        # hand this tick's result to the next stage
        sent = jax.lax.ppermute(
            y, _AXIS, [(i, i + 1) for i in range(n_stages - 1)]
        )
        # the LAST stage's tick t completes microbatch t - (n_stages - 1)
        idx = t - (n_stages - 1)
        store = (rank == n_stages - 1) & (idx >= 0)
        out_buf = jnp.where(
            store,
            out_buf.at[jnp.clip(idx, 0, n_micro - 1)].set(y),
            out_buf,
        )
        return (out_buf, sent), None

    # the carry becomes device-varying after the first tick; mark the
    # replicated zeros as varying up front so scan's carry type is stable
    init = jax.lax.pcast(
        (jnp.zeros_like(xs), jnp.zeros_like(xs[0])), (_AXIS,), to="varying"
    )
    (out_buf, _), _ = jax.lax.scan(
        tick, init, jnp.arange(n_micro + n_stages - 1)
    )
    # replicate the last stage's results to every device
    out_buf = jnp.where(rank == n_stages - 1, out_buf, 0.0)
    return jax.lax.psum(out_buf, _AXIS)


def pipeline_forward_train(
    mesh: Mesh,
    cfg: ModelConfig,
    pp_params: Params,
    input_ids: jnp.ndarray,  # (B, T)
    n_microbatches: int,
    remat: bool = False,
):
    """Causal forward with the decoder stack pipelined over 'pp'.

    ``pp_params`` comes from :func:`stack_stages`. The batch must divide
    ``n_microbatches``. Numerically identical to
    :func:`models.llama.forward_train` (same block math, fp32 logits);
    differentiable end to end.

    When the mesh also has a 'tp' axis (and ``pp_params`` was stacked with
    ``tp=True``), each stage's blocks additionally run Megatron tensor
    parallelism: every tp device computes its slice of the heads/ffn and
    two psums per block (after o_proj and down_proj) assemble the
    activations — 2-D (pp x tp) scaling in one shard_map.

    When the mesh also has a 'dp' axis, the microbatch dim shards over it:
    each dp group runs the identical pipeline schedule on its slice of
    every microbatch (weights replicate over 'dp', so shard_map's
    transpose psums the weight cotangents across 'dp' — standard data
    parallelism), giving the full 3-D dp x pp x tp training layout in one
    shard_map.
    """
    n_stages = mesh.shape[_AXIS]
    tp = "tp" in mesh.axis_names
    n_dp = mesh.shape["dp"] if "dp" in mesh.axis_names else 1
    if tp:
        n_tp = mesh.shape["tp"]
        moe_inter = (
            (cfg.moe_intermediate_size or cfg.intermediate_size)
            if cfg.num_local_experts
            else 0
        )
        if (
            cfg.num_attention_heads % n_tp
            or cfg.num_key_value_heads % n_tp
            or cfg.intermediate_size % n_tp
            or moe_inter % n_tp
        ):
            raise ValueError(
                f"tp={n_tp} must evenly divide heads/kv-heads/ffn "
                f"({cfg.num_attention_heads}/{cfg.num_key_value_heads}/"
                f"{cfg.intermediate_size}"
                + (f"/experts {moe_inter}" if moe_inter else "")
                + ")"
            )
    B, T = input_ids.shape
    if B % n_microbatches != 0:
        raise ValueError(
            f"{n_microbatches} microbatches do not evenly divide batch {B}"
        )
    mb = B // n_microbatches
    if mb % n_dp != 0:
        raise ValueError(
            f"dp={n_dp} must evenly divide the microbatch size {mb} "
            f"(batch {B} / {n_microbatches} microbatches)"
        )

    from ..models.llama import embed_matrix

    x = embed_matrix(pp_params)[input_ids]
    if cfg.is_gemma:
        x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)

    rope = rope_tables(cfg, T)
    if len(rope) == 4:  # gemma3 dual tables: [global, local] stacks
        cos = jnp.stack([rope[0], rope[2]])
        sin = jnp.stack([rope[1], rope[3]])
    else:
        cos, sin = rope[0][None], rope[1][None]
    positions = jnp.arange(T, dtype=jnp.int32)[None, :].repeat(mb, axis=0)
    causal = jnp.tril(jnp.ones((T, T), bool))
    mask_full = jnp.where(causal, 0.0, jnp.float32(-1e9))
    if cfg.sliding_window is not None:
        ii = jnp.arange(T)[:, None]
        jj = jnp.arange(T)[None, :]
        sl = causal & (jj > ii - cfg.sliding_window)
        mask_sliding = jnp.where(sl, 0.0, jnp.float32(-1e9))
    else:
        mask_sliding = mask_full
    if cfg.attention_chunk_size is not None:
        # llama4 chunk-aligned local attention (models/llama.py forward)
        C = cfg.attention_chunk_size
        ii = jnp.arange(T)[:, None]
        jj = jnp.arange(T)[None, :]
        ch = causal & (jj >= (ii // C) * C)
        mask_chunked = jnp.where(ch, 0.0, jnp.float32(-1e9))
    else:
        mask_chunked = mask_full
    masks = jnp.stack([mask_full, mask_sliding, mask_chunked])

    n_layers = cfg.num_hidden_layers
    rope_flags = tuple(cfg.layer_uses_rope(i) for i in range(n_layers))
    mask_ids = tuple(
        2 if cfg.layer_is_chunked(i) else 1 if cfg.layer_is_sliding(i) else 0
        for i in range(n_layers)
    )
    rope_ids = tuple(
        int(cos.shape[0] > 1 and cfg.layer_is_sliding(i))
        for i in range(n_layers)
    )

    # heterogeneous stacks (DeepSeek first_k_dense_replace): the replicated
    # prefix layers run before the pipeline, full-batch, exactly like
    # forward_train's loop; the flag tables the schedule sees are offset so
    # stage r's global layer g = n_prefix + r*per + li keeps its own entry
    prefix = pp_params.get("prefix_blocks", ())
    n_prefix = len(prefix)
    if n_prefix:
        pos_full = jnp.arange(T, dtype=jnp.int32)[None, :].repeat(B, axis=0)
        for i, layer in enumerate(prefix):
            x = block_train(
                cfg, layer, x, cos[rope_ids[i]], sin[rope_ids[i]], pos_full,
                masks[mask_ids[i]],
                use_rope=rope_flags[i],
            )
        rope_flags = rope_flags[n_prefix:]
        mask_ids = mask_ids[n_prefix:]
        rope_ids = rope_ids[n_prefix:]

    xs = x.reshape(n_microbatches, mb, T, -1)

    import dataclasses

    blocks = pp_params["blocks"]
    # key on cfg field VALUES (all scalars), not id(cfg): a GC'd config's
    # address can be reused by a different one (same convention as
    # parallel/moe.py _FFN_CACHE)
    import jax.tree_util as jtu

    def _hashable(v):
        # cfg fields may hold dicts/lists (rope_scaling, layer tables) —
        # freeze them recursively so the cache key hashes
        if isinstance(v, dict):
            return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
        if isinstance(v, (list, tuple)):
            return tuple(_hashable(x) for x in v)
        return v

    cfg_fp = tuple(
        sorted((k, _hashable(v)) for k, v in dataclasses.asdict(cfg).items())
    )
    # the blocks STRUCTURE is part of the key: the same cfg can stack
    # uniform or periodic (period_slots) trees, whose in_specs differ
    key = (
        id(mesh), cfg_fp, n_microbatches, mb, T, remat, n_prefix,
        jtu.tree_structure(blocks),
    )
    fn = _PP_CACHE.get(key)
    if fn is None:
        local_cfg = cfg
        if tp:
            # the shard_map body sees this device's Megatron weight slice;
            # scale the head/ffn counts to match (head_dim unchanged)
            local_cfg = dataclasses.replace(
                cfg,
                num_attention_heads=cfg.num_attention_heads // n_tp,
                num_key_value_heads=cfg.num_key_value_heads // n_tp,
                intermediate_size=cfg.intermediate_size // n_tp,
                head_dim_override=cfg.head_dim,
            )
        body = partial(
            _schedule_body,
            cfg=local_cfg,
            n_stages=n_stages,
            tp=tp,
            n_tp=(n_tp if tp else 1),
            rope_flags=rope_flags,
            mask_ids=mask_ids,
            rope_ids=rope_ids,
            remat=remat,
        )
        block_specs = jtu.tree_map_with_path(
            lambda path, v: _block_spec(
                _leaf_name(path), v, tp, cfg.qk_norm_full
            ),
            blocks,
        )
        # with a 'dp' axis the (n_micro, mb, T, E) microbatches shard on
        # mb; each dp group pipelines its slice (weights replicate on 'dp')
        xs_spec = P(None, "dp") if n_dp > 1 else P()
        pos_spec = P("dp", None) if n_dp > 1 else P()
        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(block_specs, xs_spec, P(), P(), pos_spec, P()),
                out_specs=xs_spec,
            )
        )
        _PP_CACHE[key] = fn
    out = fn(blocks, xs, cos, sin, positions, masks)

    x = out.reshape(B, T, -1)
    x = rms_norm(x, pp_params["norm"], cfg.rms_norm_eps, cfg.is_gemma)
    head = pp_params.get("lm_head", pp_params["embed_tokens"])
    logits = matmul(x, head).astype(jnp.float32)
    if cfg.final_logit_softcapping:
        cap = jnp.float32(cfg.final_logit_softcapping)
        logits = cap * jnp.tanh(logits / cap)
    return logits


def make_pp_loss(
    mesh: Mesh,
    cfg: ModelConfig,
    n_microbatches: int,
    remat: bool = False,
):
    """Next-token cross-entropy through the pipeline — differentiable, so
    ``jax.value_and_grad`` of this is a PP training step's core.
    ``remat=True`` gradient-checkpoints each block (see _schedule_body)."""

    def loss_fn(pp_params: Params, batch: jnp.ndarray) -> jnp.ndarray:
        inputs = batch[:, :-1]
        targets = batch[:, 1:]
        logits = pipeline_forward_train(
            mesh, cfg, pp_params, inputs, n_microbatches, remat=remat
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    return loss_fn
