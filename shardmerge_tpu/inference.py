"""JAX inference engine with streaming generation.

Parity surface: reference shard/inference.py — ChatMessage (:24-35),
InferenceEngine.from_pretrained with 4/8-bit options (:65-119),
stream_generation with chat-template support (:121-200).

Redesign: the reference wraps transformers+bitsandbytes and, despite taking
sampling parameters, argmaxes every token (inference.py:176-189). Here the
model is the pure-JAX Llama forward (models/llama.py): one jitted prefill,
one jitted decode step against a fixed-size KV cache (no retracing during a
generation), real temperature/top-k/top-p/repetition-penalty sampling, and
``greedy=True`` to reproduce the reference's decoding. Only the tokenizer
comes from transformers.
"""

from __future__ import annotations

import json
import logging
import threading
from collections import OrderedDict
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.llama import (
    ModelConfig,
    forward,
    init_kv_cache,
    rope_tables,
)
from .models.loader import load_params
from .models.quant import scoped_without_int4_kernel
from .models.sampling import sample_token

logger = logging.getLogger(__name__)

__all__ = ["ChatMessage", "InferenceEngine"]

_CACHE_BUCKET = 256  # KV cache length granularity (compile-cache friendly)
_PROMPT_BUCKET = 64  # prompts pad to this so prefill compiles per bucket
# prefill chunk cap: bounds the (B, chunk, S) mask and caps compile-shape
# variety at the <=_PROMPT_CHUNK buckets, while keeping the dispatch count
# L/512 (not L/64) for long prompts on dispatch-latency-dominated links
_PROMPT_CHUNK = 512


@dataclass
class ChatMessage:
    role: str
    content: str

    def to_dict(self):
        return {"role": self.role, "content": self.content}

    def __str__(self):
        return json.dumps(self.to_dict())


def _make_spec_round(cfg: ModelConfig, draft_cfg: ModelConfig, k: int):
    """One ENTIRE speculative round as a single dispatch.

    Fuses (a) the draft's catch-up decode of the one true token it may
    have skipped last round (lax.cond — lag is provably 0 or 1), (b) k−1
    chained draft decodes proposing continuations of the pending token
    ``x1``, each with the penalized argmax fused in (lax.scan), and (c)
    the target's verify forward over all k speculative positions with the
    per-position greedy re-derivation (:func:`_greedy_verify`). Returns
    the proposals and verify argmaxes PACKED into one (2k−1,) int32 array
    so the host pays one dispatch plus one fetch per round — on a
    dispatch-latency-dominated link (this host's ~24 ms relay) the
    previous 2-dispatch/2-fetch/2-eager-op round spent more time in
    round-trips than in compute.
    """

    def spec_round(
        t_params,
        d_params,
        kv,  # target cache
        d_kv,  # draft cache
        rope,
        d_rope,
        x1,  # pending token (always emitted before the round)
        t,  # x1's cache slot
        mask_pre,  # (1, V) bool: tokens emitted BEFORE this round
        rp,
        catch_tok,  # true token at slot t-1 the draft never consumed
        do_catch,  # bool scalar: whether the draft lags by one
    ):
        def catchup(dk):
            _, dk = forward(
                d_params,
                draft_cfg,
                input_ids=catch_tok.reshape(1, 1),
                positions=(t - 1).reshape(1, 1),
                kv_cache=dk,
                cache_pos=t - 1,
                rope=d_rope,
                attn_len=t,
            )
            return dk

        d_kv = jax.lax.cond(do_catch, catchup, lambda dk: dk, d_kv)

        # draft proposes k-1 continuations of x1
        base_mask = mask_pre[0].at[x1].set(True)

        def step(carry, i):
            dk, prev, mask = carry
            pos = t + i
            logits, dk = forward(
                d_params,
                draft_cfg,
                prev.reshape(1, 1),
                pos.reshape(1, 1),
                dk,
                cache_pos=pos,
                rope=d_rope,
                attn_len=pos + 1,
            )
            lg = logits[0, -1]
            pen = jnp.where(lg > 0, lg / rp, lg * rp)
            tok = jnp.argmax(jnp.where(mask, pen, lg)).astype(jnp.int32)
            mask = mask.at[tok].set(True)
            return (dk, tok, mask), tok

        (d_kv, _, _), toks = jax.lax.scan(
            step, (d_kv, x1, base_mask), jnp.arange(k - 1, dtype=jnp.int32)
        )

        # target scores every speculative position in the same dispatch
        fed = jnp.concatenate([x1[None], toks])  # (k,)
        v_logits, kv = forward(
            t_params,
            cfg,
            input_ids=fed[None],
            positions=jnp.arange(k, dtype=jnp.int32)[None] + t,
            kv_cache=kv,
            cache_pos=t,
            rope=rope,
            attn_len=t + k,
        )
        y = _greedy_verify.__wrapped__(v_logits[0], mask_pre[0], fed, rp)
        return jnp.concatenate([toks, y.astype(jnp.int32)]), kv, d_kv

    return jax.jit(spec_round, donate_argnums=(2, 3))


# sequence axis per KV-cache leaf: GQA caches are (L, B, H, S, D); MLA's
# compressed latents are (L, B, S, rank)
_KV_SEQ_AXIS = {"k": 3, "v": 3, "ckv": 2, "kpe": 2}


@partial(jax.jit, static_argnames=("length",))
def _slice_kv(kv, length: int):
    """Copy the first ``length`` sequence slots of every cache leaf."""
    return {
        k: jax.lax.slice_in_dim(v, 0, length, axis=_KV_SEQ_AXIS[k])
        for k, v in kv.items()
    }


@partial(jax.jit, donate_argnums=(0,))
def _implant_kv(fresh, slab):
    """Write a cached prefix slab into the head of a fresh cache.

    Valid for any fresh cache at least as long as the slab: the slots
    beyond it are zeros either way, and causality guarantees the prefix
    KV is identical no matter what follows it."""
    return {
        k: jax.lax.dynamic_update_slice_in_dim(
            fresh[k], slab[k], 0, axis=_KV_SEQ_AXIS[k]
        )
        for k in fresh
    }


@jax.jit
def _greedy_verify(logits, base_mask, fed, repetition_penalty):
    """Target-greedy tokens for every speculative position in one shot.

    logits: (T, V) raw target logits for the fed tokens; position i's
    repetition-penalty mask is ``base_mask | {fed[0..i]}`` — valid because
    position i's result is only consumed when every earlier draft was
    accepted, in which case exactly those tokens were emitted. Returns (T,)
    argmax ids (the same penalty-then-argmax as sample_token(greedy=True)).
    """
    V = logits.shape[-1]
    fed_mask = jnp.cumsum(jax.nn.one_hot(fed, V, dtype=jnp.int32), axis=0) > 0
    mask = base_mask | fed_mask  # (T, V)
    penalized = jnp.where(
        logits > 0, logits / repetition_penalty, logits * repetition_penalty
    )
    return jnp.argmax(jnp.where(mask, penalized, logits), axis=-1)


def _find_stop(text: str, stops) -> Optional[int]:
    """Char index of the EARLIEST occurrence of any stop string, or None.
    OpenAI semantics: generation halts at the stop sequence and the stop
    text itself is never returned."""
    best = None
    for s in stops:
        i = text.find(s)
        if i != -1 and (best is None or i < best):
            best = i
    return best


def _stop_holdback(text: str, stops) -> int:
    """Chars to withhold from streaming: the longest suffix of ``text``
    that is a proper prefix of some stop string — so a stop sequence
    split across chunks never leaks to the client."""
    hold = 0
    for s in stops:
        m = min(len(s) - 1, len(text))
        for k in range(m, 0, -1):
            if text.endswith(s[:k]):
                hold = max(hold, k)
                break
    return hold


class InferenceEngine:
    def __init__(
        self,
        cfg: ModelConfig,
        params,
        tokenizer,
        draft: Optional[tuple] = None,  # (draft_cfg, draft_params)
        speculation_k: int = 4,
        mesh=None,  # 1-D ('tp',) Mesh: shard the model over chips
        prefix_cache_slots: int = 0,
        prefix_cache_bytes: int = 2**30,  # 1 GiB device budget for slabs
    ):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.mesh = mesh
        # exact prefix caching (stream path): keep the KV slab of up to N
        # bucket-aligned prompt prefixes ON DEVICE (within a byte budget);
        # a request whose prompt starts with a cached prefix implants the
        # slab and prefills only the remainder — the shared-system-prompt
        # serving pattern
        self.prefix_cache_slots = int(prefix_cache_slots)
        self.prefix_cache_bytes = int(prefix_cache_bytes)
        self._prefix_cache: "OrderedDict" = OrderedDict()
        self._prefix_cache_used = 0
        # the continuous-batching pool admits requests from its own thread
        # while the stream path serves others: the match-loop + LRU
        # move/evict sequences must not interleave
        self._prefix_lock = threading.Lock()
        self._kv_head_sharding = None
        self._kv_init_fns: dict = {}
        self._int4_xla_only = False
        if mesh is not None:
            # Megatron-style tensor parallelism for serving: params shard
            # per parallel/train.param_shardings (weights without a rule
            # replicate), the KV cache shards on its head axis, and GSPMD
            # inserts the collectives in the same jitted forward. Models
            # whose weights exceed one chip's HBM serve this way.
            from jax.sharding import NamedSharding, PartitionSpec
            from .parallel.train import shard_params

            # GSPMD cannot partition the fused int4 pallas kernel over
            # tp-sharded weights; this engine's weight-tracing callables
            # are wrapped below so THEIR traces take the XLA decomposition
            # while unsharded engines in the same process keep the kernel
            self._int4_xla_only = True
            self.params = params = shard_params(mesh, params)
            if not cfg.is_mla and cfg.num_key_value_heads % mesh.devices.size == 0:
                self._kv_head_sharding = NamedSharding(
                    mesh, PartitionSpec(None, None, "tp", None, None)
                )
        # activations (and so the KV cache) take the embedding dtype;
        # quantized embeddings dequantize to bf16
        embed = params["embed_tokens"]
        self._kv_dtype = jnp.bfloat16 if isinstance(embed, dict) else embed.dtype
        if cfg.moe_dispatch == "capacity" and cfg.num_local_experts > 0:
            from .models.llama import stack_expert_weights

            # stack expert weights once so the jitted forward does not
            # re-materialize them per MoE layer per call
            if not stack_expert_weights(params):
                logger.warning(
                    "moe_dispatch='capacity' needs raw expert matrices; "
                    "quantized experts serve via the dense-and-mask path"
                )
        # ONE jitted forward serves chunked prefill and decode (donated
        # cache); prompts process in fixed prompt_chunk slices
        # (_chunked_prefill) so compile shapes don't scale with length
        self._decode_step = self._weight_trace(
            jax.jit(partial(forward, cfg=cfg), donate_argnames=("kv_cache",))
        )
        # the decode LOOPS use the fused step: sample + penalty-mask update
        # + next forward in one dispatch (3 device calls/token -> 1). On a
        # dispatch-latency-dominated link (this host: ~24 ms/call) that is
        # most of small-model decode latency; on a real TPU host it is
        # still 2 fewer executor round-trips per token. `decode_chunk > 1`
        # generalizes it: S fused steps scanned inside ONE dispatch,
        # amortizing the per-call latency to ~1/S per token (throughput
        # mode; emission granularity becomes S tokens).
        self._decode_chunks: dict = {}
        self._fused_decode = self._build_chunk_decode(1)
        self.prompt_chunk = _PROMPT_CHUNK

        self.draft_cfg = self.draft_params = None
        self.speculation_k = max(int(speculation_k), 2)
        if draft is not None:
            self.draft_cfg, self.draft_params = draft
            if self.draft_cfg.vocab_size != cfg.vocab_size:
                raise ValueError(
                    "draft model vocab "
                    f"({self.draft_cfg.vocab_size}) must match the target's "
                    f"({cfg.vocab_size})"
                )
            self._draft_decode = self._weight_trace(
                jax.jit(
                    partial(forward, cfg=self.draft_cfg),
                    donate_argnames=("kv_cache",),
                )
            )
            self._spec_round = self._weight_trace(
                _make_spec_round(cfg, self.draft_cfg, self.speculation_k)
            )

    def _chunk_step(self, chunk: int):
        """Jitted decode program for ``chunk`` fused steps (cached per size).

        chunk=1 routes through the ``_fused_decode`` attribute so tests
        and dispatch counters can wrap the default path in one place."""
        if chunk == 1:
            return self._fused_decode
        fn = self._decode_chunks.get(chunk)
        if fn is None:
            fn = self._build_chunk_decode(chunk)
            self._decode_chunks[chunk] = fn
        return fn

    def _build_chunk_decode(self, S: int):
        """S fused decode steps in ONE dispatch, shared by the streaming
        and batch loops.

        Each scanned step samples from the previous step's logits
        (identical math and PRNG stream to the unfused loop for every S:
        split-then-sample with the same sample_token body), folds the
        sampled token into the repetition-penalty mask, and runs the next
        forward. A generation costs ceil(N/S) device calls and fetches;
        S=1 is the latency mode (token-granular streaming), larger S
        amortizes per-dispatch latency at S-token emission granularity
        (tokens sampled after an EOS inside a chunk are discarded on the
        host — their cache slots are never attended to). The batch path
        is selected by passing ``token_valid`` (its None-vs-array pytree
        structure compiles two variants); ``pad`` is the per-row left-pad
        column so RoPE positions stay slot − pad. The budget-final
        token's forward is computed and discarded — one wasted (B, 1)
        step buys the sample+forward fusion for every other token.

        ``key_positions`` (the continuous pool's per-slot position map)
        rides as a DONATED device array and is advanced in-jit: each
        scanned step stamps its own position into its slot before the
        forward, so the pool never re-uploads the (B, S_cache) map —
        per-dispatch host traffic stays O(B) regardless of cache length.
        """
        cfg = self.cfg

        @partial(
            jax.jit,
            static_argnames=("top_k", "greedy"),
            donate_argnames=("kv_cache", "generated_mask", "key_positions"),
        )
        def chunk_decode(
            params,
            last,  # (B, V) logits the first token is sampled from
            generated_mask,  # (B, V) bool: repetition-penalty history
            key,
            kv_cache,
            rope,
            pos0,  # cache slot the first sampled token occupies
            pad,  # (B, 1) int32 left-pad counts (zeros when unpadded)
            temperature,
            top_p,
            repetition_penalty,
            token_valid,  # None (single) | (B, S) bool (batched)
            key_positions,  # None | (B, S) true positions (gapped rows)
            *,
            top_k: int,
            greedy: bool,
        ):
            B = last.shape[0]

            def step(carry, i):
                last, mask, key, kv, kp = carry
                pos = pos0 + i
                key, sample_key = jax.random.split(key)
                tok = sample_token.__wrapped__(
                    last,
                    sample_key,
                    mask,
                    temperature,
                    top_k,
                    top_p,
                    repetition_penalty,
                    greedy=greedy,
                )
                mask = mask.at[jnp.arange(B), tok].set(True)
                mask_positions = (
                    None
                    if token_valid is None
                    else jnp.full((B, 1), pos, jnp.int32)
                )
                if kp is not None:
                    # this slot's key is this step's token: its position
                    # is the row's own decode position (slot − pad)
                    kp = jax.lax.dynamic_update_slice(
                        kp, (pos - pad).astype(jnp.int32), (0, pos)
                    )
                logits, kv = forward(
                    params,
                    cfg,
                    input_ids=tok[:, None].astype(jnp.int32),
                    positions=(pos - pad).astype(jnp.int32),
                    kv_cache=kv,
                    cache_pos=pos,
                    rope=rope,
                    attn_len=pos + 1,
                    mask_positions=mask_positions,
                    token_valid=token_valid,
                    key_positions=kp,
                )
                return (logits[:, -1, :], mask, key, kv, kp), tok

            (last, generated_mask, key, kv_cache, key_positions), toks = (
                jax.lax.scan(
                    step,
                    (last, generated_mask, key, kv_cache, key_positions),
                    jnp.arange(S, dtype=jnp.int32),
                )
            )
            # toks: (S, B)
            return toks, last, generated_mask, key, kv_cache, key_positions

        return self._weight_trace(chunk_decode)

    def _weight_trace(self, fn):
        """Gate a weight-tracing jitted callable on this engine's sharding:
        mesh-sharded engines must trace with the fused int4 Pallas kernel
        suppressed (GSPMD cannot partition a pallas_call over tp-sharded
        weights); unsharded engines keep the kernel. Scoped per call so the
        lazy first-call trace is always covered and other engines in the
        process are untouched."""
        if self._int4_xla_only:
            return scoped_without_int4_kernel(fn)
        return fn

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        logger.info("Releasing model parameters")
        self.params = None
        self.draft_params = None

    # -- construction -----------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_path: str,
        load_in_4bit: bool = False,
        load_in_8bit: bool = False,
        tokenizer=None,
        device: Optional[str] = None,
        draft_model: Optional[str] = None,
        speculation_k: int = 4,
        shard: bool = False,
        prefix_cache_slots: int = 0,
        prefix_cache_bytes: int = 2**30,
    ) -> "InferenceEngine":
        """``draft_model``: optional path to a smaller same-vocab checkpoint
        enabling speculative decoding for greedy generations (exact: output
        is identical to plain greedy, only the dispatch count drops).
        ``shard=True`` tensor-parallelizes the model over every visible
        device (Megatron shardings + head-sharded KV cache) so checkpoints
        larger than one chip's HBM can serve; no-op on a single device.
        ``prefix_cache_slots=N`` keeps the KV of up to N bucket-aligned
        prompt prefixes on device (LRU): requests sharing a system prompt
        skip its prefill entirely (stream path)."""
        if load_in_4bit and load_in_8bit:
            raise ValueError("Cannot load model in both 4-bit and 8-bit precision")
        quant_bits = 4 if load_in_4bit else 8 if load_in_8bit else None

        mesh = None
        if shard:
            from jax.sharding import Mesh

            devices = np.asarray(jax.devices())
            if devices.size > 1:
                mesh = Mesh(devices, ("tp",))
                logger.info(
                    "Sharding model over %d devices (tensor parallel)",
                    devices.size,
                )

        model_path = Path(model_path)
        # PEFT adapter dirs resolve to their base checkpoint for
        # config/tokenizer; load_params fuses the deltas at read time
        from .models.loader import resolve_checkpoint_dir

        weights_dir, adapter = resolve_checkpoint_dir(model_path)
        cfg = ModelConfig.from_pretrained(weights_dir)
        # with a mesh, every tensor streams straight onto its final
        # sharding (never staging the whole model on one device); the
        # already-resolved adapter rides along so its safetensors is not
        # read a second time
        params = load_params(
            weights_dir,
            cfg,
            quant_bits=quant_bits,
            mesh=mesh,
            resolved=(weights_dir, adapter),
        )

        draft = None
        if draft_model is not None:
            draft_path = Path(draft_model)
            draft_cfg = ModelConfig.from_pretrained(draft_path)
            draft = (draft_cfg, load_params(draft_path, draft_cfg))

        if tokenizer is None:
            from transformers import AutoTokenizer

            # adapter dirs may ship their own (finetuned) tokenizer files;
            # otherwise fall back to the base checkpoint's
            tok_dir = (
                model_path
                if (model_path / "tokenizer_config.json").is_file()
                else weights_dir
            )
            tokenizer = AutoTokenizer.from_pretrained(str(tok_dir))
        return cls(
            cfg,
            params,
            tokenizer,
            draft=draft,
            speculation_k=speculation_k,
            mesh=mesh,
            prefix_cache_slots=prefix_cache_slots,
            prefix_cache_bytes=prefix_cache_bytes,
        )

    # -- generation --------------------------------------------------------

    def _encode(
        self,
        prompt: str,
        use_template: bool,
        system_prompt: Optional[str],
        previous_messages: Optional[List[ChatMessage]],
    ) -> List[int]:
        if use_template and getattr(self.tokenizer, "chat_template", None):
            raw: List[ChatMessage] = []
            if system_prompt:
                raw.append(ChatMessage(role="system", content=system_prompt))
            if previous_messages:
                raw.extend(previous_messages)
            raw.append(ChatMessage(role="user", content=prompt))
            ids = self.tokenizer.apply_chat_template(
                [m.to_dict() for m in raw],
                tokenize=True,
                add_generation_prompt=True,
            )
            return list(ids)
        return list(self.tokenizer.encode(prompt))

    def _init_kv(self, batch: int, cache_len: int):
        if self._kv_head_sharding is None:
            return init_kv_cache(self.cfg, batch, cache_len, self._kv_dtype)
        # create the zeros DIRECTLY sharded (out_shardings): a cache for a
        # bigger-than-one-chip model must never stage on the default device
        key = (batch, cache_len)
        fn = self._kv_init_fns.get(key)
        if fn is None:
            fn = jax.jit(
                partial(
                    init_kv_cache, self.cfg, batch, cache_len, self._kv_dtype
                ),
                out_shardings={
                    "k": self._kv_head_sharding,
                    "v": self._kv_head_sharding,
                },
            )
            self._kv_init_fns[key] = fn
        return fn()

    def _pad_prompt(self, input_ids: List[int], cache_len: int):
        """Pad the prompt to a bucket multiple so prefill compiles once per
        bucket shape (chunks cap at self.prompt_chunk, so there are at most
        prompt_chunk/bucket distinct shapes). Causality keeps the tail
        inert: only the logits at prompt_len-1 are consumed, and decode
        overwrites the padded cache slots sequentially before ever
        attending to them."""
        prompt_len = len(input_ids)
        padded_len = -(-prompt_len // _PROMPT_BUCKET) * _PROMPT_BUCKET
        padded_len = min(padded_len, cache_len)
        padded = input_ids + [0] * (padded_len - prompt_len)
        ids = jnp.asarray([padded], jnp.int32)
        positions = jnp.arange(padded_len, dtype=jnp.int32)[None, :]
        return ids, positions

    def _chunked_prefill(
        self,
        step_fn,
        params,
        ids,  # (B, L) padded prompt tokens
        positions,  # (B, L)
        kv,
        rope,
        final_attn_len: int,
        keep_pos: Optional[int] = None,  # row whose logits the caller needs
        mask_positions=None,  # (B, L) cache-slot indices (batched path)
        token_valid=None,
        start: int = 0,  # first slot to prefill (earlier slots cached)
    ):
        """Prefill in chunks capped at ``self.prompt_chunk``.

        Compile-shape variety stays bounded at prompt_chunk/_PROMPT_BUCKET
        shapes regardless of prompt length, and the additive attention mask
        never exceeds (B, chunk, S) (a monolithic 32k-token prefill would
        materialize a multi-GB (B, T, S) mask). Causality makes the
        chunking exact: chunk queries attend only cache slots already
        written. ``step_fn`` is a donating jitted forward, so cache buffers
        turn over in place. Returns ((B, V) logits at ``keep_pos`` — the
        last row by default — and the cache)."""
        B, L = ids.shape
        chunk = self.prompt_chunk
        if keep_pos is None:
            keep_pos = L - 1
        assert keep_pos >= start, (keep_pos, start)
        kept = None
        for c0 in range(start, L, chunk):
            c1 = min(c0 + chunk, L)
            kwargs = {}
            if mask_positions is not None:
                kwargs["mask_positions"] = mask_positions[:, c0:c1]
            if token_valid is not None:
                kwargs["token_valid"] = token_valid
            logits, kv = step_fn(
                params,
                input_ids=ids[:, c0:c1],
                positions=positions[:, c0:c1],
                kv_cache=kv,
                cache_pos=c0,
                rope=rope,
                attn_len=min(c1, final_attn_len),
                **kwargs,
            )
            if c0 <= keep_pos < c1:
                kept = logits[:, keep_pos - c0, :]
        return kept, kv

    def _prefix_lookup(
        self, input_ids: List[int], prompt_len: int, kv, kind: str = "t"
    ):
        """Longest bucket-aligned prefix SHARED with any cached slab,
        implanted.

        Cached keys carry their own request's tail tokens, so the match
        is element-wise common-prefix length (rounded down to the bucket),
        not exact key lookup — the shared-system-prompt case. The slab is
        sliced to the common length before implanting so no stale tail
        from the donor request ever enters this cache. At most
        ``prompt_len - 1`` tokens come from the cache: the final prompt
        token always prefills live (its logits seed decoding). ``kind``
        namespaces slabs per model ("t" target / "d" draft — their cache
        geometries differ). Returns (hit_len, kv).

        First hit per new (slab_len, cache_len) shape pair compiles the
        slice/implant programs (lengths quantize to the prompt/cache
        buckets, so the family stays small; persistent-cache hosts
        amortize it across runs)."""
        max_pfx = (prompt_len - 1) // _PROMPT_BUCKET * _PROMPT_BUCKET
        if max_pfx <= 0:
            return 0, kv
        target = tuple(input_ids[:max_pfx])
        with self._prefix_lock:
            best_key, best = None, 0
            for key in self._prefix_cache:
                k_kind, ktoks = key
                if k_kind != kind:
                    continue
                n = 0
                for a, b in zip(ktoks[:max_pfx], target):
                    if a != b:
                        break
                    n += 1
                n = n // _PROMPT_BUCKET * _PROMPT_BUCKET
                if n > best:
                    best, best_key = n, key
                    if best == max_pfx:
                        break  # cannot do better
            if best == 0:
                return 0, kv
            self._prefix_cache.move_to_end(best_key)
            slab, _ = self._prefix_cache[best_key]
        if len(best_key[1]) > best:
            slab = _slice_kv(slab, length=best)
        return best, _implant_kv(kv, slab)

    def _prefix_store(
        self, input_ids: List[int], prompt_len: int, kv, kind: str = "t"
    ):
        """Cache this prompt's longest bucket-aligned prefix slab.

        Runs AFTER prefill: slots below the prefix length hold exactly the
        prefix's KV (causal writes never touch earlier slots), so slicing
        the live cache is free of recompute. Slabs live ON DEVICE, so
        eviction is LRU over BOTH a slot count (prefix_cache_slots) and a
        byte budget (prefix_cache_bytes) — slot count alone would let a
        few long-prompt slabs exhaust HBM."""
        plen = (prompt_len - 1) // _PROMPT_BUCKET * _PROMPT_BUCKET
        if plen < _PROMPT_BUCKET:
            return
        key = (kind, tuple(input_ids[:plen]))
        # the slab is sliced before taking the lock (device work); the
        # membership check lives INSIDE the same critical section as the
        # insert — a check-then-insert split across two lock regions would
        # let two threads storing the same key double-count the byte budget
        slab = _slice_kv(kv, length=plen)
        nbytes = sum(v.nbytes for v in slab.values())
        if nbytes > self.prefix_cache_bytes:
            return  # a single over-budget slab would evict everything
        with self._prefix_lock:
            if key in self._prefix_cache:
                self._prefix_cache.move_to_end(key)
                return
            self._prefix_cache[key] = (slab, nbytes)
            self._prefix_cache_used += nbytes
            while (
                len(self._prefix_cache) > self.prefix_cache_slots
                or self._prefix_cache_used > self.prefix_cache_bytes
            ):
                _, (_, freed) = self._prefix_cache.popitem(last=False)
                self._prefix_cache_used -= freed

    def _eos_ids(self) -> set:
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is None:
            return set()
        return set(eos) if isinstance(eos, (list, tuple)) else {eos}

    def stream_generation(
        self,
        prompt: str,
        max_new_tokens: int = 512,
        temperature: float = 0.7,
        top_p: float = 0.95,
        top_k: int = 40,
        repetition_penalty: float = 1.1,
        use_template: bool = True,
        system_prompt: Optional[str] = None,
        previous_messages: Optional[List[ChatMessage]] = None,
        greedy: bool = False,
        seed: int = 0,
        meta: Optional[dict] = None,
        decode_chunk: int = 1,
        stop: Optional[List[str]] = None,
    ) -> Iterator[str]:
        """Yield generated text chunks token by token.

        With a draft model loaded and ``greedy=True``, decoding is
        speculative (see :meth:`_stream_speculative`): same output, fewer
        target dispatches. ``decode_chunk=S`` runs S decode steps per
        device call (throughput mode: ~1/S the per-token dispatch
        latency, S-token emission granularity, identical tokens); it does
        not apply on the speculative path, which amortizes dispatches its
        own way (one per round of up to k tokens).
        ``stop``: OpenAI-style stop sequences — generation halts at the
        earliest occurrence, the stop text is never emitted (streamed
        chunks withhold partial stop prefixes until resolved), and
        finish_reason is "stop". Pass a dict as ``meta`` to receive
        ``{"finish_reason": "stop"|"length"}`` after exhaustion."""
        cfg = self.cfg
        if meta is None:
            meta = {}
        meta.setdefault("finish_reason", "length")
        input_ids = self._encode(prompt, use_template, system_prompt, previous_messages)
        prompt_len = len(input_ids)
        if prompt_len == 0 or max_new_tokens <= 0:
            return

        if greedy and self.draft_cfg is not None:
            yield from self._stream_speculative(
                input_ids, max_new_tokens, repetition_penalty, meta, stop
            )
            return

        # chunks always dispatch at FULL decode_chunk size (a ragged tail
        # would compile a second program per distinct remainder — minutes
        # per shape on a remote-compile TPU); the cache covers the
        # rounded-up budget and surplus tokens are discarded on host
        chunk_size = max(1, decode_chunk)
        budget = -(-max_new_tokens // chunk_size) * chunk_size
        total = prompt_len + budget
        cache_len = -(-total // _CACHE_BUCKET) * _CACHE_BUCKET
        rope = rope_tables(cfg, cache_len)
        kv = self._init_kv(1, cache_len)

        ids, positions = self._pad_prompt(input_ids, cache_len)
        hit_len = 0
        if self.prefix_cache_slots > 0:
            hit_len, kv = self._prefix_lookup(input_ids, prompt_len, kv)
        last, kv = self._chunked_prefill(
            self._decode_step,
            self.params,
            ids,
            positions,
            kv,
            rope,
            prompt_len,
            keep_pos=prompt_len - 1,
            start=hit_len,
        )
        if self.prefix_cache_slots > 0:
            self._prefix_store(input_ids, prompt_len, kv)
        meta["prefix_cache_hit_tokens"] = hit_len

        key = jax.random.PRNGKey(seed)
        eos_ids = self._eos_ids()
        generated_mask = jnp.zeros((1, cfg.vocab_size), bool)
        no_pad = jnp.zeros((1, 1), jnp.int32)
        generated: List[int] = []
        emitted_text = ""

        done = 0
        stopped = False
        while done < max_new_tokens and not stopped:
            # ONE dispatch: sample chunk_size tokens AND run their forwards
            toks, last, generated_mask, key, kv, _ = self._chunk_step(
                chunk_size
            )(
                self.params,
                last,
                generated_mask,
                key,
                kv,
                rope,
                prompt_len + done,
                no_pad,
                jnp.float32(temperature),
                jnp.float32(top_p),
                jnp.float32(repetition_penalty),
                None,
                None,
                top_k=top_k,
                greedy=greedy,
            )
            done += chunk_size
            for token_id in (int(v) for v in np.asarray(toks)[:, 0]):
                if len(generated) >= max_new_tokens:
                    break  # surplus from the rounded-up final chunk
                generated.append(token_id)

                # incremental decode: emit the text suffix (handles BPE
                # joins). ``emitted_text`` tracks what was YIELDED — with
                # stop sequences the tail may be withheld (partial stop
                # prefix) until it resolves either way.
                text = self.tokenizer.decode(
                    generated, skip_special_tokens=True
                )
                if stop:
                    cut = _find_stop(text, stop)
                    if cut is not None:
                        if cut > len(emitted_text):
                            yield text[len(emitted_text) : cut]
                            emitted_text = text[:cut]
                        meta["finish_reason"] = "stop"
                        meta["stopped_at"] = cut
                        stopped = True
                        break
                if len(text) > len(emitted_text) and not text.endswith("�"):
                    safe = len(text) - (
                        _stop_holdback(text, stop) if stop else 0
                    )
                    if safe > len(emitted_text):
                        yield text[len(emitted_text) : safe]
                        emitted_text = text[:safe]

                if token_id in eos_ids:
                    meta["finish_reason"] = "stop"
                    stopped = True
                    break

        meta["prompt_tokens"] = prompt_len
        # EOS is appended to `generated` before the stop check; exclude it
        # so completion_tokens matches the batch/pool paths (which never
        # record the stop token)
        meta["completion_tokens"] = len(generated) - (
            1
            if meta["finish_reason"] == "stop" and "stopped_at" not in meta
            else 0
        )
        # final flush: the incremental decoder withholds text ending in
        # U+FFFD or a partial stop prefix; emit whatever remains (up to a
        # stop cut) so callers that join the stream get the full output
        text = self.tokenizer.decode(generated, skip_special_tokens=True)
        if "stopped_at" in meta:
            text = text[: meta["stopped_at"]]
        if len(text) > len(emitted_text):
            yield text[len(emitted_text) :]

    def _stream_speculative(
        self,
        input_ids: List[int],
        max_new_tokens: int,
        repetition_penalty: float,
        meta: dict,
        stop: Optional[List[str]] = None,
    ) -> Iterator[str]:
        """Greedy speculative decoding against the loaded draft model.

        Per round, ONE fused dispatch (:func:`_make_spec_round`): the
        draft's catch-up decode (if it lags), a jitted scan of k-1 chained
        draft decodes with the penalized argmax fused in proposing
        continuations of the known-correct pending token, and the target
        forward scoring all of them; the longest target-greedy-matching
        prefix is accepted and the target's own argmax at the first
        mismatch becomes the next pending token. The verify applies
        the same repetition-penalty-then-argmax per position, with each
        position's mask assuming the earlier drafts were accepted — the
        only case in which that position's result is consumed — so the
        output matches plain greedy decoding token for token, up to
        floating-point near-ties: the (1,k) verify forward may round logits
        differently than the (1,1) decode, and an ulp-level tie between the
        top two tokens can resolve either way (both are valid greedy
        decodes; the test models are far from ties). Costs 1 dispatch + 1
        host sync per round for up to k accepted tokens — the win on TPU
        relays where per-dispatch latency dominates small-batch decode.
        Rejected tokens leave stale cache slots on both models; harmless
        because every slot is rewritten (cache_pos) before the attn_len
        mask ever exposes it.
        """
        cfg = self.cfg
        k = self.speculation_k
        rp = jnp.float32(repetition_penalty)
        prompt_len = len(input_ids)

        total = prompt_len + max_new_tokens + k  # verify may write past budget
        cache_len = -(-total // _CACHE_BUCKET) * _CACHE_BUCKET
        rope = rope_tables(cfg, cache_len)
        d_rope = rope_tables(self.draft_cfg, cache_len)
        kv = self._init_kv(1, cache_len)
        d_embed = self.draft_params["embed_tokens"]
        d_dtype = jnp.bfloat16 if isinstance(d_embed, dict) else d_embed.dtype
        d_kv = init_kv_cache(self.draft_cfg, 1, cache_len, d_dtype)

        ids, positions = self._pad_prompt(input_ids, cache_len)
        t_hit = d_hit = 0
        if self.prefix_cache_slots > 0:
            # target and draft slabs cache under separate kinds (their
            # cache geometries differ)
            t_hit, kv = self._prefix_lookup(input_ids, prompt_len, kv, "t")
            d_hit, d_kv = self._prefix_lookup(
                input_ids, prompt_len, d_kv, "d"
            )
        prompt_last, kv = self._chunked_prefill(
            self._decode_step,
            self.params,
            ids,
            positions,
            kv,
            rope,
            prompt_len,
            keep_pos=prompt_len - 1,
            start=t_hit,
        )
        _, d_kv = self._chunked_prefill(
            self._draft_decode,
            self.draft_params,
            ids,
            positions,
            d_kv,
            d_rope,
            prompt_len,
            start=d_hit,
        )
        if self.prefix_cache_slots > 0:
            self._prefix_store(input_ids, prompt_len, kv, "t")
            self._prefix_store(input_ids, prompt_len, d_kv, "d")
        meta["prefix_cache_hit_tokens"] = t_hit

        eos_ids = self._eos_ids()
        # the emitted-token penalty mask lives on HOST (numpy) and rides
        # into each fused round as an input — updating it with a device
        # scatter would cost a dispatch per round
        mask_pre = np.zeros((1, cfg.vocab_size), bool)
        all_tokens = list(input_ids)  # slot-indexed true context
        generated: List[int] = []
        state = {"text": ""}

        def emit(token_id: int):
            """Append + stream; returns False when generation must stop.
            ``state["text"]`` tracks YIELDED text (stop-prefix tails are
            withheld until they resolve)."""
            generated.append(token_id)
            all_tokens.append(token_id)
            chunks = []
            text = self.tokenizer.decode(generated, skip_special_tokens=True)
            if stop:
                cut = _find_stop(text, stop)
                if cut is not None:
                    if cut > len(state["text"]):
                        chunks.append(text[len(state["text"]) : cut])
                        state["text"] = text[:cut]
                    meta["finish_reason"] = "stop"
                    meta["stopped_at"] = cut
                    return chunks, False
            if len(text) > len(state["text"]) and not text.endswith("�"):
                safe = len(text) - (_stop_holdback(text, stop) if stop else 0)
                if safe > len(state["text"]):
                    chunks.append(text[len(state["text"]) : safe])
                    state["text"] = text[:safe]
            if token_id in eos_ids:
                meta["finish_reason"] = "stop"
                return chunks, False
            return chunks, len(generated) < max_new_tokens

        x1 = int(
            sample_token(
                prompt_last,
                jax.random.PRNGKey(0),
                jnp.asarray(mask_pre),
                repetition_penalty=rp,
                greedy=True,
            )[0]
        )
        draft_pos = prompt_len  # next slot the draft cache will consume

        while True:
            chunks, go_on = emit(x1)
            yield from chunks
            if not go_on:
                break
            t = prompt_len + len(generated) - 1  # x1's slot

            # ONE dispatch + ONE fetch per round: draft catch-up (lag is
            # 0 or 1 — full acceptance leaves exactly the verify argmax
            # unconsumed), k-1 proposals, and the target verify, fused
            assert draft_pos in (t, t - 1), (draft_pos, t)
            do_catch = draft_pos < t
            packed, kv, d_kv = self._spec_round(
                self.params,
                self.draft_params,
                kv,
                d_kv,
                rope,
                d_rope,
                jnp.int32(x1),
                jnp.int32(t),
                jnp.asarray(mask_pre),
                rp,
                jnp.int32(all_tokens[t - 1] if do_catch else 0),
                jnp.asarray(do_catch),
            )
            arr = np.asarray(packed)
            fed = [x1] + [int(v) for v in arr[: k - 1]]
            y = arr[k - 1 :]

            m = 0
            while m < k - 1 and int(y[m]) == fed[m + 1]:
                m += 1
            go_on = True
            for tok in fed[1 : m + 1]:
                chunks, go_on = emit(tok)
                yield from chunks
                if not go_on:
                    break
            # fed[0..m] are now emitted history for later penalty masks
            mask_pre[0, fed[: m + 1]] = True
            # true context the draft has consumed (rejected tail is stale)
            draft_pos = t + min(m, k - 2) + 1
            if not go_on:
                break
            x1 = int(y[m])

        meta["prompt_tokens"] = prompt_len
        # as in stream_generation: the emitted EOS is not a completion token
        meta["completion_tokens"] = len(generated) - (
            1
            if meta["finish_reason"] == "stop" and "stopped_at" not in meta
            else 0
        )
        text = self.tokenizer.decode(generated, skip_special_tokens=True)
        if "stopped_at" in meta:
            text = text[: meta["stopped_at"]]
        if len(text) > len(state["text"]):
            yield text[len(state["text"]) :]

    def generate_batch(
        self,
        prompts: List[str],
        max_new_tokens: int = 128,
        temperature: float = 0.7,
        top_p: float = 0.95,
        top_k: int = 40,
        repetition_penalty: float = 1.1,
        use_template: bool = True,
        system_prompt: Optional[str] = None,
        greedy: bool = False,
        seed: int = 0,
        return_meta: bool = False,
        decode_chunk: int = 1,
        meta: Optional[dict] = None,
        stop: Optional[List[str]] = None,
    ):
        """Generate completions for a whole batch in lockstep (serving path).

        Ragged prompts are LEFT-padded to one bucketed length so every row's
        last prompt token sits at the same slot and decode advances one
        shared cache position per step (static shapes: one compile per
        (batch, prompt-bucket, cache-bucket) triple, zero per-row scatter).
        Pad slots are masked out of attention via the forward's
        ``token_valid`` mask; RoPE positions start at 0 on each row's first
        real token, so outputs match the single-sequence path. Rows that hit
        EOS keep decoding (their tokens are discarded) until all rows finish.

        Returns a list of texts; with ``return_meta=True`` returns
        ``(texts, finish_reasons)`` where each reason is ``"stop"`` (EOS)
        or ``"length"`` (truncated by max_new_tokens). ``decode_chunk=S``
        runs S lockstep steps per device call (see stream_generation).
        """
        cfg = self.cfg
        seqs = [
            self._encode(p, use_template, system_prompt, None) for p in prompts
        ]
        if not seqs:
            return ([], []) if return_meta else []
        if any(len(s) == 0 for s in seqs):
            raise ValueError("generate_batch: empty prompt after encoding")
        B = len(seqs)
        max_len = max(len(s) for s in seqs)
        L = -(-max_len // _PROMPT_BUCKET) * _PROMPT_BUCKET
        chunk_size = max(1, decode_chunk)
        budget = -(-max_new_tokens // chunk_size) * chunk_size
        total = L + budget
        cache_len = -(-total // _CACHE_BUCKET) * _CACHE_BUCKET
        rope = rope_tables(cfg, cache_len)
        kv = self._init_kv(B, cache_len)

        pad = np.asarray([L - len(s) for s in seqs], np.int32)  # left pads
        ids = np.zeros((B, L), np.int32)
        for b, s in enumerate(seqs):
            ids[b, pad[b] :] = s
        slot_idx = np.broadcast_to(np.arange(L, dtype=np.int32), (B, L))
        rope_pos = np.maximum(slot_idx - pad[:, None], 0)  # pads masked anyway
        token_valid = jnp.asarray(
            np.arange(cache_len, dtype=np.int32)[None, :] >= pad[:, None]
        )

        # left padding: every row's final prompt token is at slot L-1
        last, kv = self._chunked_prefill(
            self._decode_step,
            self.params,
            jnp.asarray(ids),
            jnp.asarray(rope_pos),
            kv,
            rope,
            L,
            mask_positions=jnp.asarray(slot_idx),
            token_valid=token_valid,
        )

        key = jax.random.PRNGKey(seed)
        eos_ids = self._eos_ids()
        generated_mask = jnp.zeros((B, cfg.vocab_size), bool)
        pad_col = jnp.asarray(pad[:, None])  # (B, 1)
        tokens: List[List[int]] = [[] for _ in range(B)]
        finished = [False] * B
        stop_cuts: dict = {}  # row -> char index where a stop seq began

        done = 0
        emitted = 0
        while done < max_new_tokens and not all(finished):
            # ONE dispatch of EXACTLY chunk_size lockstep steps (a ragged
            # tail would compile a second program; surplus rows from the
            # rounded-up final chunk are discarded below)
            toks, last, generated_mask, key, kv, _ = self._chunk_step(
                chunk_size
            )(
                self.params,
                last,
                generated_mask,
                key,
                kv,
                rope,
                L + done,
                pad_col,
                jnp.float32(temperature),
                jnp.float32(top_p),
                jnp.float32(repetition_penalty),
                token_valid,
                None,
                top_k=top_k,
                greedy=greedy,
            )
            done += chunk_size
            for row in np.asarray(toks):  # (S, B) chunk-major
                if emitted >= max_new_tokens:
                    break
                emitted += 1
                for b in range(B):
                    if not finished[b]:
                        tid = int(row[b])
                        if tid in eos_ids:
                            finished[b] = True
                        else:
                            tokens[b].append(tid)
                            if stop:
                                text = self.tokenizer.decode(
                                    tokens[b], skip_special_tokens=True
                                )
                                cut = _find_stop(text, stop)
                                if cut is not None:
                                    stop_cuts[b] = cut
                                    finished[b] = True
                if all(finished):
                    break

        texts = [
            self.tokenizer.decode(t, skip_special_tokens=True) for t in tokens
        ]
        for b, cut in stop_cuts.items():
            texts[b] = texts[b][:cut]
        if meta is not None:
            # per-row token accounting (true encoded lengths, not padded)
            meta["usage"] = [
                {"prompt_tokens": len(s), "completion_tokens": len(t)}
                for s, t in zip(seqs, tokens)
            ]
        if return_meta:
            reasons = ["stop" if f else "length" for f in finished]
            return texts, reasons
        return texts
